"""Triplet margin loss (reference trainer.py:27-68):

    L(a, p, n) = mean(relu(‖a − p‖² − ‖a − n‖² + margin))

with an optional validity mask so padded triplet batches keep fixed shapes
under jit (the mean runs over valid triplets only).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, epsilon: float = 1e-12) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                           epsilon)


def triplet_loss(anchors: jnp.ndarray, positives: jnp.ndarray,
                 negatives: jnp.ndarray, margin: float = 0.1,
                 mask: Optional[jnp.ndarray] = None,
                 normalize: bool = False) -> jnp.ndarray:
    """``normalize`` applies L2 normalization to the embeddings before the
    squared-distance margin — the standard metric-learning variant (NOT in
    the reference, off by default); retrieval/validation must then rank by
    distance between normalized embeddings too."""
    if normalize:
        anchors = l2_normalize(anchors)
        positives = l2_normalize(positives)
        negatives = l2_normalize(negatives)
    pos_d = jnp.sum((anchors - positives) ** 2, axis=1)
    neg_d = jnp.sum((anchors - negatives) ** 2, axis=1)
    per = jnp.maximum(pos_d - neg_d + margin, 0.0)
    if mask is None:
        return jnp.mean(per)
    m = mask.astype(per.dtype)
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)
