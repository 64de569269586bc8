"""Triplet margin loss (reference trainer.py:27-68):

    L(a, p, n) = mean(relu(‖a − p‖² − ‖a − n‖² + margin))

with an optional validity mask so padded triplet batches keep fixed shapes
under jit (the mean runs over valid triplets only).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def triplet_loss(anchors: jnp.ndarray, positives: jnp.ndarray,
                 negatives: jnp.ndarray, margin: float = 0.1,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    pos_d = jnp.sum((anchors - positives) ** 2, axis=1)
    neg_d = jnp.sum((anchors - negatives) ** 2, axis=1)
    per = jnp.maximum(pos_d - neg_d + margin, 0.0)
    if mask is None:
        return jnp.mean(per)
    m = mask.astype(per.dtype)
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)
