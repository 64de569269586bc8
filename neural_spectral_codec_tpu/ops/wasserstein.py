"""1-D Wasserstein (W₁) distance kernels for spectral-histogram retrieval.

W₁(p, q) = Σ_i |CDF_p[i] − CDF_q[i]| for same-support histograms — the
reference's retrieval metric (/root/reference/src/retrieval/wasserstein.py).

TPU-first notes:
  * Database entries are stored as precomputed CDFs (``histogram_cdf``)
    inside the retriever, so a query is a single broadcast |Δ|·sum — pure
    VPU streaming at HBM bandwidth, no per-query cumsum over the database.
  * All variants below normalize inputs with the reference's ``sum > ε``
    guard so behavior matches for unnormalized inputs too.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalize(h: jnp.ndarray, epsilon: float) -> jnp.ndarray:
    """Row-wise sum-to-1 guard (reference wasserstein.py:111-121): rows with
    sum ≤ ε are left untouched."""
    s = jnp.sum(h, axis=-1, keepdims=True)
    return jnp.where(s > epsilon, h / (s + epsilon), h)


def _normalize_scalar(h: jnp.ndarray, epsilon: float) -> jnp.ndarray:
    """Single-histogram guard (reference wasserstein.py:40-43 divides by the
    *bare* sum for the scalar/query variants)."""
    s = jnp.sum(h, axis=-1, keepdims=True)
    return jnp.where(s > epsilon, h / s, h)


def histogram_cdf(h: jnp.ndarray, epsilon: float = 1e-8) -> jnp.ndarray:
    """Normalized-then-cumsum CDF, the retrieval database storage format."""
    return jnp.cumsum(_normalize(h, epsilon), axis=-1)


@jax.jit
def wasserstein_1d(h1: jnp.ndarray, h2: jnp.ndarray,
                   epsilon: float = 1e-8) -> jnp.ndarray:
    """Scalar W₁ (reference wasserstein.py:20-52)."""
    c1 = jnp.cumsum(_normalize_scalar(h1, epsilon), axis=-1)
    c2 = jnp.cumsum(_normalize_scalar(h2, epsilon), axis=-1)
    return jnp.sum(jnp.abs(c1 - c2), axis=-1)


@jax.jit
def wasserstein_batch(query: jnp.ndarray, database: jnp.ndarray,
                      epsilon: float = 1e-8) -> jnp.ndarray:
    """Query (D,) vs database (N, D) → (N,) (reference wasserstein.py:90-131)."""
    qc = jnp.cumsum(_normalize_scalar(query, epsilon), axis=-1)
    dc = jnp.cumsum(_normalize(database, epsilon), axis=-1)
    return jnp.sum(jnp.abs(dc - qc[None, :]), axis=-1)


@jax.jit
def wasserstein_batch_from_cdf(query_cdf: jnp.ndarray,
                               database_cdf: jnp.ndarray) -> jnp.ndarray:
    """Hot retrieval path: both sides already CDFs → (N,) distances."""
    return jnp.sum(jnp.abs(database_cdf - query_cdf[None, :]), axis=-1)


@jax.jit
def wasserstein_matrix(h1: jnp.ndarray, h2: jnp.ndarray,
                       epsilon: float = 1e-8) -> jnp.ndarray:
    """All-pairs (N1, N2) W₁ matrix (reference wasserstein.py:175-273).

    Memory-aware: computed in row blocks via lax.map when N1·N2·D is large
    would be the next step; for the graph sizes here (≤ ~20k keyframes) the
    broadcast fits comfortably in HBM when chunked by the caller.
    """
    c1 = jnp.cumsum(_normalize(h1, epsilon), axis=-1)
    c2 = jnp.cumsum(_normalize(h2, epsilon), axis=-1)
    return jnp.sum(jnp.abs(c1[:, None, :] - c2[None, :, :]), axis=-1)


def wasserstein_matrix_chunked(h1: jnp.ndarray, h2: jnp.ndarray,
                               epsilon: float = 1e-8,
                               chunk: int = 512) -> jnp.ndarray:
    """All-pairs W₁ with bounded peak memory: processes h1 in row chunks.

    Used by triplet mining / recall evaluation where N can reach 10⁴⁺ and a
    full (N, N, D) broadcast would not fit in HBM.
    """
    c1 = jnp.cumsum(_normalize(h1, epsilon), axis=-1)
    c2 = jnp.cumsum(_normalize(h2, epsilon), axis=-1)
    n1 = c1.shape[0]
    pad = (-n1) % chunk
    c1p = jnp.pad(c1, ((0, pad), (0, 0)))
    blocks = c1p.reshape(-1, chunk, c1.shape[-1])

    def block_fn(cb):
        return jnp.sum(jnp.abs(cb[:, None, :] - c2[None, :, :]), axis=-1)

    out = jax.lax.map(block_fn, blocks)
    return out.reshape(-1, c2.shape[0])[:n1]
