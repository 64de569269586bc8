"""Loop-closure Recall@K validation.

Reference semantics (/root/reference/src/gnn/trainer.py:306-387):
  * queries are "revisits": for each earlier frame i, the FIRST later frame
    j ≥ i+skip_frames with pose distance < threshold yields query (j, i)
    (one query per earlier frame)
  * for a query j, candidates are all frames with |i − j| > skip_frames,
    ranked by embedding L2 distance; a hit means any of the top-K is within
    the pose-distance threshold.

The reference's O(n²) Python loops become batched masked top-k on device.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def find_revisit_queries(positions: np.ndarray, distance_threshold: float = 5.0,
                         skip_frames: int = 30,
                         row_chunk: int = 2048) -> np.ndarray:
    """(Q, 2) array of (query_idx j, revisited_idx i) — vectorized version
    of trainer.py:344-351's first-revisit scan.

    Row-chunked with the dot-product distance identity so peak memory is
    O(row_chunk · n) instead of the (n, n, 3) broadcast — a 100k-keyframe
    validation would otherwise need hundreds of GB of host RAM."""
    n = len(positions)
    # float64: the dot-product identity cancels |p|²-magnitude terms, so
    # f32 would lose ~|p|²·eps of the small squared distance (meters of
    # error on km-scale trajectories); f64 keeps it exact to ~1e-9
    p = np.asarray(positions, np.float64)
    qq = (p * p).sum(axis=1)
    j_idx = np.arange(n)
    thr2 = float(distance_threshold) ** 2
    out = []
    for s in range(0, n, row_chunk):
        rows = p[s:s + row_chunk]
        d2 = (qq[s:s + row_chunk, None] + qq[None, :]
              - 2.0 * rows @ p.T)                       # (c, n)
        band = (j_idx[None, :] - (s + np.arange(len(rows)))[:, None]) \
            >= skip_frames
        hit = (d2 < thr2) & band
        has = hit.any(axis=1)
        first_j = np.argmax(hit, axis=1)
        i_local = np.nonzero(has)[0]
        out.append(np.stack([first_j[i_local], s + i_local], axis=1))
    return (np.concatenate(out) if out
            else np.zeros((0, 2), np.int64))


@functools.partial(jax.jit, static_argnames=("k", "skip_frames"))
def _recall_kernel(embeddings, positions, queries, k: int,
                   distance_threshold: float, skip_frames: int):
    n = embeddings.shape[0]
    q = queries[:, 0]
    qe = embeddings[q]                           # (Q, D)
    # squared embedding distances query→all via the dot-product identity
    # (MXU matmul; the |a-b| broadcast would materialize (Q, n, D)) —
    # ranking by d² is order-identical to ranking by d
    ed = (jnp.sum(qe * qe, axis=1)[:, None]
          + jnp.sum(embeddings * embeddings, axis=1)[None, :]
          - 2.0 * jax.lax.dot(qe, embeddings.T,
                              precision=jax.lax.Precision.HIGHEST))
    gap = jnp.abs(q[:, None] - jnp.arange(n)[None, :])
    ed = jnp.where(gap > skip_frames, ed, jnp.inf)  # exclude temporal nbrs
    _, top = jax.lax.top_k(-ed, k)               # (Q, k) nearest candidates
    qpos = positions[q]
    cand_pos = positions[top]                    # (Q, k, 3)
    geo = jnp.linalg.norm(cand_pos - qpos[:, None, :], axis=-1)
    hits = jnp.any(geo < distance_threshold, axis=1)
    return jnp.mean(hits.astype(jnp.float32))


def recall_loop_closure(embeddings: np.ndarray, poses: np.ndarray, k: int = 1,
                        distance_threshold: float = 5.0,
                        skip_frames: int = 30,
                        query_chunk: int = 4096) -> Tuple[float, int]:
    """Recall@K over revisit queries; returns (recall, n_queries).

    Queries are processed in fixed-size chunks so the (Q, n) distance
    matrix never exceeds ~chunk·n floats — at 100k keyframes the
    unchunked matrix would be tens of GB (the blockwise pass SURVEY §5.7
    calls the one place a ring-style schedule buys anything here)."""
    positions = poses[:, :3, 3].astype(np.float32)
    queries = find_revisit_queries(positions, distance_threshold, skip_frames)
    nq = len(queries)
    if nq == 0:
        return 0.0, 0
    emb = jnp.asarray(embeddings, jnp.float32)
    pos = jnp.asarray(positions)
    hits = 0.0
    for s in range(0, nq, query_chunk):
        chunk = queries[s:s + query_chunk]
        pad = 0
        if len(chunk) < query_chunk and nq > query_chunk:
            # pad to the fixed chunk shape so one executable serves all
            pad = query_chunk - len(chunk)
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
        r = _recall_kernel(emb, pos, jnp.asarray(chunk, jnp.int32),
                           k, distance_threshold, skip_frames)
        # _recall_kernel returns the mean over its chunk; de-duplicate pad
        total = float(r) * len(chunk)
        if pad:
            rlast = _recall_kernel(emb, pos,
                                   jnp.asarray(chunk[-1:], jnp.int32),
                                   k, distance_threshold, skip_frames)
            total -= pad * float(rlast)
        hits += total
    return hits / nq, nq
