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


@functools.partial(jax.jit, static_argnames=("count", "skip_frames"))
def _revisit_chunk(p, start, count: int, thr2, skip_frames: int):
    """Device kernel for one row chunk of the revisit scan. The direct
    squared difference (no dot-product identity) is cancellation-free,
    so f32 is exact to ~relative eps even on km-scale trajectories."""
    n = p.shape[0]
    rows = jax.lax.dynamic_slice_in_dim(p, start, count)
    d2 = jnp.sum((rows[:, None, :] - p[None, :, :]) ** 2, axis=-1)
    band = (jnp.arange(n)[None, :]
            - (start + jnp.arange(count))[:, None]) >= skip_frames
    hit = (d2 < thr2) & band
    return jnp.any(hit, axis=1), jnp.argmax(hit, axis=1)


def find_revisit_queries(positions: np.ndarray, distance_threshold: float = 5.0,
                         skip_frames: int = 30,
                         row_chunk: int = 2048) -> np.ndarray:
    """(Q, 2) array of (query_idx j, revisited_idx i) — vectorized version
    of trainer.py:344-351's first-revisit scan.

    Runs ON DEVICE in fixed row chunks (peak memory O(row_chunk · n));
    the former host-numpy float64 version took minutes at 100k keyframes
    on this harness's single host core, the device chunks take ~ms."""
    n = len(positions)
    p = jnp.asarray(np.asarray(positions, np.float32))
    thr2 = jnp.float32(float(distance_threshold) ** 2)
    c = min(row_chunk, n)
    out = []
    for s in range(0, n, c):
        start = min(s, n - c)          # full-width chunk, one executable
        has, first_j = _revisit_chunk(p, jnp.int32(start), c, thr2,
                                      skip_frames)
        has, first_j = np.asarray(has), np.asarray(first_j)
        lo = s - start                 # drop the overlap of the last chunk
        i_local = np.nonzero(has[lo:])[0] + lo
        out.append(np.stack([first_j[i_local], start + i_local], axis=1))
    return (np.concatenate(out).astype(np.int64) if out
            else np.zeros((0, 2), np.int64))


def _recall_math(embeddings, positions, queries, k: int,
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


_recall_kernel = functools.partial(jax.jit,
                                   static_argnames=("k", "skip_frames"))(
    _recall_math)


@functools.lru_cache(maxsize=8)
def _sharded_recall_kernel(mesh, k: int, skip_frames: int):
    """SPMD variant of ``_recall_kernel``: the query axis is sharded over
    the mesh's ``data`` axis (each device ranks its query rows against
    the replicated embedding matrix — the distance matmul partitions by
    rows, the final mean is a tiny psum inserted by the partitioner)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("data", None))

    @functools.partial(jax.jit,
                       in_shardings=(repl, repl, dp, None),
                       out_shardings=repl)
    def kern(embeddings, positions, queries, thr):
        return _recall_math(embeddings, positions, queries, k, thr,
                            skip_frames)
    return kern


def recall_loop_closure(embeddings: np.ndarray, poses: np.ndarray, k: int = 1,
                        distance_threshold: float = 5.0,
                        skip_frames: int = 30,
                        query_chunk: int = 4096,
                        mesh=None) -> Tuple[float, int]:
    """Recall@K over revisit queries; returns (recall, n_queries).

    Queries are processed in fixed-size chunks so the (Q, n) distance
    matrix never exceeds ~chunk·n floats — at 100k keyframes the
    unchunked matrix would be tens of GB (the blockwise pass SURVEY §5.7
    calls the one place a ring-style schedule buys anything here).

    ``mesh``: a ``jax.sharding.Mesh`` shards each chunk's query axis
    over the ``data`` axis (embeddings replicated) — the offline
    validation analog of the sharded train step. Chunks are padded to
    the mesh size with repeat-queries whose contribution is subtracted
    exactly, so the result equals the single-device pass."""
    positions = poses[:, :3, 3].astype(np.float32)
    queries = find_revisit_queries(positions, distance_threshold, skip_frames)
    nq = len(queries)
    if nq == 0:
        return 0.0, 0
    divisor = 1
    if mesh is not None:
        divisor = int(np.prod(list(mesh.shape.values())))
        kern = _sharded_recall_kernel(mesh, k, skip_frames)
    emb = jnp.asarray(embeddings, jnp.float32)
    pos = jnp.asarray(positions)
    hits = 0.0
    for s in range(0, nq, query_chunk):
        chunk = queries[s:s + query_chunk]
        pad = 0
        target = (query_chunk if nq > query_chunk
                  else -(-len(chunk) // divisor) * divisor)
        if len(chunk) < target:
            # pad to the fixed chunk shape so one executable serves all
            # (and, under a mesh, so the shard divides evenly)
            pad = target - len(chunk)
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
        if mesh is not None:
            r = kern(emb, pos, jnp.asarray(chunk, jnp.int32),
                     jnp.float32(distance_threshold))
        else:
            r = _recall_kernel(emb, pos, jnp.asarray(chunk, jnp.int32),
                               k, distance_threshold, skip_frames)
        # the kernel returns the mean over its chunk; de-duplicate pad
        total = float(r) * len(chunk)
        if pad:
            rlast = _recall_kernel(emb, pos,
                                   jnp.asarray(chunk[-1:], jnp.int32),
                                   k, distance_threshold, skip_frames)
            total -= pad * float(rlast)
        hits += total
    return hits / nq, nq
