"""Triplet mining as vmapped all-pairs masking + on-device hard-negative
argmin.

Reference semantics (/root/reference/src/gnn/triplet_miner.py):
  * positives: spatial distance < 5 m AND temporal gap ≥ 30 frames
  * negatives: 10 m < distance < 50 m AND temporal gap ≥ 30 frames
  * hard negative = candidate with the smallest W₁ distance to the anchor
    (:314-359); "semi-hard" = median candidate; "random" = uniform
  * per-sequence mining when sequence ids are given (:88-114)

TPU-first: the reference's per-anchor cKDTree ball queries + Python loops
become one fixed-shape program per sequence — pairwise position distances,
boolean masks, a categorical draw for the positive, and a masked argmin
over the anchor's W₁ row for the hard negative. Memory is bounded by
chunking anchors; no KD-tree needed because the masks already are the ball
queries.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _mine_kernel_chunked(positions, cdfs, rng_key, params, strategy, chunk=2048):
    """Anchor-chunked variant for sequences too large for the (n, n)
    broadcast; same outputs."""
    n = len(positions)
    # transfer once, outside the chunk loop (avoids re-uploading the full
    # (n, n_bins) CDF matrix per chunk). The per-chunk fetch below is
    # deliberate: it bounds in-flight executions to one, so only a single
    # (chunk, n) distance intermediate is ever live — queueing all chunks
    # unsynced was measured >4x slower at 100k nodes (allocator pressure),
    # and the fetch is tiny (3 x chunk scalars).
    positions_d = jnp.asarray(positions)
    cdfs_d = jnp.asarray(cdfs)
    params_d = jnp.asarray(params)
    outs = []
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        # start rides as a traced scalar: a static start would compile a
        # fresh executable per chunk (~50 heavy compiles at 100k nodes)
        pos_i, neg_i, val = _mine_chunk(
            positions_d, cdfs_d, jax.random.fold_in(rng_key, s), params_d,
            jnp.int32(s), e - s, strategy)
        outs.append((np.asarray(pos_i), np.asarray(neg_i), np.asarray(val)))
    return tuple(np.concatenate([o[i] for o in outs]) for i in range(3))


@functools.partial(jax.jit, static_argnames=("count", "strategy"))
def _mine_chunk(positions, cdfs, rng_key, params, start, count: int,
                strategy: str):
    n = positions.shape[0]
    a = jax.lax.dynamic_slice_in_dim(positions, start, count)
    acdf = jax.lax.dynamic_slice_in_dim(cdfs, start, count)
    d = jnp.linalg.norm(a[:, None, :] - positions[None, :, :], axis=-1)
    ai = start + jnp.arange(count)
    gap = jnp.abs(ai[:, None] - jnp.arange(n)[None, :])
    not_self = gap > 0
    pos_mask = (d < params[0]) & (gap >= params[1]) & not_self
    neg_mask = ((d >= params[2]) & (d <= params[3])
                & (gap >= params[4]) & not_self)
    logits = jnp.where(pos_mask, 0.0, -jnp.inf)
    pos_idx = jax.random.categorical(rng_key, logits, axis=1)
    if strategy == "hard":
        # tiled running-min over database tiles: the one-shot
        # (count, n, n_bins) broadcast reduce tiles poorly in XLA at
        # 100k nodes (~25 s/chunk measured); streaming 4096-row tiles
        # with a fori_loop carry is ~20x faster and O(count·tile) memory
        TILE = 4096
        npad = -(-n // TILE) * TILE
        cdfs_p = jnp.pad(cdfs, ((0, npad - n), (0, 0)))
        negm_p = jnp.pad(neg_mask, ((0, 0), (0, npad - n)))

        def body(t, carry):
            best, best_i = carry
            tile = jax.lax.dynamic_slice_in_dim(cdfs_p, t * TILE, TILE)
            mt = jax.lax.dynamic_slice_in_dim(negm_p, t * TILE, TILE,
                                              axis=1)
            w1t = jnp.sum(jnp.abs(acdf[:, None, :] - tile[None, :, :]),
                          axis=-1)
            w1t = jnp.where(mt, w1t, jnp.inf)
            tmin = jnp.min(w1t, axis=1)
            targ = (t * TILE + jnp.argmin(w1t, axis=1)).astype(jnp.int32)
            upd = tmin < best
            return (jnp.where(upd, tmin, best),
                    jnp.where(upd, targ, best_i))

        best0 = jnp.full((count,), jnp.inf, jnp.float32)
        _, neg_idx = jax.lax.fori_loop(
            0, npad // TILE, body,
            (best0, jnp.zeros((count,), jnp.int32)))
        valid = jnp.any(pos_mask, axis=1) & jnp.any(neg_mask, axis=1)
        return pos_idx, neg_idx, valid
    w1 = jnp.sum(jnp.abs(acdf[:, None, :] - cdfs[None, :, :]), axis=-1)
    masked = jnp.where(neg_mask, w1, jnp.inf)
    if strategy == "semi-hard":
        order = jnp.argsort(masked, axis=1)
        cnt = jnp.sum(neg_mask, axis=1)
        neg_idx = jnp.take_along_axis(
            order, (cnt // 2)[:, None].astype(jnp.int32), axis=1)[:, 0]
    else:
        nlogits = jnp.where(neg_mask, 0.0, -jnp.inf)
        neg_idx = jax.random.categorical(
            jax.random.fold_in(rng_key, 1), nlogits, axis=1)
    valid = jnp.any(pos_mask, axis=1) & jnp.any(neg_mask, axis=1)
    return pos_idx, neg_idx, valid


class TripletMiner:
    def __init__(self, positive_distance_max: float = 5.0,
                 positive_temporal_min: int = 30,
                 negative_distance_min: float = 10.0,
                 negative_distance_max: float = 50.0,
                 negative_temporal_min: int = 30,
                 mining_strategy: str = "hard",
                 seed: int = 0):
        self.params = np.array([
            positive_distance_max, positive_temporal_min,
            negative_distance_min, negative_distance_max,
            negative_temporal_min,
        ], dtype=np.float32)
        self.mining_strategy = mining_strategy
        self._key = jax.random.key(seed)

    def mine_triplets(self, descriptors: np.ndarray, poses: np.ndarray,
                      n_triplets_per_anchor: int = 1,
                      sequence_ids: Optional[np.ndarray] = None
                      ) -> np.ndarray:
        """Returns (T, 3) int array of (anchor, positive, negative) GLOBAL
        indices. Per-sequence when ``sequence_ids`` is given (temporal gaps
        are measured within a sequence, like the reference's local
        indices, triplet_miner.py:193-212)."""
        positions = poses[:, :3, 3].astype(np.float32)
        cdfs = np.cumsum(
            descriptors / np.maximum(descriptors.sum(1, keepdims=True), 1e-12),
            axis=1).astype(np.float32)

        if sequence_ids is None:
            sequence_ids = np.zeros(len(descriptors), np.int64)
        triplets = []
        for seq in np.unique(sequence_ids):
            sel = np.where(sequence_ids == seq)[0]
            if len(sel) < 3:
                continue
            for rep in range(n_triplets_per_anchor):
                self._key, sub = jax.random.split(self._key)
                pos_i, neg_i, valid = _mine_kernel_chunked(
                    positions[sel], cdfs[sel], sub, self.params,
                    self.mining_strategy)
                anchors = np.nonzero(valid)[0]
                tri = np.stack([sel[anchors], sel[pos_i[anchors]],
                                sel[neg_i[anchors]]], axis=1)
                triplets.append(tri)
        if not triplets:
            return np.zeros((0, 3), np.int64)
        return np.concatenate(triplets, axis=0)


def create_triplet_miner(positive_distance_max: float = 5.0,
                         positive_temporal_min: int = 30,
                         negative_distance_min: float = 10.0,
                         negative_distance_max: float = 50.0,
                         negative_temporal_min: int = 30,
                         mining_strategy: str = "hard",
                         seed: int = 0) -> TripletMiner:
    return TripletMiner(positive_distance_max, positive_temporal_min,
                        negative_distance_min, negative_distance_max,
                        negative_temporal_min, mining_strategy, seed)


class BatchTripletMiner:
    """In-batch online miner (reference triplet_miner.py:362-509 — unused
    by the reference's own training loop but part of its API surface).

    The reference's per-anchor Python loop becomes masked batched
    argmax/argmin: hard positive = farthest same-label, hard negative =
    closest different-label (semi-hard: closest negative inside the
    (d_pos, d_pos+margin) band, falling back to hardest).
    """

    def __init__(self, margin: float = 0.1, mining_strategy: str = "hard",
                 seed: int = 0):
        self.margin = margin
        self.mining_strategy = mining_strategy
        self._rng = np.random.default_rng(seed)

    @staticmethod
    def _pairwise_distances(embeddings: np.ndarray) -> np.ndarray:
        dot = embeddings @ embeddings.T
        sq = np.diag(dot)[None, :]
        d2 = np.clip(sq + sq.T - 2.0 * dot, 0.0, None)
        return np.sqrt(d2)

    def mine_batch_triplets(self, embeddings: np.ndarray, labels: np.ndarray):
        """Returns (anchors, positives, negatives) embedding arrays of
        shape (n_valid, D) — anchors without a valid positive AND negative
        are dropped, like the reference."""
        embeddings = np.asarray(embeddings)
        labels = np.asarray(labels)
        n = len(embeddings)
        d = self._pairwise_distances(embeddings)
        same = labels[None, :] == labels[:, None]
        pos_mask = same & ~np.eye(n, dtype=bool)
        neg_mask = ~same
        has_pos = pos_mask.any(axis=1)
        has_neg = neg_mask.any(axis=1)
        valid = has_pos & has_neg

        if self.mining_strategy == "hard":
            pos_idx = np.where(pos_mask, d, -1.0).argmax(axis=1)
            neg_idx = np.where(neg_mask, d, np.inf).argmin(axis=1)
        elif self.mining_strategy == "semi-hard":
            pos_idx = np.where(pos_mask, d, -1.0).argmax(axis=1)
            d_pos = d[np.arange(n), pos_idx]
            nd = np.where(neg_mask, d, np.inf)
            band = (nd > d_pos[:, None]) & (nd < (d_pos + self.margin)[:, None])
            banded = np.where(band, nd, np.inf)
            has_band = np.isfinite(banded).any(axis=1)
            neg_idx = np.where(has_band, banded.argmin(axis=1),
                               nd.argmin(axis=1))
        else:  # random
            pos_idx = np.array([
                self._rng.choice(np.nonzero(pos_mask[i])[0])
                if has_pos[i] else 0 for i in range(n)])
            neg_idx = np.array([
                self._rng.choice(np.nonzero(neg_mask[i])[0])
                if has_neg[i] else 0 for i in range(n)])

        sel = np.nonzero(valid)[0]
        return (embeddings[sel], embeddings[pos_idx[sel]],
                embeddings[neg_idx[sel]])
