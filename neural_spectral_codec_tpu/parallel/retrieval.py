"""Row-sharded Wasserstein retrieval database.

Scaling plan from SURVEY §5.7: shard the (capacity, n_bins) CDF buffer's
rows across the mesh; a query computes local W₁ distances + local top-k on
each chip's slab, then one small all-gather of (k indices, k distances) per
chip and a global top-k — an all-gather-free scan of the database itself.
Per-chip HBM traffic drops by the mesh size, so query latency scales down
linearly until the tiny gather dominates.

Implemented with ``jax.shard_map`` so the collective structure is explicit
(one ``all_gather`` of 2·k·n_dev floats over ICI).
"""

from __future__ import annotations

import functools
import threading
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from neural_spectral_codec_tpu.ops.wasserstein import histogram_cdf
from neural_spectral_codec_tpu.retrieval.retriever import (
    _dequant_rows, _quantize_cdf, _topk_smallest)


def _make_query_fn(mesh: Mesh, top_k: int, metric: str = "wasserstein"):
    rows = P("data", None)
    repl = P()

    def local_query(db_cdf, db_pos, size, query_cdf, qp):
        # db_cdf: (rows_per_shard, n_bins) local slab; queries (Q, n_bins)
        # (CDFs under W₁; raw vectors under L2)
        shard = jax.lax.axis_index("data")
        n_local = db_cdf.shape[0]
        base = shard * n_local
        db_cdf = _dequant_rows(db_cdf)  # uint16 storage mode; f32 no-op
        if metric == "wasserstein":
            dists = jnp.sum(
                jnp.abs(db_cdf[None, :, :] - query_cdf[:, None, :]), axis=2)
        else:
            dists = jnp.linalg.norm(
                db_cdf[None, :, :] - query_cdf[:, None, :], axis=2)
        gidx = base + jnp.arange(n_local)
        invalid = (gidx >= size)[None, :]
        spatial = jnp.linalg.norm(
            db_pos[None, :, :] - qp[:, None, :3], axis=2) < qp[:, 3:4]
        masked = jnp.where(
            invalid | ((qp[:, 3:4] > 0) & spatial), jnp.inf, dists)
        k = min(top_k, n_local)
        dist_local, idx_local = _topk_smallest(masked, k)     # (Q, k)
        idx_local = jnp.minimum(idx_local, n_local - 1)
        neg_local = -dist_local
        # one small all-gather over ICI: (n_dev, Q, k) each
        all_neg = jax.lax.all_gather(neg_local, "data")
        all_idx = jax.lax.all_gather(
            jnp.take(gidx, idx_local, axis=0), "data")
        q = all_neg.shape[1]
        all_neg = all_neg.transpose(1, 0, 2).reshape(q, -1)
        all_idx = all_idx.transpose(1, 0, 2).reshape(q, -1)
        neg_top, pos = jax.lax.top_k(all_neg, top_k)
        return jnp.take_along_axis(all_idx, pos, axis=1), -neg_top

    fn = jax.shard_map(
        local_query, mesh=mesh,
        in_specs=(rows, rows, repl, repl, repl),
        out_specs=(repl, repl),
        check_vma=False)
    return jax.jit(fn)


class ShardedWassersteinRetriever:
    """Drop-in sharded variant of ``retrieval.retriever.WassersteinRetriever``:
    same add/query surface, database rows sharded over ``mesh``."""

    def __init__(self, mesh: Mesh, n_bins: int = 800,
                 capacity: int = 100_000, epsilon: float = 1e-8,
                 metric: str = "wasserstein", storage: str = "float32"):
        if metric not in ("wasserstein", "l2"):
            raise ValueError(f"unknown metric: {metric}")
        if storage not in ("float32", "uint16"):
            raise ValueError(f"unknown storage: {storage}")
        if storage == "uint16" and metric != "wasserstein":
            raise ValueError(
                "uint16 storage quantizes CDFs in [0, 1]; the l2 metric "
                "stores unbounded raw vectors — use storage='float32'")
        self.metric = metric
        self.storage = storage
        self._row_dtype = jnp.uint16 if storage == "uint16" else jnp.float32
        self.mesh = mesh
        self.n_devices = mesh.shape["data"]
        # capacity rounded up so every shard slab is equal
        self.capacity = -(-capacity // self.n_devices) * self.n_devices
        self.n_bins = n_bins
        self.epsilon = epsilon
        self.database_size = 0
        sh_rows = NamedSharding(mesh, P("data", None))
        self._db_cdf = jax.device_put(
            jnp.zeros((self.capacity, n_bins), self._row_dtype), sh_rows)
        self._db_pos = jax.device_put(
            jnp.zeros((self.capacity, 3), jnp.float32), sh_rows)
        self._query_fns = {}
        # same donated-buffer guard as the unsharded retriever: a query
        # thread must not dispatch against a buffer an insert just donated
        self._buffer_lock = threading.Lock()

    def _encode_rows(self, vectors: jnp.ndarray) -> jnp.ndarray:
        """Storage encoding for DATABASE rows (quantized under uint16
        storage). Queries use :meth:`_encode_query` instead — they stay
        fp32 regardless of storage, matching the unsharded retriever
        (only the big scanned buffer is quantized)."""
        cdf = self._encode_query(vectors)
        if self.storage == "uint16":
            return _quantize_cdf(cdf)
        return cdf

    def _encode_query(self, vectors: jnp.ndarray) -> jnp.ndarray:
        if self.metric == "wasserstein":
            return histogram_cdf(vectors, self.epsilon)
        return vectors

    def add_to_database(self, histograms: np.ndarray,
                        positions: Optional[np.ndarray] = None) -> None:
        h = jnp.asarray(np.atleast_2d(np.asarray(histograms, np.float32)))
        n = h.shape[0]
        if self.database_size + n > self.capacity:
            raise ValueError("Database capacity exceeded")
        cdf = self._encode_rows(h)
        start = jnp.int32(self.database_size)
        # donated jitted update: writes rows in place (preserving the row
        # sharding) instead of copying the whole sharded buffer
        with self._buffer_lock:
            self._db_cdf = self._insert(self._db_cdf, cdf, start)
            if positions is not None:
                self._db_pos = self._insert(
                    self._db_pos,
                    jnp.asarray(np.atleast_2d(positions), jnp.float32),
                    start)
            self.database_size += n

    @staticmethod
    @functools.partial(jax.jit, donate_argnums=(0,))
    def _insert(buf, rows, start):
        return jax.lax.dynamic_update_slice(buf, rows, (start, 0))

    @staticmethod
    @functools.partial(jax.jit, donate_argnums=(0,))
    def _set(buf, idx, rows):
        return buf.at[idx].set(rows, mode="drop", unique_indices=True)

    def update_rows(self, indices: np.ndarray, vectors: np.ndarray) -> None:
        """Overwrite existing rows in place (GNN local-update refresh),
        same surface as the unsharded retriever. The scatter is planned by
        the SPMD partitioner over the row-sharded buffer; indices may land
        on any shard."""
        idx = np.atleast_1d(np.asarray(indices, np.int64))
        if len(idx) == 0:
            return
        if idx.max() >= self.database_size:
            raise IndexError("update_rows beyond database size")
        v = jnp.asarray(np.atleast_2d(np.asarray(vectors, np.float32)))
        with self._buffer_lock:
            self._db_cdf = self._set(self._db_cdf, jnp.asarray(idx),
                                     self._encode_rows(v))

    def query(self, query_hist: np.ndarray, top_k: int = 10,
              query_position: Optional[np.ndarray] = None,
              spatial_min_distance: float = 0.0,
              exclude_last: int = 0,
              as_of_size: Optional[int] = None
              ) -> Tuple[np.ndarray, np.ndarray]:
        if self.database_size == 0:
            return np.array([], np.int64), np.array([])
        idx, dist = self.query_batch(
            np.atleast_2d(np.asarray(query_hist)), top_k=top_k,
            query_positions=(None if query_position is None
                             else np.atleast_2d(query_position)),
            spatial_min_distance=spatial_min_distance,
            exclude_last=exclude_last, as_of_size=as_of_size)
        if idx.shape[1] == 0:
            return np.array([], np.int64), np.array([])
        keep = np.isfinite(dist[0])
        return idx[0][keep], dist[0][keep]

    def query_batch(self, query_hists: np.ndarray, top_k: int = 10,
                    query_positions: Optional[np.ndarray] = None,
                    spatial_min_distance: float = 0.0,
                    exclude_last: int = 0,
                    as_of_size: Optional[int] = None
                    ) -> Tuple[np.ndarray, np.ndarray]:
        """(Q, n_bins) queries in one sharded dispatch: local W₁ + local
        top-k per shard slab, one (n_dev, Q, k) all-gather over ICI,
        global top-k. ``exclude_last`` drops the newest entries (temporal
        context exclusion) and ``as_of_size`` queries a database-size
        snapshot — both with the unsharded retriever's semantics.
        Excluded entries carry inf distance and index -1."""
        size0 = self.database_size if as_of_size is None else \
            min(int(as_of_size), self.database_size)
        eff_size = max(size0 - max(exclude_last, 0), 0)
        if eff_size == 0:
            qn = len(np.atleast_2d(query_hists))
            return np.zeros((qn, 0), np.int64), np.zeros((qn, 0))
        # clamp by capacity (one executable per top_k; see the unsharded
        # retriever) — invalid rows carry inf and are filtered by callers
        k = int(min(top_k, self.capacity))
        if k not in self._query_fns:
            self._query_fns[k] = _make_query_fn(self.mesh, k, self.metric)
        q = jnp.asarray(np.atleast_2d(np.asarray(query_hists, np.float32)))
        q_cdf = self._encode_query(q)
        qn = q.shape[0]
        qp = np.zeros((qn, 4), np.float32)
        if query_positions is not None and spatial_min_distance > 0:
            qp[:, :3] = np.atleast_2d(query_positions)
            qp[:, 3] = spatial_min_distance
        with self._buffer_lock:
            idx, dist = self._query_fns[k](
                self._db_cdf, self._db_pos, jnp.int32(eff_size),
                q_cdf, jnp.asarray(qp))
        idx, dist = np.asarray(idx, np.int64), np.asarray(dist)
        # same -1 sentinel contract as the unsharded retriever: excluded
        # slots must not surface clamp-artifact row ids
        return np.where(np.isfinite(dist), idx, -1), dist

    def warm_query(self, top_k: int) -> None:
        """Compile the sharded query executable against the live buffers
        (size forced to 1, result discarded) — no scratch allocation; see
        the unsharded retriever's ``warm_query``."""
        k = int(min(top_k, self.capacity))
        if k not in self._query_fns:
            self._query_fns[k] = _make_query_fn(self.mesh, k, self.metric)
        q = jnp.full((1, self.n_bins), 1.0 / self.n_bins, jnp.float32)
        qp = jnp.zeros((1, 4), jnp.float32)
        with self._buffer_lock:
            self._query_fns[k](self._db_cdf, self._db_pos, jnp.int32(1),
                               q, qp)

    def clear_database(self) -> None:
        with self._buffer_lock:
            self.database_size = 0
            sh_rows = NamedSharding(self.mesh, P("data", None))
            self._db_cdf = jax.device_put(
                jnp.zeros((self.capacity, self.n_bins), self._row_dtype),
                sh_rows)
            self._db_pos = jax.device_put(
                jnp.zeros((self.capacity, 3), jnp.float32), sh_rows)
