"""End-to-end pipeline orchestration (reference src/pipeline.py:45-433).

Config-driven wiring of every layer:

  loaders → keyframe selection → batched device encoding → temporal graph
  → GNN training (offline) / local GNN refresh (online) → two-stage
  retrieval → g2o loop-closure edges.

TPU-first differences from the reference:
  * Keyframe scans are encoded in fixed-shape device batches (one compiled
    program reused across chunks) instead of per-scan host→device round
    trips (reference pipeline.py:336-354).
  * ``train_offline`` builds the graph with the O(n) vectorized builder and
    trains WITH edge features and per-sequence mining (the reference's
    pipeline variant silently dropped both — SURVEY §3.2; kept here since
    they only improve quality, divergence documented).
  * ``run_online`` refreshes embeddings with the k-hop LocalUpdateGNN —
    actually implemented here, whereas the reference's falls back to a
    full-graph forward (reference model.py:248-281).
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from neural_spectral_codec_tpu.data.pose_utils import is_valid_transformation
from neural_spectral_codec_tpu.keyframe.graph import (
    TemporalGraphManager, build_graph_from_keyframes)
from neural_spectral_codec_tpu.keyframe.selector import Keyframe, KeyframeSelector
from neural_spectral_codec_tpu.models.gnn import (
    LocalUpdateGNN, SpectralGNN, gnn_forward, init_gnn)
from neural_spectral_codec_tpu.ops.range_image import pad_points
from neural_spectral_codec_tpu.ops.spectral import (
    SpectralEncoderConfig, encode_points_batch)
from neural_spectral_codec_tpu.retrieval.g2o import save_loop_closures_g2o
from neural_spectral_codec_tpu.retrieval.two_stage import TwoStageRetrieval
from neural_spectral_codec_tpu.training.miner import create_triplet_miner
from neural_spectral_codec_tpu.training.trainer import GNNTrainer
from neural_spectral_codec_tpu.utils.config import get as cfg_get
from neural_spectral_codec_tpu.utils.config import load_config
from neural_spectral_codec_tpu.utils.profiler import Profiler

logger = logging.getLogger(__name__)


def _default_cache_dir() -> str:
    """Per-user cache location: a world-shared /tmp path would let another
    user on a multi-user host own the directory (breaking cache writes, or
    worse, poisoning compiled executables)."""
    import os
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache")
    return os.path.join(base, "nsc_jax_cache")


def enable_compilation_cache(cache_dir: Optional[str] = None) -> None:
    """Persistent XLA compilation cache: cold starts reuse compiled
    executables from previous processes. The first-ever compiles take
    minutes on a fresh machine and would otherwise surface as mid-stream
    stalls; with the cache + warmup() a service restart reaches
    serving-ready in ~2 min on the tunneled dev harness (measured),
    dominated by imports/backend init rather than compilation. Safe to
    call more than once; a no-op if the config is already set."""
    import jax
    if cache_dir is None:
        cache_dir = _default_cache_dir()
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:            # already-initialized edge cases
        logger.debug("compilation cache not enabled: %s", e)


class BatchEncoder:
    """Fixed-shape batched descriptor encoder: pads each scan to
    ``max_points`` and encodes in device chunks of ``batch_size`` so one
    compiled program serves every call."""

    def __init__(self, config: SpectralEncoderConfig, alpha: float = 2.0,
                 max_points: int = 131072, batch_size: int = 64):
        import jax.numpy as jnp
        self.config = config
        self.alpha = jnp.float32(alpha)
        self.max_points = max_points
        self.batch_size = batch_size

    def encode(self, clouds: Sequence[np.ndarray],
               ring_ids: Optional[Sequence] = None) -> np.ndarray:
        # ring_ids: per-cloud explicit ring assignments (HeLiPR carries
        # them natively); the general path ignores them
        import jax.numpy as jnp
        out = []
        B = self.batch_size
        for i in range(0, len(clouds), B):
            chunk = clouds[i:i + B]
            batch = np.stack(
                [pad_points(c, self.max_points) for c in chunk])
            if len(chunk) < B:  # pad batch to fixed shape, drop later
                batch = np.concatenate(
                    [batch, np.full((B - len(chunk), self.max_points, 4),
                                    np.nan, np.float32)])
            d = encode_points_batch(jnp.asarray(batch), self.alpha,
                                    self.config)
            out.append(np.asarray(d)[:len(chunk)])
        return np.concatenate(out) if out else np.zeros(
            (0, self.config.output_dim), np.float32)

    def encode_one(self, cloud: np.ndarray,
                   ring_ids: Optional[np.ndarray] = None) -> np.ndarray:
        """Single-scan path with its own B=1 executable — the online loop
        encodes one keyframe at a time and must not pay for a full
        batch_size chunk of padding."""
        import jax.numpy as jnp
        batch = pad_points(cloud, self.max_points)[None]
        d = encode_points_batch(jnp.asarray(batch), self.alpha, self.config)
        return np.asarray(d)[0]


class RingMajorBatchEncoder(BatchEncoder):
    """`encoding.ring_major: true` — for spinning-LiDAR streams whose
    scans arrive ring-major (KITTI .bin order) or with explicit ring
    ids: each scan takes the sort-free ring fast path
    (ops/ring_path.encode_structured) after host-side ring-id recovery,
    with the structure contract verified per scan and an EXACT fallback
    to the general sorted path — output always equals the base encoder's
    (ops/ring_path.py docstring; tests/test_pipeline.py). Clouds larger
    than ``max_points`` are truncated exactly like the base encoder's
    ``pad_points``.

    ``encode`` stacks contract-passing scans into fixed-shape
    ``(RING_B, R, Ppad, 4)`` device batches — RING_B = 8 is the measured
    per-scan cost optimum of the ring kernel (docs/performance.md) —
    grouped by (row assignment, ring shape) so one executable serves
    each sensor geometry; stragglers are padded with NaN scans
    (transparent: batch entries are independent) and contract-violating
    scans fall back to the base batch path."""

    RING_B = 8

    def _prepare_auto(self, cloud: np.ndarray, explicit_ids):
        """Contract-checked ring-major preparation: explicit ids when the
        sensor provides them (HeLiPR), else sweep-order inference
        (ring-major streams, KITTI .bin), else elevation clustering
        (firing-interleaved streams, NCLT). None -> exact general path."""
        from neural_spectral_codec_tpu.ops.ring_path import (
            infer_ring_ids_by_elevation, infer_ring_ids_from_sweep,
            prepare_structured)
        if explicit_ids is not None:
            return prepare_structured(
                cloud, np.asarray(explicit_ids)[:self.max_points],
                self.config)
        prep = prepare_structured(cloud, infer_ring_ids_from_sweep(cloud),
                                  self.config)
        if prep is None:
            rid = infer_ring_ids_by_elevation(cloud)
            if rid is not None:
                prep = prepare_structured(cloud, rid, self.config)
        return prep

    def encode(self, clouds: Sequence[np.ndarray],
               ring_ids: Optional[Sequence] = None) -> np.ndarray:
        import jax.numpy as jnp
        from neural_spectral_codec_tpu.ops.ring_path import (
            encode_points_ring_batch)

        out = np.zeros((len(clouds), self.config.output_dim), np.float32)
        pending: Dict = {}
        fallback: List[int] = []

        def flush(key, items):
            rows, shape, bounds = key
            batch = np.full((self.RING_B,) + shape, np.nan, np.float32)
            for j, (_, rings) in enumerate(items):
                batch[j] = rings
            d = np.asarray(encode_points_ring_batch(
                jnp.asarray(batch), self.alpha, self.config, rows, 2,
                bounds))
            for j, (i, _) in enumerate(items):
                out[i] = d[j]

        # flush each group's chunk as soon as it fills: at most
        # n_groups x RING_B prepared (R, Ppad, 4) copies are ever live
        # (preparing a whole KITTI-scale sequence up front would hold
        # gigabytes of ring-major copies before the first device batch)
        for i, cloud in enumerate(clouds):
            c = np.asarray(cloud)[:self.max_points]
            prep = (self._prepare_auto(
                c, ring_ids[i] if ring_ids is not None else None)
                if len(c) else None)
            if prep is None:
                fallback.append(i)
                continue
            rings, rows, bounds = prep
            # bounds join the group key: each certified (fill, runmin)
            # pair is its own compiled kernel variant (the stage ladder
            # in ring_stage_bounds keeps the variant count small); the
            # NaN batch filler rows are all-hole and bound-neutral
            key = (rows, rings.shape, bounds)
            pending.setdefault(key, []).append((i, rings))
            if len(pending[key]) == self.RING_B:
                flush(key, pending.pop(key))
        for key, items in pending.items():
            flush(key, items)
        if fallback:
            d = super().encode([np.asarray(clouds[i]) for i in fallback])
            for j, i in enumerate(fallback):
                out[i] = d[j]
        return out

    def encode_one(self, cloud: np.ndarray,
                   ring_ids: Optional[np.ndarray] = None) -> np.ndarray:
        import jax.numpy as jnp
        from neural_spectral_codec_tpu.ops.ring_path import (
            encode_points_ring_batch)
        cloud = np.asarray(cloud)[:self.max_points]
        prep = self._prepare_auto(cloud, ring_ids) if len(cloud) else None
        if prep is None:
            # exact general path, through the same B=1 executable the
            # base online loop uses
            return super().encode_one(cloud)
        rings, rows, bounds = prep
        return np.asarray(encode_points_ring_batch(
            jnp.asarray(rings[None]), self.alpha, self.config, rows, 2,
            bounds))[0]


class NeuralSpectralCodecPipeline:
    """Config-driven wiring of all components (reference pipeline.py:52-95)."""

    def __init__(self, config: Dict):
        self.config = config
        self.profiler = Profiler()
        if cfg_get(config, "system.compilation_cache", True):
            enable_compilation_cache(
                cfg_get(config, "system.compilation_cache_dir", None))

        enc = config.get("encoding", {})
        elev = tuple(enc.get("elevation_range", (-24.8, 2.0)))
        self.encoder_config = SpectralEncoderConfig(
            n_elevation=enc.get("n_elevation", 16),
            n_azimuth=enc.get("n_azimuth", 360),
            n_bins=enc.get("n_bins", 50),
            target_elevation_bins=enc.get("target_elevation_bins", 16),
            alpha=enc.get("alpha", 2.0),
            epsilon=enc.get("epsilon", 1e-8),
            interpolate_empty=enc.get("interpolate_empty", True),
            elevation_range_deg=elev,
            max_range=enc.get("max_range", 80.0),
            min_range=enc.get("min_range", 1.0),
            elevation_mode=enc.get("elevation_mode", "clip"),
        )
        encoder_cls = (RingMajorBatchEncoder if enc.get("ring_major")
                       else BatchEncoder)
        self.encoder = encoder_cls(
            self.encoder_config,
            alpha=enc.get("alpha", 2.0),
            max_points=enc.get("max_points", 131072),
            batch_size=cfg_get(config, "deployment.batch_size", 64))

        # ablation-study flags: the reference DECLARES these
        # (reference configs/training.yaml:89-93) but no code reads them;
        # here they actually ablate the respective subsystem
        ab = config.get("ablation", {})
        self.ablate_gnn = ab.get("disable_gnn", False)
        ablate_temporal_edges = ab.get("disable_temporal_edges", False)
        ablate_context = ab.get("disable_context", False)

        kf = config.get("keyframe", {})
        self.selector = KeyframeSelector(
            distance_threshold=kf.get("distance_threshold", 0.5),
            rotation_threshold=kf.get("rotation_threshold", 15.0),
            overlap_threshold=kf.get("overlap_threshold", 0.7),
            temporal_threshold=kf.get("temporal_threshold", 5.0),
            voxel_size=kf.get("voxel_size", 0.2),
            max_keyframes=kf.get("max_keyframes", 100_000),
        )
        self.temporal_neighbors = (0 if ablate_temporal_edges
                                   else kf.get("temporal_neighbors", 5))
        self.graph_manager = TemporalGraphManager(
            temporal_neighbors=self.temporal_neighbors,
            max_active_nodes=kf.get("max_active_nodes", 1000),
            freeze_old_embeddings=kf.get("freeze_old_embeddings", True),
        )

        g = config.get("gnn", {})
        # training.mixed_precision: the TPU analog of the reference's dead
        # gpu.mixed_precision knob (reference configs/training.yaml:85) —
        # bf16 matmuls on the MXU, float32 params/BN/softmax/loss
        import jax.numpy as jnp
        mp = cfg_get(config, "training.mixed_precision",
                     g.get("mixed_precision", False))
        self.model = SpectralGNN(
            input_dim=g.get("input_dim", self.encoder_config.output_dim),
            hidden_dim=g.get("hidden_dim", 256),
            output_dim=g.get("output_dim", self.encoder_config.output_dim),
            n_layers=g.get("n_layers", 3),
            dropout=g.get("dropout", 0.1),
            residual=g.get("residual", True),
            edge_dim=g.get("edge_dim", 2),
            compute_dtype=jnp.bfloat16 if mp else None,
        )
        self.params = None
        self.batch_stats = None
        self.local_update_hops = g.get("local_update_hops", 3)
        self.use_local_updates = g.get("use_local_updates", True)

        r = config.get("retrieval", {})
        # retrieval.use_embeddings switches stage 1 from W1-on-histograms
        # (reference behavior — which leaves the online GNN embeddings
        # UNUSED, reference pipeline.py:259) to L2-on-GNN-embeddings, the
        # mode the training recall metric actually optimizes
        self.use_embeddings_for_retrieval = r.get("use_embeddings", False)
        if self.ablate_gnn and self.use_embeddings_for_retrieval:
            logger.warning("ablation.disable_gnn: retrieval.use_embeddings "
                           "has no embeddings to use; falling back to raw "
                           "W1 histograms")
            self.use_embeddings_for_retrieval = False
        retrieval_mesh = None
        if cfg_get(config, "parallel.shard_retrieval_db", False):
            import jax
            if jax.device_count() > 1:
                from neural_spectral_codec_tpu.parallel import create_mesh
                retrieval_mesh = create_mesh(
                    cfg_get(config, "system.mesh_devices"))
            else:
                logger.warning("parallel.shard_retrieval_db requested but "
                               "only one device present; using the "
                               "unsharded retriever")
        # stage-1 metric: GNN embeddings force L2; raw descriptors use W1
        # unless retrieval.use_wasserstein is explicitly disabled
        stage1_metric = ("l2" if (self.use_embeddings_for_retrieval
                                  or not r.get("use_wasserstein", True))
                         else "wasserstein")
        # retrieval.storage = "uint16" packs the stage-1 database into
        # fixed-point CDF codes (half the HBM, 2x capacity; W1 only —
        # the L2/embedding mode needs unbounded fp32 rows)
        stage1_storage = r.get("storage", "float32")
        if stage1_metric != "wasserstein" and stage1_storage != "float32":
            logger.warning("retrieval.storage=%s requires the W1 metric; "
                           "using float32 rows", stage1_storage)
            stage1_storage = "float32"
        self.retrieval = TwoStageRetrieval(
            stage1_metric=stage1_metric,
            stage1_storage=stage1_storage,
            top_k=r.get("top_k", 10),
            # loop_closing.min_loop_distance is the reference-surface
            # alias for the stage-1 spatial exclusion radius
            spatial_filter_distance=r.get(
                "spatial_filter_distance",
                cfg_get(config, "loop_closing.min_loop_distance", 50.0)),
            context_window=(0 if ablate_context
                            else r.get("context_window", 10)),
            fitness_threshold=r.get("icp_fitness_threshold", 0.3),
            rmse_threshold=r.get("icp_rmse_threshold", 0.5),
            verification_method=r.get("verification_method", "gicp"),
            n_bins=self.encoder_config.output_dim,
            capacity=r.get("database_capacity",
                           cfg_get(config, "database.max_database_size",
                                   100_000)),
            icp_max_iterations=r.get("icp_max_iterations", 30),
            voxel_downsample=r.get("voxel_downsample", 0.3),
            verification_max_points=r.get("verification_max_points", 4096),
            verification_backend=r.get("verification_backend", "auto"),
            parallel_verification=r.get("parallel_verification", False),
            verification_workers=r.get("verification_workers", 4),
            mesh=retrieval_mesh,
        )

    # ------------------------------------------------------------------
    # offline training
    # ------------------------------------------------------------------

    def _process_sequence(self, loader, sequence_id: int = 0,
                          selector: Optional[KeyframeSelector] = None
                          ) -> List[Keyframe]:
        """Select keyframes from a loader and attach batched descriptors
        (reference pipeline.py:284-364's per-scan hot loop, with encoding
        hoisted into device batches)."""
        sel = selector or self.selector
        new_kfs: List[Keyframe] = []
        new_ring_ids: List[Optional[np.ndarray]] = []
        n_skipped = 0
        check_poses = cfg_get(self.config, "quality.validate_poses", False)
        # native read-ahead (data/native_io.py frame_source): C++ workers
        # decode scans ahead of selection, gated by system.io_prefetch
        from neural_spectral_codec_tpu.data.native_io import frame_source
        with frame_source(loader, self.config) as get_frame, \
                self.profiler.profile(f"select_seq{sequence_id}"):
            for scan_id in range(len(loader)):
                try:
                    frame = get_frame(scan_id)
                    if check_poses and not is_valid_transformation(
                            np.asarray(frame["pose"], np.float64)):
                        n_skipped += 1
                        logger.warning("Skipping scan %d: invalid SE(3) "
                                       "pose", scan_id)
                        continue
                    selected, kf, _ = sel.process_scan(
                        scan_id, frame["points"], frame["pose"],
                        frame["timestamp"], sequence_id=sequence_id)
                except Exception as e:
                    # corrupt scans are logged and skipped, like the
                    # reference (train_multi_dataset.py:163-190)
                    n_skipped += 1
                    logger.warning("Skipping scan %d: %s", scan_id, e)
                    continue
                if selected:
                    new_kfs.append(kf)
                    new_ring_ids.append(frame.get("ring_ids"))
        if n_skipped:
            logger.warning("Sequence %d: skipped %d corrupt scans",
                           sequence_id, n_skipped)
        with self.profiler.profile(f"encode_seq{sequence_id}"):
            if new_kfs:
                desc = self.encoder.encode([kf.points for kf in new_kfs],
                                           ring_ids=new_ring_ids)
                for kf, d in zip(new_kfs, desc):
                    kf.descriptor = d
        logger.info("Sequence %d: %d scans -> %d keyframes",
                    sequence_id, len(loader), len(new_kfs))
        return new_kfs

    def train_offline(self, train_loaders: Sequence, val_loaders: Sequence = (),
                      n_epochs: Optional[int] = None,
                      resume: Optional[str] = None) -> GNNTrainer:
        """Load → select → encode → graph → train (reference pipeline.py:97-198)."""
        if self.ablate_gnn:
            raise ValueError(
                "ablation.disable_gnn is set: offline GNN training is "
                "meaningless in this ablation — run the benchmark or "
                "run_online to evaluate raw histograms")
        tr = self.config.get("training", {})
        trip = self.config.get("triplet", {})

        train_kfs: List[Keyframe] = []
        for i, loader in enumerate(train_loaders):
            train_kfs.extend(self._process_sequence(loader, sequence_id=i))
        if not train_kfs:
            raise ValueError("No training keyframes selected")

        val_selector = KeyframeSelector(
            distance_threshold=self.selector.criteria.distance_threshold,
            rotation_threshold=self.selector.criteria.rotation_threshold,
            overlap_threshold=self.selector.criteria.overlap_threshold,
            temporal_threshold=self.selector.criteria.temporal_threshold,
        )
        val_kfs: List[Keyframe] = []
        for j, loader in enumerate(val_loaders):
            val_kfs.extend(self._process_sequence(
                loader, sequence_id=1000 + j, selector=val_selector))

        with self.profiler.profile("build_graph"):
            train_graph = build_graph_from_keyframes(
                train_kfs, temporal_neighbors=self.temporal_neighbors)
            val_graph = (build_graph_from_keyframes(
                val_kfs, temporal_neighbors=self.temporal_neighbors)
                if val_kfs else None)

        import jax
        mesh = None
        if (cfg_get(self.config, "parallel.data_parallel", True)
                and jax.device_count() > 1):
            from neural_spectral_codec_tpu.parallel import create_mesh
            mesh = create_mesh(cfg_get(self.config, "system.mesh_devices"))
        trainer = GNNTrainer(
            model=self.model,
            learning_rate=tr.get("learning_rate", 5e-4),
            weight_decay=tr.get("weight_decay", 1e-5),
            margin=trip.get("margin", 0.1),
            grad_clip=tr.get("grad_clip", 1.0),
            checkpoint_dir=cfg_get(self.config, "system.checkpoint_dir",
                                   "checkpoints"),
            patience=tr.get("patience", 10),
            triplets_per_step=tr.get("triplets_per_step", 4096),
            seed=cfg_get(self.config, "system.seed", 42),
            mesh=mesh,
            shard_nodes=cfg_get(self.config, "parallel.shard_graph_nodes",
                                False),
            lr_decay_epochs=tr.get("lr_decay_epochs"),
            lr_decay_factor=tr.get("lr_decay_factor", 0.1),
            min_lr=tr.get("min_lr", 1e-6),
            normalize_embeddings=tr.get("normalize_embeddings", False),
        )
        miner = create_triplet_miner(
            positive_distance_max=trip.get("positive_distance_max", 5.0),
            negative_distance_min=trip.get("negative_distance_min", 10.0),
            negative_distance_max=trip.get("negative_distance_max", 50.0),
            positive_temporal_min=trip.get("positive_temporal_min", 30),
            negative_temporal_min=trip.get(
                "negative_temporal_min", trip.get("positive_temporal_min", 30)),
            mining_strategy=trip.get("mining_strategy", "hard"),
        )
        if resume:
            trainer.load_checkpoint(resume)
        poses = np.array([kf.pose for kf in train_kfs])
        seq_ids = np.array([kf.sequence_id for kf in train_kfs])
        val_poses = (np.array([kf.pose for kf in val_kfs])
                     if val_kfs else None)

        ckpt = self.config.get("checkpoint", {})
        with self.profiler.profile("train"):
            trainer.train(
                train_graph=train_graph,
                train_poses=poses,
                train_descriptors=train_graph.features,
                train_sequence_ids=seq_ids,
                val_graph=val_graph,
                val_poses=val_poses,
                n_epochs=n_epochs or tr.get("n_epochs", 50),
                triplet_miner=miner,
                early_stopping=tr.get("early_stopping", True),
                n_triplets_per_anchor=trip.get("n_negatives_per_anchor", 1),
                recall_ks=cfg_get(self.config, "validation.recall_k_values",
                                  [1, 5, 10]),
                save_best=ckpt.get("save_best", True),
                save_last=ckpt.get("save_last", True),
            )
        self.params, self.batch_stats = trainer.params, trainer.batch_stats
        self.profiler.log_summary()
        return trainer

    # ------------------------------------------------------------------
    # online inference / loop closing
    # ------------------------------------------------------------------

    def load_checkpoint(self, path: str) -> None:
        """Restore GNN params from an orbax checkpoint directory
        (reference pipeline.py:366-390 loads a .pth state dict)."""
        import jax
        import orbax.checkpoint as ocp
        if self.params is None:
            self.params, self.batch_stats = init_gnn(
                self.model, jax.random.key(0))
        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(str(Path(path).absolute()))
        self.params = jax.tree.map(
            lambda t, r: np.asarray(r, t.dtype), self.params,
            restored["params"])
        self.batch_stats = jax.tree.map(
            lambda t, r: np.asarray(r, t.dtype), self.batch_stats,
            restored["batch_stats"])
        logger.info("Loaded GNN checkpoint from %s", path)

    def warmup(self) -> None:
        """Pre-compile the online-serving executables so the streaming
        loop never jit-compiles mid-stream (a first-occurrence padded
        bucket otherwise shows up as a multi-second latency straggler):
        the single-scan encoder, the local-update GNN forward at the
        bucket sizes a session actually hits (replayed on a scratch
        graph, including a loop-edge-inflated subgraph), and the stage-1
        query executable for the configured top_k. Combined with the
        persistent compilation cache, a service restart reaches
        serving-ready in ~2 min on this harness (measured; compiles
        replay from the cache)."""
        import jax
        t0 = time.perf_counter()
        if self.params is None and not self.ablate_gnn:
            self.params, self.batch_stats = init_gnn(
                self.model, jax.random.key(0))

        # encoder: B=1 executable (zeros fail the range gate → the
        # empty-scan path, same compiled shape as any real scan)
        self.encoder.encode_one(np.zeros((64, 4), np.float32))

        if self.ablate_gnn:
            # raw-histogram ablation: no GNN executables to warm
            self.retrieval.retriever.warm_query(self.retrieval.top_k)
            logger.info("warmup: serving executables ready in %.1f s",
                        time.perf_counter() - t0)
            return

        # local-update buckets: replay a short synthetic session on a
        # scratch manager with the SAME neighbor-slot shapes, through the
        # SAME executable the hot path uses (fused encode+GNN by default)
        fused = self.use_local_updates and cfg_get(
            self.config, "deployment.fused_encode", True)
        mgr = TemporalGraphManager(
            temporal_neighbors=self.temporal_neighbors,
            max_active_nodes=self.graph_manager.max_active_nodes)
        local = LocalUpdateGNN(self.model, self.params, self.batch_stats,
                               k_hops=self.local_update_hops)
        dim = self.encoder_config.output_dim
        desc = np.full(dim, 1.0 / dim, np.float32)
        dummy_pts = pad_points(np.zeros((0, 4), np.float32),
                               self.encoder.max_points)

        # one-dispatch serving (deployment.fused_query): the hot path
        # runs _jitted_serving_step, so the replay must warm THAT
        # executable at every padded bucket the session shape hits. The
        # scratch executions write the NEXT FREE database row
        # (insert_at = database_size, which can_fuse_serving guarantees
        # exists) without bumping the size — rows past database_size are
        # invisible to queries and the next real insert overwrites them,
        # so warmup stays side-effect-free while populating the actual
        # jit dispatch cache (an AOT .lower().compile() would not).
        one_dispatch = fused and cfg_get(
            self.config, "deployment.fused_query", True) \
            and self.retrieval.can_fuse_serving()
        warmed_buckets = set()

        def _warm_serve(pg, center):
            import jax.numpy as jnp
            from neural_spectral_codec_tpu.models.gnn import (
                _jitted_serving_step)
            ret = self.retrieval.retriever
            for do_q in (False, True):
                fn = _jitted_serving_step(
                    self.model, self.encoder_config,
                    int(min(self.retrieval.top_k, ret.capacity)),
                    ret.metric, ret.storage, ret.epsilon, do_q, True)

                def _dispatch(db_rows, db_pos, insert_at, eff_size,
                              fn=fn):
                    return fn(db_rows, db_pos, jnp.asarray(dummy_pts),
                              self.encoder.alpha, self.params,
                              self.batch_stats,
                              jnp.asarray(pg.features),
                              jnp.asarray(pg.neighbors),
                              jnp.asarray(pg.mask),
                              jnp.asarray(pg.edge_feats),
                              jnp.int32(center), insert_at, eff_size,
                              jnp.zeros(4, jnp.float32),
                              jnp.zeros(3, jnp.float32))

                ret.fused_dispatch(_dispatch, insert=False)
            warmed_buckets.add(pg.n_nodes)

        def _refresh(node):
            if one_dispatch:
                s, m = mgr.get_local_subgraph(node, self.local_update_hops)
                pg = local._padded(s)
                if pg.n_nodes not in warmed_buckets:
                    _warm_serve(pg, m[node])
            elif fused:
                local.encode_update_local(mgr, node, dummy_pts,
                                          self.encoder.alpha,
                                          self.encoder_config)
            else:
                local.update_embeddings_local(mgr, node)

        node = 0
        for i in range(18):
            kf = Keyframe(keyframe_id=i, scan_id=i, timestamp=float(i),
                          pose=np.eye(4, dtype=np.float32), points=None,
                          descriptor=desc.copy())
            node = mgr.add_keyframe(kf)
            _refresh(node)
        # loop edges widen the k-hop subgraph into the next bucket
        mgr.add_loop_closure_edge(17, 0)
        mgr.add_loop_closure_edge(17, 8)
        _refresh(node)
        # a live session whose loop edges inflate the k-hop subgraph past
        # the replayed sizes would jit mid-stream — pre-compile ONE bucket
        # beyond the largest replayed one by forcing a padded forward at
        # 2x the last subgraph's bucket
        sub, mapping = mgr.get_local_subgraph(node, self.local_update_hops)
        from neural_spectral_codec_tpu.keyframe.graph import pad_graph
        n = max(sub.n_nodes, 8)
        bucket_up = 1 << ((n - 1).bit_length() + 1)
        padded = pad_graph(sub, bucket_up)
        if one_dispatch:
            _warm_serve(padded, mapping[node])
        elif fused:
            from neural_spectral_codec_tpu.models.gnn import (
                _jitted_fused_encode_apply)
            import jax.numpy as jnp
            _jitted_fused_encode_apply(self.model, self.encoder_config)(
                jnp.asarray(dummy_pts), self.encoder.alpha, self.params,
                self.batch_stats, jnp.asarray(padded.features),
                jnp.asarray(padded.neighbors), jnp.asarray(padded.mask),
                jnp.asarray(padded.edge_feats),
                jnp.int32(mapping[node]))
        else:
            gnn_forward(self.model, self.params, self.batch_stats, padded)

        # stage-1 query executable: compiled against the LIVE database
        # buffers with the effective size forced to 1 — no scratch
        # retriever, so warmup allocates nothing (a scratch copy at the
        # 1M-descriptor capacity would transiently double ~3.2 GB)
        self.retrieval.retriever.warm_query(self.retrieval.top_k)
        logger.info("warmup: serving executables ready in %.1f s",
                    time.perf_counter() - t0)

    def run_online(self, loader, checkpoint_path: Optional[str] = None,
                   loop_closure_interval: int = 10,
                   output_g2o: Optional[str] = None,
                   database_path: Optional[str] = None,
                   resume_database: bool = False,
                   async_loop_closing: Optional[bool] = None) -> List[Dict]:
        """Streaming loop closing (reference pipeline.py:200-282).

        Honors the config's ``monitoring`` block (per-stage timing log
        every N scans + max-latency warnings — the reference configured
        this and never implemented it) and optionally persists the
        descriptor database to ``database_path`` at the end. With
        ``resume_database`` an existing record store at that path is
        loaded first, so a mapping session continues against the previous
        session's places (loaded entries serve stage-1 retrieval; they
        carry no raw points, so candidate pairs against them surface
        unverified).

        ``async_loop_closing`` (default from config key
        ``deployment.async_loop_closing``, off otherwise) moves the
        two-stage query + GICP verification onto a background worker —
        the per-scan hot path never blocks on verification (the standard
        SLAM split: odometry-rate front end, background loop closure).
        Verified edges are harvested into the graph as they complete and
        drained before returning, so the final edge set matches the
        synchronous mode — unless ``max_active_nodes`` is small enough
        that a query keyframe is frozen out of the active window before
        its background query completes; such edges still appear in the
        returned list / g2o export but are counted in
        ``self._n_graph_edge_misses`` and logged instead of being applied
        to the live graph."""
        import jax
        self._n_graph_edge_misses = 0
        db_base = 0
        if (resume_database and database_path
                and Path(database_path).exists()):
            db_base = self.retrieval.load_database(database_path)
            # ids must be globally unique across sessions: restored records
            # keep their original keyframe_ids (0..db_base-1), so the new
            # session numbers from db_base — keyframe_id then equals the db
            # row for every record, resumed or new, and loop-closure edges
            # can never attach to the wrong graph node
            self.selector.keyframe_id_counter = db_base
            logger.info("Resumed descriptor database: %d records from %s",
                        db_base, database_path)
        # crash-safe persistence: every N new keyframes, append their
        # fixed-size records to the store (the format is append-only, so
        # a crash loses at most the tail since the last autosave; a torn
        # final record is dropped on load). 0 = save once at the end.
        autosave_iv = cfg_get(self.config, "database.autosave_interval", 0)
        db_persisted = db_base
        if database_path and autosave_iv:
            file_records = self.retrieval.database_file_records(database_path)
            if db_base != file_records:
                if resume_database and file_records:
                    # capacity-clipped resume: appending would duplicate
                    # the unloaded tail on the next load — rewrite at end
                    logger.warning(
                        "autosave disabled: store has %d records but %d "
                        "were resumed (capacity clip); will rewrite on "
                        "finish", file_records, db_base)
                    autosave_iv = 0
                elif file_records:
                    Path(database_path).unlink()  # fresh session, stale file
        mon = self.config.get("monitoring", {})
        mon_enabled = mon.get("enabled", False)
        mon_interval = mon.get("log_interval", 100)
        max_latency_ms = cfg_get(self.config, "deployment.max_latency_ms",
                                 None)
        if checkpoint_path:
            self.load_checkpoint(checkpoint_path)
        if self.params is None and not self.ablate_gnn:
            logger.warning("Running online with randomly initialized GNN")
            self.params, self.batch_stats = init_gnn(
                self.model, jax.random.key(0))
        if cfg_get(self.config, "deployment.warmup", False):
            self.warmup()
        local_gnn = (None if self.ablate_gnn else
                     LocalUpdateGNN(self.model, self.params,
                                    self.batch_stats,
                                    k_hops=self.local_update_hops))

        if async_loop_closing is None:
            async_loop_closing = cfg_get(
                self.config, "deployment.async_loop_closing", False)
        executor = None
        pending: List = []    # (query keyframe_id, Future[List[Dict]])
        if async_loop_closing:
            from concurrent.futures import ThreadPoolExecutor
            executor = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="loop-closing")

        all_loop_closures: List[Dict] = []
        n_queries = 0

        def _apply_edges(query_id: int, edges: List[Dict]) -> None:
            # NOTE: under async loop closing with a small max_active_nodes,
            # a background query's keyframe can be frozen out of the active
            # window before harvest — the edge then still appears in the
            # returned loop-closure list (and the g2o export) but cannot be
            # inserted into the live GNN graph. Count and surface that
            # instead of dropping it silently.
            n_missed = 0
            for e in edges:
                if not self.graph_manager.add_loop_closure_edge(
                        query_id, e["target_id"]):
                    n_missed += 1
            if n_missed:
                self._n_graph_edge_misses += n_missed
                logger.warning(
                    "query kf %d: %d/%d loop-closure edges not inserted "
                    "into the GNN graph (endpoint frozen out of the "
                    "active window before harvest)", query_id, n_missed,
                    len(edges))
            if edges:
                all_loop_closures.extend(edges)
                logger.info("query kf %d: %d loop closures", query_id,
                            len(edges))

        def _harvest(block: bool = False) -> None:
            remaining = []
            for query_id, fut in pending:
                if block or fut.done():
                    _apply_edges(query_id, fut.result())
                else:
                    remaining.append((query_id, fut))
            pending[:] = remaining

        # fused serving: encode + local-GNN refresh in ONE device
        # dispatch per keyframe (the split path pays a tunnel round trip
        # for each); only meaningful with local updates enabled
        fused = (not self.ablate_gnn) and self.use_local_updates and cfg_get(
            self.config, "deployment.fused_encode", True)
        # one-dispatch serving (deployment.fused_query, default on): the
        # SAME executable additionally inserts the stage-1 database row
        # and, on loop-closing keyframes, runs the stage-1 top-k query —
        # the whole per-keyframe device workload in one dispatch + one
        # fetch; with async loop closing the background worker then does
        # ONLY geometric verification (stage 1 already happened on the
        # hot path's dispatch, against the identical database snapshot)
        one_dispatch = fused and cfg_get(
            self.config, "deployment.fused_query", True)
        placeholder = np.zeros(self.encoder_config.output_dim, np.float32)

        # native read-ahead for offline stream replay (same gating as
        # _process_sequence; live sensor feeds don't go through
        # loaders). frame_source closes the prefetcher on ANY exit.
        from neural_spectral_codec_tpu.data.native_io import frame_source
        with frame_source(loader, self.config) as get_frame:
            for scan_id in range(len(loader)):
                frame = get_frame(scan_id)
                with self.profiler.profile("select"):
                    selected, kf, _ = self.selector.process_scan(
                        scan_id, frame["points"], frame["pose"],
                        frame["timestamp"])
                if not selected:
                    continue
                will_query = (len(self.selector.keyframes)
                              % loop_closure_interval == 0)
                stage1 = None
                fused_inserted = False
                if one_dispatch and self.retrieval.can_fuse_serving():
                    with self.profiler.profile("serve_step"):
                        kf.descriptor = placeholder
                        node = self.graph_manager.add_keyframe(kf)
                        pos = (kf.pose[:3, 3] if kf.pose is not None
                               else None)
                        desc, refreshed_nodes, stage1 = local_gnn.serve_step(
                            self.graph_manager, node,
                            pad_points(kf.points, self.encoder.max_points),
                            self.encoder.alpha, self.encoder_config,
                            self.retrieval, will_query,
                            query_pose_position=pos)
                        kf.descriptor = desc
                        fused_inserted = True
                elif fused:
                    with self.profiler.profile("encode_graph_update"):
                        kf.descriptor = placeholder
                        node = self.graph_manager.add_keyframe(kf)
                        desc, refreshed_nodes = local_gnn.encode_update_local(
                            self.graph_manager, node,
                            pad_points(kf.points, self.encoder.max_points),
                            self.encoder.alpha, self.encoder_config)
                        kf.descriptor = desc
                else:
                    with self.profiler.profile("encode"):
                        kf.descriptor = self.encoder.encode_one(
                            kf.points, ring_ids=frame.get("ring_ids"))
                    with self.profiler.profile("graph_update"):
                        node = self.graph_manager.add_keyframe(kf)
                        refreshed_nodes = []
                        if self.ablate_gnn:
                            # raw-histogram ablation: graph bookkeeping only,
                            # descriptors go to retrieval unenhanced
                            pass
                        elif self.use_local_updates:
                            refreshed_nodes = local_gnn.update_embeddings_local(
                                self.graph_manager, node) or []
                        else:
                            graph = self.graph_manager.get_graph()
                            emb = np.asarray(gnn_forward(
                                self.model, self.params, self.batch_stats,
                                graph))
                            self.graph_manager.update_embeddings(emb)
                            refreshed_nodes = list(range(len(
                                self.graph_manager.keyframes)))
                if (database_path and autosave_iv and
                        len(self.retrieval.keyframes) - db_persisted
                        >= autosave_iv):
                    with self.profiler.profile("db_autosave"):
                        db_persisted = self.retrieval.append_database(
                            database_path, db_persisted)
                with self.profiler.profile("retrieval_add"):
                    if fused_inserted:
                        # row already inserted on device by serve_step
                        self.retrieval.register_fused_insert(kf)
                    else:
                        self.retrieval.add_keyframe(kf)
                    if self.use_embeddings_for_retrieval and refreshed_nodes:
                        # keep already-inserted rows in sync with the GNN's
                        # refreshed embeddings (db row == keyframe_id: the
                        # selector counter starts at db_base when resuming)
                        self.retrieval.refresh_keyframes([
                            self.graph_manager.keyframes[i].keyframe_id
                            for i in refreshed_nodes])

                if will_query:
                    if stage1 is not None:
                        # stage 1 already ran inside the serving dispatch
                        # (same snapshot as the split insert-then-query);
                        # only GICP verification remains
                        cands = self.retrieval.candidates_from_stage1(
                            *stage1)
                        if executor is not None:
                            with self.profiler.profile(
                                    "loop_closing_submit"):
                                pending.append((
                                    kf.keyframe_id, executor.submit(
                                        self.retrieval
                                        .loop_closures_from_candidates,
                                        kf, cands, kf.points)))
                                n_queries += 1
                        else:
                            with self.profiler.profile("loop_closing"):
                                t0 = time.perf_counter()
                                edges = (self.retrieval
                                         .loop_closures_from_candidates(
                                             kf, cands, kf.points))
                                n_queries += 1
                                query_ms = 1e3 * (time.perf_counter() - t0)
                                if (max_latency_ms
                                        and query_ms > max_latency_ms):
                                    logger.warning(
                                        "scan %d: loop-closing latency "
                                        "%.1f ms exceeds budget %.0f ms",
                                        scan_id, query_ms, max_latency_ms)
                                _apply_edges(kf.keyframe_id, edges)
                    elif executor is not None:
                        with self.profiler.profile("loop_closing_submit"):
                            # snapshot the db size so the background query sees
                            # the submit-time database and temporal-exclusion
                            # window, not whatever has been inserted since
                            snapshot = self.retrieval.retriever.database_size
                            pending.append((kf.keyframe_id, executor.submit(
                                self.retrieval.get_loop_closures, kf, kf.points,
                                snapshot)))
                            n_queries += 1
                    else:
                        with self.profiler.profile("loop_closing"):
                            t0 = time.perf_counter()
                            edges = self.retrieval.get_loop_closures(
                                kf, kf.points)
                            n_queries += 1
                            query_ms = 1e3 * (time.perf_counter() - t0)
                            if max_latency_ms and query_ms > max_latency_ms:
                                logger.warning(
                                    "scan %d: loop-closing latency %.1f ms "
                                    "exceeds budget %.0f ms", scan_id, query_ms,
                                    max_latency_ms)
                            _apply_edges(kf.keyframe_id, edges)
                if executor is not None:
                    _harvest()  # fold in finished background queries, no block

                if mon_enabled and (scan_id + 1) % mon_interval == 0:
                    tot = self.profiler.totals
                    cnt = self.profiler.counts
                    mem = ""
                    if "memory_usage" in mon.get("metrics", ()):
                        # reference declares this metric and never
                        # implements it (configs/inference.yaml:72);
                        # device stats exist on TPU, not the CPU backend
                        try:
                            stats = jax.local_devices()[0].memory_stats()
                            if stats and "bytes_in_use" in stats:
                                mem = (f" | mem "
                                       f"{stats['bytes_in_use'] / 2**20:.0f}"
                                       f" MiB")
                        except Exception:
                            pass
                    logger.info(
                        "monitor @%d | %s | db=%d%s", scan_id + 1,
                        " | ".join(
                            f"{k} {1e3 * tot[k] / max(cnt[k], 1):.2f} ms/call"
                            for k in ("select", "encode", "graph_update",
                                      "encode_graph_update", "serve_step",
                                      "db_autosave",
                                      "loop_closing", "loop_closing_submit")
                            if k in tot),
                        self.retrieval.retriever.database_size, mem)
        if executor is not None:
            _harvest(block=True)   # drain in-flight background queries
            executor.shutdown(wait=True)
        if database_path:
            if autosave_iv:
                n = self.retrieval.append_database(database_path,
                                                   db_persisted)
            else:
                n = self.retrieval.save_database(database_path)
            logger.info("Saved %d descriptor records to %s", n, database_path)
        if output_g2o and all_loop_closures:
            save_loop_closures_g2o(all_loop_closures, output_g2o)
            logger.info("Saved %d loop-closure edges to %s",
                        len(all_loop_closures), output_g2o)
        self.profiler.log_summary()
        logger.info("Online run: %d scans, %d keyframes, %d queries, "
                    "%d loop closures", len(loader),
                    len(self.selector.keyframes), n_queries,
                    len(all_loop_closures))
        return all_loop_closures


def _loaders_from_config(config: Dict, split: str) -> List:
    """Instantiate dataset loaders for a config split (kitti/nclt/helipr —
    unlike the reference MultiDatasetLoader, helipr is a first-class
    citizen here; reference multi_dataset_loader.py:79 raises on it)."""
    from neural_spectral_codec_tpu.data.multi_dataset import _make_loader
    out = []
    for ds in cfg_get(config, f"data.datasets.{split}", []) or []:
        for seq in ds.get("sequences", []):
            out.append(_make_loader(ds["type"], ds["root"], str(seq),
                                    ds.get("lazy_load", True)))
    return out


def run_pipeline(config_path: str, mode: str = "train") -> None:
    """CLI entry (reference pipeline.py:393-433)."""
    config = load_config(config_path)
    pipeline = NeuralSpectralCodecPipeline(config)
    if mode == "train":
        pipeline.train_offline(
            _loaders_from_config(config, "train"),
            _loaders_from_config(config, "val"))
    elif mode == "online":
        loaders = _loaders_from_config(config, "test") or \
            _loaders_from_config(config, "val")
        ckpt = cfg_get(config, "model.checkpoint_path")
        # the only supported edge format is g2o (like the reference);
        # any other value disables the export rather than mislabeling it
        fmt = cfg_get(config, "loop_closing.output_format", "g2o")
        out = (cfg_get(config, "loop_closing.output_path",
                       "outputs/loop_closures.g2o")
               if fmt == "g2o" else None)
        if fmt != "g2o":
            logger.warning("loop_closing.output_format=%s not supported; "
                           "edge export disabled (only g2o)", fmt)
        for loader in loaders:
            pipeline.run_online(
                loader, checkpoint_path=ckpt,
                loop_closure_interval=cfg_get(
                    config, "deployment.loop_closing_interval", 10),
                output_g2o=out,
                database_path=cfg_get(config, "database.storage_path"))
    else:
        raise ValueError(f"Unknown mode: {mode}")


def main():
    import argparse
    p = argparse.ArgumentParser(description="Neural Spectral Codec (TPU)")
    p.add_argument("--config", required=True)
    p.add_argument("--mode", default="train", choices=["train", "online"])
    p.add_argument("--platform", default="default",
                   help="Force the jax platform (e.g. 'cpu') — env vars "
                        "alone cannot override plugin-registered backends "
                        "(utils/platform.py)")
    args = p.parse_args()
    from neural_spectral_codec_tpu.utils.platform import force_platform
    force_platform(args.platform)
    from neural_spectral_codec_tpu.utils.logging_setup import setup_logging
    setup_logging()
    run_pipeline(args.config, args.mode)


if __name__ == "__main__":
    main()
