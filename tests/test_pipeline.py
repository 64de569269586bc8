"""End-to-end pipeline: offline training and online loop closing on the
synthetic world (parametric loop trajectory with known revisits), plus the
train_multi_dataset CLI. This is the integration test the reference never
had (SURVEY §4)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from neural_spectral_codec_tpu.data.synthetic import SyntheticLoader
from neural_spectral_codec_tpu.pipeline import (
    BatchEncoder, NeuralSpectralCodecPipeline)
from neural_spectral_codec_tpu.utils.config import load_config

CONFIGS = Path(__file__).resolve().parent.parent / "configs"


def small_config(tmp_path, **overrides):
    cfg = load_config(str(CONFIGS / "training.yaml"))
    cfg["encoding"].update({"n_elevation": 16, "n_azimuth": 90, "n_bins": 20,
                            "target_elevation_bins": 8, "max_points": 8192})
    cfg["gnn"].update({"input_dim": 160, "hidden_dim": 32, "output_dim": 160})
    cfg["keyframe"].update({"distance_threshold": 2.0})
    cfg["training"].update({"n_epochs": 2, "triplets_per_step": 256})
    cfg["system"]["checkpoint_dir"] = str(tmp_path / "ckpt")
    cfg["retrieval"]["database_capacity"] = 2000
    for k, v in overrides.items():
        cfg[k].update(v)
    return cfg


def test_batch_encoder_chunking(rng):
    from neural_spectral_codec_tpu.ops.spectral import SpectralEncoderConfig
    cfg = SpectralEncoderConfig(n_elevation=16, n_azimuth=90, n_bins=20,
                                target_elevation_bins=8)
    enc = BatchEncoder(cfg, max_points=4096, batch_size=4)
    clouds = [rng.random((1000 + 100 * i, 4)).astype(np.float32) * 40
              for i in range(7)]  # 2 chunks, second partial
    d = enc.encode(clouds)
    assert d.shape == (7, cfg.output_dim)
    np.testing.assert_allclose(d.sum(axis=1), 1.0, atol=1e-4)
    one = enc.encode_one(clouds[3])
    np.testing.assert_allclose(one, d[3], atol=1e-6)


def test_pipeline_train_offline(tmp_path):
    cfg = small_config(tmp_path)
    pipe = NeuralSpectralCodecPipeline(cfg)
    train = SyntheticLoader(n_frames=120, seed=0, n_points=4096)
    val = SyntheticLoader(n_frames=60, seed=1, n_points=4096)
    trainer = pipe.train_offline([train], [val], n_epochs=2)
    assert len(trainer.train_losses) == 2
    assert (tmp_path / "ckpt" / "final_model").exists()
    assert pipe.params is not None


def test_pipeline_online_produces_loop_closures(tmp_path):
    # The reference-semantics spatial filter excludes candidates whose
    # (estimated) pose is within 50 m of the query — with ground-truth
    # poses that excludes true revisits, so disable it and shrink ICP
    # budgets: this test exercises the full online plumbing, retrieval
    # QUALITY is covered by the recall tests.
    cfg = small_config(tmp_path, retrieval={
        "spatial_filter_distance": 0.0, "top_k": 3,
        # cap >= cloud size: subsampling sparse 4096-pt synthetic scans
        # inflates ICP rmse past the accept gate
        "icp_max_iterations": 10, "verification_max_points": 4096})
    pipe = NeuralSpectralCodecPipeline(cfg)
    loader = SyntheticLoader(n_frames=100, seed=0, n_points=4096, loops=2.0)
    g2o_path = tmp_path / "loops.g2o"
    edges = pipe.run_online(loader, loop_closure_interval=10,
                            output_g2o=str(g2o_path))
    # the second lap must produce verified loop closures
    assert len(edges) > 0
    assert g2o_path.exists()
    text = g2o_path.read_text()
    assert "EDGE_SE3:QUAT" in text
    for e in edges:
        assert e["fitness"] >= cfg["retrieval"]["icp_fitness_threshold"]
        assert e["rmse"] <= cfg["retrieval"]["icp_rmse_threshold"]


def test_pipeline_online_async_matches_sync(tmp_path):
    """Background loop closing finds the same verified edges as the
    synchronous mode (they run the identical query chain; async only
    moves it off the per-scan hot path and drains before returning)."""
    opts = {"spatial_filter_distance": 0.0, "top_k": 3,
            "icp_max_iterations": 10, "verification_max_points": 4096}
    loader = SyntheticLoader(n_frames=100, seed=0, n_points=4096, loops=2.0)

    sync_pipe = NeuralSpectralCodecPipeline(
        small_config(tmp_path, retrieval=opts))
    sync_edges = sync_pipe.run_online(loader, loop_closure_interval=10)

    async_pipe = NeuralSpectralCodecPipeline(
        small_config(tmp_path, retrieval=opts))
    async_edges = async_pipe.run_online(loader, loop_closure_interval=10,
                                        async_loop_closing=True)
    assert len(sync_edges) > 0
    key = lambda e: (e["source_id"], e["target_id"])
    assert sorted(map(key, async_edges)) == sorted(map(key, sync_edges))


def test_pipeline_one_dispatch_serving_matches_split(tmp_path):
    """The one-dispatch serving step (encode + GNN + db insert + stage-1
    query in one executable, deployment.fused_query) must reproduce the
    split path's loop closures, database contents, and descriptors."""
    opts = {"spatial_filter_distance": 0.0, "top_k": 3,
            "icp_max_iterations": 10, "verification_max_points": 4096}
    loader = SyntheticLoader(n_frames=100, seed=0, n_points=4096, loops=2.0)

    fused_pipe = NeuralSpectralCodecPipeline(
        small_config(tmp_path, retrieval=opts))
    fused_edges = fused_pipe.run_online(loader, loop_closure_interval=10)

    split_cfg = small_config(tmp_path, retrieval=opts)
    split_cfg.setdefault("deployment", {})["fused_query"] = False
    split_pipe = NeuralSpectralCodecPipeline(split_cfg)
    split_edges = split_pipe.run_online(loader, loop_closure_interval=10)

    assert len(fused_edges) > 0
    key = lambda e: (e["source_id"], e["target_id"])
    assert sorted(map(key, fused_edges)) == sorted(map(key, split_edges))

    fr = fused_pipe.retrieval.retriever
    sr = split_pipe.retrieval.retriever
    assert fr.database_size == sr.database_size > 0
    n = fr.database_size
    np.testing.assert_allclose(np.asarray(fr._db_cdf[:n]),
                               np.asarray(sr._db_cdf[:n]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fr._db_pos[:n]),
                               np.asarray(sr._db_pos[:n]), atol=0)
    for a, b in zip(fused_pipe.retrieval.keyframes,
                    split_pipe.retrieval.keyframes):
        np.testing.assert_allclose(a.descriptor, b.descriptor,
                                   rtol=0, atol=1e-7)


def test_pipeline_one_dispatch_async_matches_sync(tmp_path):
    """One-dispatch serving under async loop closing: stage 1 runs on the
    hot path's dispatch, only verification goes to the background — the
    edge set must match the synchronous one-dispatch mode."""
    opts = {"spatial_filter_distance": 0.0, "top_k": 3,
            "icp_max_iterations": 10, "verification_max_points": 4096}
    loader = SyntheticLoader(n_frames=100, seed=0, n_points=4096, loops=2.0)

    sync_pipe = NeuralSpectralCodecPipeline(
        small_config(tmp_path, retrieval=opts))
    sync_edges = sync_pipe.run_online(loader, loop_closure_interval=10)

    async_pipe = NeuralSpectralCodecPipeline(
        small_config(tmp_path, retrieval=opts))
    async_edges = async_pipe.run_online(loader, loop_closure_interval=10,
                                        async_loop_closing=True)
    assert len(sync_edges) > 0
    key = lambda e: (e["source_id"], e["target_id"])
    assert sorted(map(key, async_edges)) == sorted(map(key, sync_edges))


def test_pipeline_online_survives_buffer_compaction(tmp_path):
    """A long online session must run the graph manager's ring buffer
    through its compaction/rebase boundary (initial capacity 64 rows) —
    regression for the off-by-one that crashed every session at
    capacity. Small window so freezes and compaction both trigger."""
    cfg = small_config(tmp_path, keyframe={"distance_threshold": 2.0,
                                           "max_active_nodes": 12},
                       retrieval={"spatial_filter_distance": 0.0,
                                  "top_k": 2, "icp_max_iterations": 3})
    pipe = NeuralSpectralCodecPipeline(cfg)
    loader = SyntheticLoader(n_frames=120, seed=0, n_points=2048, loops=2.0)
    pipe.run_online(loader, loop_closure_interval=20)
    assert len(pipe.selector.keyframes) > 64     # crossed the boundary
    assert len(pipe.graph_manager.keyframes) == 12
    assert len(pipe.graph_manager.frozen_keyframes) > 50


def test_pipeline_warmup_precompiles(tmp_path):
    """warmup() pre-compiles serving executables without touching the
    live database/graph, and the online loop still works after it."""
    cfg = small_config(tmp_path, retrieval={
        "spatial_filter_distance": 0.0, "top_k": 3,
        "icp_max_iterations": 5, "verification_max_points": 4096})
    pipe = NeuralSpectralCodecPipeline(cfg)
    pipe.warmup()
    assert pipe.retrieval.retriever.database_size == 0   # untouched
    assert len(pipe.graph_manager.keyframes) == 0
    loader = SyntheticLoader(n_frames=30, seed=0, n_points=4096, loops=2.0)
    pipe.run_online(loader, loop_closure_interval=10)
    assert len(pipe.selector.keyframes) > 0


def test_checkpoint_roundtrip_through_pipeline(tmp_path):
    cfg = small_config(tmp_path)
    pipe = NeuralSpectralCodecPipeline(cfg)
    train = SyntheticLoader(n_frames=100, seed=0, n_points=4096)
    pipe.train_offline([train], [], n_epochs=1)

    pipe2 = NeuralSpectralCodecPipeline(small_config(tmp_path))
    pipe2.load_checkpoint(str(tmp_path / "ckpt" / "final_model"))
    import jax
    for a, b in zip(jax.tree.leaves(pipe.params),
                    jax.tree.leaves(pipe2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_multi_dataset_cli(tmp_path, monkeypatch):
    import yaml
    cfg = small_config(tmp_path)
    cfg_file = tmp_path / "cfg.yaml"
    cfg_file.write_text(yaml.safe_dump(cfg))
    import train_multi_dataset
    trainer = train_multi_dataset.main([
        "--config", str(cfg_file),
        "--checkpoint-dir", str(tmp_path / "cli_ckpt"),
        "--epochs", "1",
        "--synthetic", "80",
    ])
    assert trainer.epoch == 0
    assert (tmp_path / "cli_ckpt" / "final_model").exists()


def test_online_monitoring_and_database_persistence(tmp_path, caplog):
    import logging
    cfg = small_config(tmp_path, retrieval={
        "spatial_filter_distance": 0.0, "top_k": 2,
        "icp_max_iterations": 5, "verification_max_points": 512})
    cfg["monitoring"] = {"enabled": True, "log_interval": 20}
    cfg["deployment"] = {"max_latency_ms": 0.001}  # force budget warnings
    pipe = NeuralSpectralCodecPipeline(cfg)
    loader = SyntheticLoader(n_frames=40, seed=0, n_points=4096, loops=2.0)
    db_path = tmp_path / "descriptors.bin"
    with caplog.at_level(logging.INFO,
                         logger="neural_spectral_codec_tpu.pipeline"):
        pipe.run_online(loader, loop_closure_interval=10,
                        database_path=str(db_path))
    text = caplog.text
    assert "monitor @" in text          # monitoring block fired
    assert "exceeds" in text            # latency budget warning fired
    assert db_path.exists()

    # reload the persisted database into a fresh retrieval system
    from neural_spectral_codec_tpu.retrieval.two_stage import TwoStageRetrieval
    r2 = TwoStageRetrieval(n_bins=pipe.encoder_config.output_dim,
                           capacity=100)
    n = r2.load_database(str(db_path))
    assert n == len(pipe.selector.keyframes) and n > 0


def test_online_with_embedding_retrieval(tmp_path):
    """retrieval.use_embeddings routes stage 1 through GNN embeddings
    (L2) and keeps rows in sync with local-update refreshes."""
    cfg = small_config(tmp_path, retrieval={
        "use_embeddings": True, "spatial_filter_distance": 0.0,
        "top_k": 2, "context_window": 3,
        "icp_max_iterations": 5, "verification_max_points": 512})
    pipe = NeuralSpectralCodecPipeline(cfg)
    assert pipe.retrieval.stage1_metric == "l2"
    loader = SyntheticLoader(n_frames=60, seed=0, n_points=4096, loops=2.0)
    edges = pipe.run_online(loader, loop_closure_interval=10)
    # machinery runs end-to-end; revisit edges verified geometrically
    for e in edges:
        assert e["fitness"] >= cfg["retrieval"]["icp_fitness_threshold"]
    # database rows are embeddings, not descriptors
    assert pipe.retrieval.keyframes[0].embedding is not None


def _make_kitti_world(root, seq, n_frames=60, seed=0):
    """Fake KITTI tree whose scans come from the synthetic world (so
    revisits are real): sequences/<seq>/velodyne/*.bin + poses.txt."""
    from neural_spectral_codec_tpu.data.synthetic import (
        SyntheticWorld, loop_trajectory)
    d = root / "sequences" / seq / "velodyne"
    d.mkdir(parents=True)
    world = SyntheticWorld(seed=seed)
    poses = loop_trajectory(n_frames, radius=80.0, loops=2.0)
    rng = np.random.default_rng(seed)
    rows = []
    for i, T in enumerate(poses):
        pts = world.scan(T, n_points=4096, rng=rng)
        pts.astype(np.float32).tofile(d / f"{i:06d}.bin")
        rows.append(" ".join(str(v) for v in T[:3].reshape(-1)))
    (root / "sequences" / seq / "poses.txt").write_text("\n".join(rows))


def test_train_cli_through_real_kitti_loader(tmp_path):
    """End-to-end through the REAL dataset path: on-disk KITTI-format
    files -> config data.datasets -> _loaders_from_config -> KITTILoader
    -> pipeline training. (All other CLI tests use --synthetic.)"""
    import yaml
    root = tmp_path / "kitti"
    _make_kitti_world(root, "00", n_frames=50)
    _make_kitti_world(root, "09", n_frames=30, seed=1)

    cfg = small_config(tmp_path)
    cfg["training"]["n_epochs"] = 1
    # keyframes on this loop sit ~9.4 m apart, so revisits are ~25
    # keyframes away and the 10-80 m negative ring spans ~1-9 keyframes:
    # default 30-frame temporal gaps would mine nothing
    cfg["triplet"].update({"positive_temporal_min": 8,
                           "negative_temporal_min": 8,
                           "negative_distance_max": 80.0})
    cfg["data"] = {"datasets": {
        "train": [{"type": "kitti", "root": str(root), "sequences": ["00"]}],
        "val": [{"type": "kitti", "root": str(root), "sequences": ["09"]}],
    }}
    cfg_file = tmp_path / "kitti_cfg.yaml"
    cfg_file.write_text(yaml.safe_dump(cfg))

    import train_multi_dataset
    trainer = train_multi_dataset.main([
        "--config", str(cfg_file),
        "--checkpoint-dir", str(tmp_path / "kitti_ckpt"),
    ])
    assert (tmp_path / "kitti_ckpt" / "final_model").exists()
    assert len(trainer.train_losses) == 1


def test_online_resume_database_across_sessions(tmp_path):
    """Two mapping sessions over the same world: session 2 resumes
    session 1's persisted descriptor database and retrieves session-1
    places (stage 1; loaded entries carry no points so those candidate
    pairs surface unverified rather than crashing)."""
    cfg = small_config(tmp_path, retrieval={
        "spatial_filter_distance": 0.0, "top_k": 3,
        "icp_max_iterations": 5, "verification_max_points": 4096})
    db = tmp_path / "map.bin"

    pipe1 = NeuralSpectralCodecPipeline(cfg)
    pipe1.run_online(SyntheticLoader(n_frames=40, seed=0, n_points=4096,
                                     loops=1.0),
                     loop_closure_interval=10, database_path=str(db))
    n1 = len(pipe1.selector.keyframes)
    assert db.exists() and n1 > 0

    pipe2 = NeuralSpectralCodecPipeline(small_config(tmp_path, retrieval={
        "spatial_filter_distance": 0.0, "top_k": 3,
        "icp_max_iterations": 5, "verification_max_points": 4096}))
    pipe2.run_online(SyntheticLoader(n_frames=30, seed=0, n_points=4096,
                                     loops=1.0),
                     loop_closure_interval=10, database_path=str(db),
                     resume_database=True)
    # database grew: previous session's records + this session's keyframes
    assert pipe2.retrieval.retriever.database_size == \
        n1 + len(pipe2.selector.keyframes)
    # stage-1 query against a loaded (point-free) keyframe must not crash
    kf = pipe2.selector.keyframes[-1]
    cands = pipe2.retrieval.query(kf, verify=True)
    assert isinstance(cands, list)


def test_online_survives_pathological_scans(tmp_path):
    """Empty, all-NaN, single-point, and huge-coordinate scans must flow
    through selection, encoding (uniform-fallback descriptor), the graph,
    and retrieval without crashing."""
    cfg = small_config(tmp_path, retrieval={
        "spatial_filter_distance": 0.0, "top_k": 2,
        "icp_max_iterations": 3, "verification_max_points": 512})

    base = SyntheticLoader(n_frames=12, seed=0, n_points=2048, loops=1.0)

    class Pathological:
        def __len__(self):
            return 12

        def __getitem__(self, i):
            item = base[i]
            if i == 3:
                item["points"] = np.zeros((0, 4), np.float32)
            elif i == 5:
                item["points"] = np.full((100, 4), np.nan, np.float32)
            elif i == 7:
                item["points"] = np.array([[5.0, 0, 0, 1]], np.float32)
            elif i == 9:
                item["points"] = np.full((50, 4), 1e12, np.float32)
            return item

    pipe = NeuralSpectralCodecPipeline(cfg)
    edges = pipe.run_online(Pathological(), loop_closure_interval=4)
    assert isinstance(edges, list)
    assert len(pipe.selector.keyframes) > 0
    for kf in pipe.selector.keyframes:
        assert np.isfinite(kf.descriptor).all()
        np.testing.assert_allclose(kf.descriptor.sum(), 1.0, atol=1e-4)


def test_ring_major_encoder_matches_general(tmp_path):
    """encoding.ring_major routes scans through the ring fast path with
    descriptors identical to the default encoder's."""
    import numpy as np
    from neural_spectral_codec_tpu.ops.ring_path import (
        make_structured_ring_scans)
    from neural_spectral_codec_tpu.pipeline import (
        BatchEncoder, RingMajorBatchEncoder)
    from neural_spectral_codec_tpu.ops.spectral import SpectralEncoderConfig

    cfg = SpectralEncoderConfig(use_pallas=False)
    scans = make_structured_ring_scans(3, 16, 200, cfg.projection, seed=21,
                                       dropout=0.1)
    clouds = []
    for s in scans:
        flat = s.reshape(-1, 4)
        clouds.append(flat[~np.all(np.isnan(flat), axis=1)])
    base = BatchEncoder(cfg, max_points=8192)
    ring = RingMajorBatchEncoder(cfg, max_points=8192)
    d_base = base.encode(clouds)
    d_ring = ring.encode(clouds)
    np.testing.assert_array_equal(d_ring, d_base)
    # arbitrary-order cloud: exact fallback
    rng = np.random.default_rng(0)
    shuf = clouds[0][rng.permutation(len(clouds[0]))]
    np.testing.assert_array_equal(ring.encode_one(shuf),
                                  base.encode_one(shuf))


def test_ring_major_batched_encode_mixed_and_truncation():
    """Round-4: RingMajorBatchEncoder.encode stacks contract-passing
    scans into fixed-shape RING_B device batches. The batched outputs
    must equal encode_one's exactly, a mixed list (ring-structured +
    shuffled-fallback + differing geometries) must route each scan
    correctly, and clouds above max_points must be truncated exactly
    like the base encoder (advisor round-3 low finding)."""
    import numpy as np
    from neural_spectral_codec_tpu.ops.ring_path import (
        make_structured_ring_scans)
    from neural_spectral_codec_tpu.pipeline import (
        BatchEncoder, RingMajorBatchEncoder)
    from neural_spectral_codec_tpu.ops.spectral import SpectralEncoderConfig

    cfg = SpectralEncoderConfig(use_pallas=False)
    rng = np.random.default_rng(3)
    clouds = []
    # 10 scans of one geometry (16 rings) -> one group, two RING_B chunks
    for s in make_structured_ring_scans(10, 16, 200, cfg.projection,
                                        seed=30, dropout=0.1):
        flat = s.reshape(-1, 4)
        clouds.append(flat[~np.all(np.isnan(flat), axis=1)])
    # a second geometry (8 rings, different per-ring count) -> own group
    for s in make_structured_ring_scans(2, 8, 300, cfg.projection,
                                        seed=31, dropout=0.0):
        clouds.append(s.reshape(-1, 4))
    # two shuffled clouds -> general-path fallback
    for i in (0, 3):
        clouds.append(clouds[i][rng.permutation(len(clouds[i]))])
    order = rng.permutation(len(clouds))
    clouds = [clouds[i] for i in order]

    ring = RingMajorBatchEncoder(cfg, max_points=8192)
    d_batch = ring.encode(clouds)
    d_one = np.stack([ring.encode_one(c) for c in clouds])
    np.testing.assert_array_equal(d_batch, d_one)

    # truncation parity: a cloud above max_points must match the base
    # encoder's pad_points truncation semantics
    small = RingMajorBatchEncoder(cfg, max_points=1024)
    base = BatchEncoder(cfg, max_points=1024)
    big = clouds[0]
    assert len(big) > 1024
    np.testing.assert_array_equal(small.encode_one(big),
                                  base.encode_one(big))
    np.testing.assert_array_equal(small.encode([big])[0],
                                  base.encode_one(big))


def test_pipeline_honors_ring_major_config():
    from neural_spectral_codec_tpu.pipeline import (
        NeuralSpectralCodecPipeline, RingMajorBatchEncoder)
    pipe = NeuralSpectralCodecPipeline(
        {"encoding": {"ring_major": True}})
    assert isinstance(pipe.encoder, RingMajorBatchEncoder)


def test_pipeline_quantized_storage_config(tmp_path):
    """retrieval.storage flows from the config into the stage-1 database;
    incompatible metric (use_embeddings -> L2) falls back to float32 with
    a warning instead of crashing."""
    cfg = small_config(tmp_path, retrieval={"storage": "uint16"})
    pipe = NeuralSpectralCodecPipeline(cfg)
    assert pipe.retrieval.retriever.storage == "uint16"
    assert pipe.retrieval.retriever._db_cdf.dtype == np.uint16

    cfg2 = small_config(tmp_path, retrieval={"storage": "uint16",
                                             "use_embeddings": True})
    pipe2 = NeuralSpectralCodecPipeline(cfg2)
    assert pipe2.retrieval.retriever.storage == "float32"


def test_database_autosave_matches_final_save(tmp_path):
    """Incremental autosave produces the byte-identical store that the
    single end-of-run save writes (records are deterministic)."""
    opts = {"spatial_filter_distance": 0.0, "top_k": 3,
            "icp_max_iterations": 5, "verification_max_points": 4096}
    paths = []
    for interval in (0, 3):
        cfg = small_config(tmp_path / f"iv{interval}", retrieval=dict(opts))
        cfg.setdefault("database", {})["autosave_interval"] = interval
        pipe = NeuralSpectralCodecPipeline(cfg)
        db = tmp_path / f"map_iv{interval}.bin"
        pipe.run_online(SyntheticLoader(n_frames=40, seed=0, n_points=4096,
                                        loops=1.0),
                        loop_closure_interval=10, database_path=str(db))
        paths.append(db)
    assert paths[0].read_bytes() == paths[1].read_bytes()


def test_database_autosave_survives_crash(tmp_path):
    """A crash mid-run leaves a loadable store with every record up to
    the last autosave; a fresh session resumes from it."""
    opts = {"spatial_filter_distance": 0.0, "top_k": 3,
            "icp_max_iterations": 5, "verification_max_points": 4096}

    class CrashingLoader(SyntheticLoader):
        def __getitem__(self, idx):
            if idx == 30:
                raise RuntimeError("sensor died")
            return super().__getitem__(idx)

    cfg = small_config(tmp_path, retrieval=dict(opts))
    cfg.setdefault("database", {})["autosave_interval"] = 2
    cfg["keyframe"]["distance_threshold"] = 1.0
    pipe = NeuralSpectralCodecPipeline(cfg)
    db = tmp_path / "map.bin"
    with pytest.raises(RuntimeError, match="sensor died"):
        pipe.run_online(CrashingLoader(n_frames=40, seed=0, n_points=4096,
                                       loops=1.0),
                        loop_closure_interval=10, database_path=str(db))
    n_file = pipe.retrieval.database_file_records(str(db))
    n_selected = len(pipe.selector.keyframes)
    assert 0 < n_file <= n_selected
    assert n_file >= n_selected - 2  # at most one interval's tail lost

    pipe2 = NeuralSpectralCodecPipeline(small_config(
        tmp_path / "resume", retrieval=dict(opts)))
    pipe2.run_online(SyntheticLoader(n_frames=10, seed=0, n_points=4096,
                                     loops=1.0),
                     loop_closure_interval=10, database_path=str(db),
                     resume_database=True)
    assert pipe2.retrieval.retriever.database_size >= n_file


def test_ring_encoder_uses_explicit_helipr_ring_ids():
    """A firing-interleaved VLP-16 stream (ring cycling per point, the
    HeLiPR on-disk order) reaches the ring fast path ONLY via explicit
    ring ids — elevation-order inference cannot segment it — and the
    result stays exactly the general path's."""
    from neural_spectral_codec_tpu.ops.range_image import pad_points
    from neural_spectral_codec_tpu.ops.ring_path import (
        infer_ring_ids_from_sweep, prepare_structured)
    from neural_spectral_codec_tpu.ops.spectral import (
        SpectralEncoderConfig, encode_points_batch)
    from neural_spectral_codec_tpu.pipeline import RingMajorBatchEncoder
    import jax.numpy as jnp

    cfg = SpectralEncoderConfig(n_elevation=16, n_azimuth=360, n_bins=20,
                                target_elevation_bins=8,
                                elevation_range_deg=(-15.0, 15.0))
    rng = np.random.default_rng(6)
    R, P = 16, 256
    # firing-interleaved: point order is (azimuth step, ring) — each
    # consecutive point jumps to the next ring's elevation
    el = np.radians(-15.0 + (np.arange(R) + 0.5) * 30.0 / R)
    az0 = rng.uniform(0, 2 * np.pi)
    az = az0 + np.arange(P) / P * 2 * np.pi
    AZ, EL = np.meshgrid(az, el, indexing="ij")      # (P, R): azimuth-major
    r = rng.uniform(2.0, 70.0, (P, R))
    pts = np.stack([r * np.cos(EL) * np.cos(AZ),
                    r * np.cos(EL) * np.sin(AZ),
                    r * np.sin(EL),
                    rng.uniform(0, 1, (P, R))], -1).astype(np.float32)
    flat = pts.reshape(-1, 4)
    ring_ids = np.tile(np.arange(R), P)

    # inference CANNOT recover rings from this order...
    assert prepare_structured(flat, infer_ring_ids_from_sweep(flat),
                              cfg) is None
    # ...explicit ids CAN
    assert prepare_structured(flat, ring_ids, cfg) is not None

    enc = RingMajorBatchEncoder(cfg, max_points=8192, batch_size=4)
    got = enc.encode([flat], ring_ids=[ring_ids])
    got1 = enc.encode_one(flat, ring_ids=ring_ids)
    # without explicit ids the encoder recovers rings by elevation
    # clustering (infer_ring_ids_by_elevation) and still hits the fast path
    got2 = enc.encode_one(flat)
    want = np.asarray(encode_points_batch(
        jnp.asarray(pad_points(flat, 8192)[None]), jnp.float32(2.0), cfg))[0]
    # same-batch-shape comparison is bit-exact; the RING_B=8 executable
    # tiles the spectral matmuls differently from this B=1 reference
    # (~1 ulp reduction-order noise)
    np.testing.assert_allclose(got[0], want, atol=1e-8)
    np.testing.assert_array_equal(got1, want)
    np.testing.assert_array_equal(got2, want)
