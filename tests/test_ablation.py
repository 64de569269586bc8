"""Ablation-study flags: the reference declares `ablation:` in its
training config (reference configs/training.yaml:89-93) but no reference
code reads it; here each flag actually ablates the subsystem."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from test_pipeline import small_config

from neural_spectral_codec_tpu.data.synthetic import SyntheticLoader
from neural_spectral_codec_tpu.pipeline import NeuralSpectralCodecPipeline


def test_disable_gnn_online_runs_raw(tmp_path):
    cfg = small_config(tmp_path, retrieval={
        "spatial_filter_distance": 0.0, "top_k": 3,
        "icp_max_iterations": 10, "verification_max_points": 4096})
    cfg["ablation"] = {"disable_gnn": True}
    pipe = NeuralSpectralCodecPipeline(cfg)
    loader = SyntheticLoader(n_frames=60, seed=0, n_points=4096, loops=2.0)
    edges = pipe.run_online(loader, loop_closure_interval=10)
    assert pipe.params is None          # no GNN was ever initialized
    assert len(pipe.selector.keyframes) > 0
    # raw descriptors attached and retrievable; second lap closes loops
    assert len(edges) > 0
    # the descriptors are the encoder's, untouched by any GNN
    kf = pipe.selector.keyframes[0]
    want = pipe.encoder.encode_one(kf.points)
    np.testing.assert_allclose(kf.descriptor, want, atol=1e-6)


def test_disable_gnn_refuses_offline_training(tmp_path):
    cfg = small_config(tmp_path)
    cfg["ablation"] = {"disable_gnn": True}
    pipe = NeuralSpectralCodecPipeline(cfg)
    loader = SyntheticLoader(n_frames=20, seed=0, n_points=4096)
    with pytest.raises(ValueError, match="disable_gnn"):
        pipe.train_offline([loader])


def test_disable_gnn_forces_raw_retrieval(tmp_path):
    cfg = small_config(tmp_path, retrieval={"use_embeddings": True})
    cfg["ablation"] = {"disable_gnn": True}
    pipe = NeuralSpectralCodecPipeline(cfg)
    assert not pipe.use_embeddings_for_retrieval
    assert pipe.retrieval.stage1_metric == "wasserstein"


def test_disable_temporal_edges_trains_on_edgeless_graph(tmp_path):
    cfg = small_config(tmp_path)
    cfg["training"]["n_epochs"] = 1
    cfg["ablation"] = {"disable_temporal_edges": True}
    pipe = NeuralSpectralCodecPipeline(cfg)
    assert pipe.temporal_neighbors == 0
    loader = SyntheticLoader(n_frames=40, seed=0, n_points=4096, loops=2.0)
    pipe.train_offline([loader], val_loaders=[
        SyntheticLoader(n_frames=30, seed=1, n_points=4096, loops=2.0)])
    # the trained graph really had no temporal edges
    from neural_spectral_codec_tpu.keyframe.graph import (
        build_graph_from_keyframes)
    g = build_graph_from_keyframes(pipe.selector.keyframes,
                                   temporal_neighbors=0)
    assert float(np.asarray(g.mask).sum()) == 0.0


def test_disable_context_drops_exclusion_window(tmp_path):
    cfg = small_config(tmp_path, retrieval={"context_window": 7})
    pipe = NeuralSpectralCodecPipeline(cfg)
    assert pipe.retrieval.context_window == 7
    cfg2 = small_config(tmp_path, retrieval={"context_window": 7})
    cfg2["ablation"] = {"disable_context": True}
    pipe2 = NeuralSpectralCodecPipeline(cfg2)
    assert pipe2.retrieval.context_window == 0


def test_benchmark_disable_gnn_ignores_checkpoint(tmp_path, monkeypatch):
    """run_benchmark must honor ablation.disable_gnn even when a
    checkpoint populates params (regression: the GNN gate used to be
    `params is not None`, silently reporting GNN recall as the raw
    ablation result)."""
    import jax

    from neural_spectral_codec_tpu.evaluation import run_benchmark
    from neural_spectral_codec_tpu.models.gnn import init_gnn

    cfg = small_config(tmp_path)
    cfg["ablation"] = {"disable_gnn": True}
    cfg["validation"] = {"recall_distance_threshold": 5.0, "skip_frames": 10}

    def fake_load(self, path):
        # a random-weight GNN: if the benchmark used it, recall changes
        self.params, self.batch_stats = init_gnn(self.model,
                                                 jax.random.key(7))

    monkeypatch.setattr(NeuralSpectralCodecPipeline, "load_checkpoint",
                        fake_load)
    loaders = lambda: [SyntheticLoader(n_frames=60, seed=0, n_points=4096,
                                       loops=2.0)]
    with_ckpt = run_benchmark(loaders(), cfg, checkpoint_path="dummy")
    without = run_benchmark(loaders(), cfg)
    assert with_ckpt["mean"] == without["mean"]
