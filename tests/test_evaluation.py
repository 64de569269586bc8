"""Evaluation harness: metrics, self-checks, full benchmark run."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from neural_spectral_codec_tpu.evaluation import (
    evaluate_place_recognition, quantization_error_stats,
    rotation_invariance_check, run_benchmark)
from neural_spectral_codec_tpu.ops.spectral import SpectralEncoderConfig


def _poses_line(n, spacing=1.0):
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    poses[:, 0, 3] = np.arange(n) * spacing
    return poses


def test_place_recognition_perfect_embeddings():
    """Revisit frames share embeddings with their earlier twins -> R@1=1."""
    n = 80
    poses = _poses_line(n)
    # frames 40..79 revisit positions of 0..39
    poses[40:, 0, 3] = poses[:40, 0, 3]
    emb = np.random.default_rng(0).random((40, 16)).astype(np.float32)
    emb = np.concatenate([emb, emb])  # revisits identical
    m = evaluate_place_recognition(emb, poses, (1, 5), skip_frames=30,
                                   distance_threshold=2.0)
    assert m["n_queries"] > 0
    assert m["recall@1"] == 1.0
    assert m["precision@1"] == 1.0
    assert m["f1@1"] == 1.0


def test_place_recognition_threshold_curve():
    """Thresholded precision/recall/F1: perfect embeddings reach F1=1 at
    some τ; recall is non-decreasing in τ; the accept-everything endpoint
    matches the rank-1 accuracy."""
    n = 80
    poses = _poses_line(n)
    poses[40:, 0, 3] = poses[:40, 0, 3]
    emb = np.random.default_rng(0).random((40, 16)).astype(np.float32)
    emb = np.concatenate([emb, emb])
    m = evaluate_place_recognition(emb, poses, (1,), skip_frames=30,
                                   distance_threshold=2.0)
    c = m["precision_recall_curve"]
    assert m["best_f1"] == 1.0
    assert np.all(np.diff(c["recall"]) >= -1e-12)
    assert c["precision"][-1] == m["precision@1"]
    assert c["recall"][-1] == m["recall@1"]

    # random embeddings: a strict τ accepts few, so thresholded precision
    # is defined by the accept set, and the curve is emitted with finite
    # entries except the accept-everything endpoint
    emb2 = np.random.default_rng(1).random((n, 16)).astype(np.float32)
    m2 = evaluate_place_recognition(emb2, poses, (1,), skip_frames=30,
                                    distance_threshold=2.0)
    c2 = m2["precision_recall_curve"]
    assert len(c2["tau"]) >= 3
    assert all(0.0 <= p <= 1.0 for p in c2["precision"])
    assert m2["best_f1"] >= m2["f1@1"] - 1e-12


def test_place_recognition_random_embeddings_low_recall():
    n = 80
    poses = _poses_line(n, spacing=20.0)
    poses[40:, 0, 3] = poses[:40, 0, 3]
    emb = np.random.default_rng(0).random((n, 16)).astype(np.float32)
    m = evaluate_place_recognition(emb, poses, (1,), skip_frames=30,
                                   distance_threshold=2.0)
    assert m["recall@1"] < 0.5


def test_place_recognition_no_queries():
    poses = _poses_line(10, spacing=100.0)
    emb = np.zeros((10, 4), np.float32)
    m = evaluate_place_recognition(emb, poses, (1,))
    assert m["n_queries"] == 0 and m["recall@1"] == 0.0


def test_rotation_invariance_check(scan):
    # full default azimuth resolution — coarse azimuth bins would alias
    # rotations into bin-boundary shifts and inflate the diff
    cfg = SpectralEncoderConfig()
    pts = np.nan_to_num(scan)
    r = rotation_invariance_check(pts, cfg, n_rotations=4, max_points=24000)
    assert r["max_difference"] < 1e-3  # reference threshold (inference.yaml:101)


def test_quantization_error_stats(rng):
    h = rng.random(800).astype(np.float32)
    s = quantization_error_stats(h)
    # per-bin error is half a quantum except the argmax bin, which absorbs
    # the accumulated redistribution error (up to ~sqrt(n)/2 quanta)
    assert s["max_error"] < 0.5 * np.sqrt(800) * 3 / 65535
    assert s["mean_error"] < 1.0 / 65535
    assert s["sum_preserved"]


def test_run_benchmark_synthetic(tmp_path):
    from neural_spectral_codec_tpu.data.synthetic import SyntheticLoader
    from neural_spectral_codec_tpu.utils.config import load_config
    cfg = load_config(str(Path(__file__).resolve().parent.parent /
                          "configs" / "inference.yaml"))
    cfg["encoding"].update({"n_elevation": 16, "n_azimuth": 90, "n_bins": 20,
                            "target_elevation_bins": 8, "max_points": 8192})
    cfg["keyframe"].update({"distance_threshold": 2.0})
    cfg["validation"] = {"recall_distance_threshold": 5.0, "skip_frames": 20}
    out = tmp_path / "results.json"
    res = run_benchmark(
        [SyntheticLoader(n_frames=100, seed=0, n_points=4096, loops=2.0)],
        cfg, results_path=str(out))
    assert out.exists()
    (seq_metrics,) = res["sequences"].values()
    assert seq_metrics["n_queries"] > 0
    # raw spectral descriptors on clean synthetic revisits retrieve well
    assert seq_metrics["recall@1"] > 0.5
    assert "recall@1" in res["mean"]


def test_benchmark_rotation_invariance_gate(tmp_path):
    from neural_spectral_codec_tpu.data.synthetic import SyntheticLoader
    from neural_spectral_codec_tpu.utils.config import load_config
    cfg = load_config(str(Path(__file__).resolve().parent.parent /
                          "configs" / "inference.yaml"))
    cfg["encoding"].update({"n_elevation": 16, "n_azimuth": 360, "n_bins": 20,
                            "target_elevation_bins": 8, "max_points": 8192})
    cfg["keyframe"].update({"distance_threshold": 2.0})
    cfg["quality"] = {"check_rotation_invariance": True,
                      "rotation_invariance_threshold": 1e-3}
    res = run_benchmark(
        [SyntheticLoader(n_frames=60, seed=0, n_points=4096, loops=2.0)],
        cfg, results_path=str(tmp_path / "r.json"))
    assert res["rotation_invariance"]["passed"]


def test_evaluate_place_recognition_chunked_matches_unchunked(rng):
    """Query chunking (with last-chunk padding) must not change any
    metric — regression for the O(Q*n) memory fix."""
    from neural_spectral_codec_tpu.evaluation import (
        evaluate_place_recognition)
    n = 260
    t = np.linspace(0, 4 * np.pi, n)
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 0, 3] = 60 * np.cos(t)
    poses[:, 1, 3] = 60 * np.sin(t)
    emb = rng.random((n, 16)).astype(np.float32)
    full = evaluate_place_recognition(emb, poses, (1, 5), 5.0, 30,
                                      query_chunk=100000)
    chunked = evaluate_place_recognition(emb, poses, (1, 5), 5.0, 30,
                                         query_chunk=17)
    assert full == chunked and full["n_queries"] > 40
