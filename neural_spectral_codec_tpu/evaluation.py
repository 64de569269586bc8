"""Evaluation / benchmark harness.

The reference DEFINES this suite in configs/inference.yaml:107-121
(sequences, recall@K / precision / F1 metrics, a results JSON) but ships
no implementing code (SURVEY §4.3). This module implements it:

  * ``evaluate_place_recognition``: batched on-device Recall@K /
    Precision@1 / F1@1 over revisit queries (ground-truth revisit =
    another frame < ``distance_threshold`` away and ≥ ``skip_frames``
    older — same protocol as the reference's validation,
    reference trainer.py:306-387, generalized to the full metric list).
  * ``run_benchmark``: per-sequence descriptor extraction → optional GNN
    enhancement → metrics + timing, saved as one results JSON.

Self-check utilities the reference ships as library functions are here
too: ``rotation_invariance_check`` (reference spectral_encoder.py:365-415)
and ``quantization_error_stats`` (reference quantization.py:356-384).
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def evaluate_place_recognition(embeddings: np.ndarray, poses: np.ndarray,
                               k_values: Sequence[int] = (1, 5, 10),
                               distance_threshold: float = 5.0,
                               skip_frames: int = 30,
                               query_chunk: int = 4096,
                               n_curve_points: int = 20) -> Dict[str, float]:
    """Recall@K plus a THRESHOLDED precision/recall/F1 curve over revisit
    queries, all batched on device.

    The reference promised recall/precision/F1 in its benchmark config
    (inference.yaml:107-121) but never implemented them. A meaningful
    precision needs an accept decision, not just a ranking: here a query's
    top-1 match is ACCEPTED iff its embedding distance ≤ τ, and τ is swept
    over the observed distance quantiles —
      precision(τ) = (# accepted ∧ geometrically correct) / (# accepted),
      recall(τ)    = (# accepted ∧ geometrically correct) / (# queries)
    (every query is a true revisit by construction of the protocol).
    Reported as ``precision_recall_curve`` with the best-F1 operating
    point. ``precision@1``/``f1@1`` (rank-1 accuracy, ≡ recall@1 by
    construction) are kept for the config's metric-name surface."""
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.training.validation import (
        find_revisit_queries)

    positions = poses[:, :3, 3]
    queries = find_revisit_queries(positions, distance_threshold, skip_frames)
    out: Dict[str, float] = {"n_queries": len(queries)}
    if len(queries) == 0:
        for k in k_values:
            out[f"recall@{k}"] = 0.0
        out.update({"precision@1": 0.0, "f1@1": 0.0, "best_f1": 0.0,
                    "best_f1_tau": 0.0, "precision_at_best_f1": 0.0,
                    "recall_at_best_f1": 0.0,
                    "precision_recall_curve": {
                        "tau": [], "precision": [], "recall": [], "f1": []}})
        return out

    import functools
    import jax

    emb = jnp.asarray(embeddings)
    pos = jnp.asarray(positions)
    kmax = max(k_values)

    @functools.partial(jax.jit, static_argnames=("kmax", "skip_frames"))
    def _hit_chunk(emb, pos, q, kmax: int, distance_threshold,
                   skip_frames: int):
        # rank by squared embedding distance via the dot-product identity
        # (an MXU matmul): the elementwise |a-b| formulation materializes
        # a (c, n, D) intermediate — hundreds of GB at scale
        qe = emb[q]
        d2 = (jnp.sum(qe * qe, axis=1)[:, None]
              + jnp.sum(emb * emb, axis=1)[None, :]
              - 2.0 * jax.lax.dot(qe, emb.T,
                                  precision=jax.lax.Precision.HIGHEST))
        gap = jnp.abs(q[:, None] - jnp.arange(emb.shape[0])[None, :])
        d2 = jnp.where(gap > skip_frames, d2, jnp.inf)
        # tiled exact top-k: a flat lax.top_k over 100k columns costs
        # ~3.6 ms/row on v5e (it also breaks fusion with the distance
        # matmul) — the two-phase reduction is ~20x cheaper at scale
        from neural_spectral_codec_tpu.retrieval.retriever import (
            _topk_smallest)
        top_d2, topk = _topk_smallest(d2, kmax)
        geo = jnp.linalg.norm(pos[q][:, None, :] - pos[topk], axis=-1)
        top1 = jnp.sqrt(jnp.maximum(top_d2[:, 0], 0.0))
        # inf slots may carry tile-pad indices — never count them as hits
        hit = (geo < distance_threshold) & jnp.isfinite(top_d2)
        return hit, top1                          # (c, kmax), (c,)

    # chunk the query axis: the unchunked (Q, n) distance matrix (and its
    # top-k) would be tens of GB at the 100k-keyframe scale the configs
    # advertise; one fixed chunk shape keeps a single executable
    chunk = query_chunk
    qs = queries[:, 0].astype(np.int64)
    parts, dparts = [], []
    for s in range(0, len(qs), chunk):
        part = qs[s:s + chunk]
        pad = 0
        if len(part) < chunk and len(qs) > chunk:
            pad = chunk - len(part)
            part = np.concatenate([part, np.repeat(part[-1:], pad)])
        h, d1 = _hit_chunk(emb, pos, jnp.asarray(part), kmax,
                           distance_threshold, skip_frames)
        h, d1 = np.asarray(h), np.asarray(d1)
        parts.append(h[:len(h) - pad] if pad else h)
        dparts.append(d1[:len(d1) - pad] if pad else d1)
    hit = np.concatenate(parts)                   # (Q, kmax)
    top1_dist = np.concatenate(dparts)            # (Q,)

    for k in k_values:
        out[f"recall@{k}"] = float(hit[:, :k].any(axis=1).mean())
    # rank-1 accuracy, kept under the config's metric names (≡ recall@1
    # by construction — the thresholded curve below is the real P/R/F1)
    out["precision@1"] = float(hit[:, 0].mean())
    r, p = out.get("recall@1", 0.0), out["precision@1"]
    out["f1@1"] = 2 * p * r / (p + r) if (p + r) > 0 else 0.0

    # thresholded accept: sweep τ over the observed top-1 distance
    # quantiles (plus +inf = accept-everything, whose precision is the
    # rank-1 accuracy and recall is recall@1)
    hit1 = hit[:, 0]
    taus = np.unique(np.quantile(
        top1_dist, np.linspace(0.0, 1.0, max(n_curve_points - 1, 2))))
    taus = np.append(taus, np.inf)
    curve = {"tau": [], "precision": [], "recall": [], "f1": []}
    for tau in taus:
        acc = top1_dist <= tau
        n_acc = int(acc.sum())
        tp = float(np.sum(acc & hit1))
        prec = tp / n_acc if n_acc else 1.0
        rec = tp / len(hit1)
        f1 = 2 * prec * rec / (prec + rec) if (prec + rec) > 0 else 0.0
        curve["tau"].append(float(tau))
        curve["precision"].append(prec)
        curve["recall"].append(rec)
        curve["f1"].append(f1)
    best = int(np.argmax(curve["f1"]))
    out["precision_recall_curve"] = curve
    out["best_f1"] = curve["f1"][best]
    out["best_f1_tau"] = curve["tau"][best]
    out["precision_at_best_f1"] = curve["precision"][best]
    out["recall_at_best_f1"] = curve["recall"][best]
    return out


# ---------------------------------------------------------------------------
# self-checks (reference inline test functions, shipped as library code)
# ---------------------------------------------------------------------------

def rotation_invariance_check(points: np.ndarray, encoder_config,
                              alpha: float = 2.0, n_rotations: int = 8,
                              max_points: int = 131072) -> Dict[str, float]:
    """Encode a scan at ``n_rotations`` z-rotations, report the max/mean
    histogram difference (reference spectral_encoder.py:365-415)."""
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.ops.range_image import pad_points
    from neural_spectral_codec_tpu.ops.spectral import encode_points_batch

    batch = []
    for i in range(n_rotations):
        th = 2 * np.pi * i / n_rotations
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0],
                      [0, 0, 1]], np.float32)
        p = points.copy()
        p[:, :3] = p[:, :3] @ R.T
        batch.append(pad_points(p, max_points))
    d = np.asarray(encode_points_batch(
        jnp.asarray(np.stack(batch)), jnp.float32(alpha), encoder_config))
    diffs = np.abs(d - d[0]).max(axis=1)
    return {"max_difference": float(diffs.max()),
            "mean_difference": float(diffs.mean()),
            "n_rotations": n_rotations}


def quantization_error_stats(histogram: np.ndarray) -> Dict[str, float]:
    """Quantize/dequantize round-trip error stats
    (reference quantization.py:356-384)."""
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.ops.quantization import dequantize, quantize

    h = np.asarray(histogram, np.float32)
    h = h / max(h.sum(), 1e-12)
    rec = np.asarray(dequantize(quantize(jnp.asarray(h))))
    err = np.abs(rec - h)
    return {"max_error": float(err.max()),
            "mean_error": float(err.mean()),
            "sum_preserved": bool(abs(rec.sum() - 1.0) < 1e-5)}


# ---------------------------------------------------------------------------
# full benchmark
# ---------------------------------------------------------------------------

def run_benchmark(loaders: Sequence, config: Dict,
                  checkpoint_path: Optional[str] = None,
                  results_path: Optional[str] = None) -> Dict:
    """Per-sequence benchmark: keyframes → descriptors → (optional GNN) →
    place-recognition metrics + timing. Implements the metric list of
    reference configs/inference.yaml:107-121."""
    from neural_spectral_codec_tpu.keyframe.graph import (
        build_graph_from_keyframes)
    from neural_spectral_codec_tpu.models.gnn import gnn_forward
    from neural_spectral_codec_tpu.pipeline import NeuralSpectralCodecPipeline

    bench_cfg = config.get("benchmark", {})
    val_cfg = config.get("validation", {})
    k_values = sorted({int(m.split("@")[1]) for m in bench_cfg.get(
        "metrics", ["recall@1", "recall@5", "recall@10"])
        if m.startswith("recall@")}) or [1, 5, 10]

    pipe = NeuralSpectralCodecPipeline(config)
    if checkpoint_path:
        pipe.load_checkpoint(checkpoint_path)

    results: Dict = {"sequences": {}, "config": {
        "k_values": k_values,
        "distance_threshold": val_cfg.get("recall_distance_threshold", 5.0),
        "skip_frames": val_cfg.get("skip_frames", 30),
    }}

    quality = config.get("quality", {})
    if quality.get("check_rotation_invariance", False) and loaders:
        frame = loaders[0][0]
        inv = rotation_invariance_check(
            np.nan_to_num(frame["points"]), pipe.encoder_config,
            alpha=pipe.encoder_config.alpha,
            max_points=pipe.encoder.max_points)
        threshold = quality.get("rotation_invariance_threshold", 1e-3)
        inv["passed"] = bool(inv["max_difference"] < threshold)
        results["rotation_invariance"] = inv
        logger.info("Rotation invariance: %s", inv)
    for i, loader in enumerate(loaders):
        seq_name = getattr(loader, "sequence", str(i))
        t0 = time.perf_counter()
        kfs = pipe._process_sequence(loader, sequence_id=i)
        t_encode = time.perf_counter() - t0
        if len(kfs) < 3:
            logger.warning("Sequence %s: too few keyframes, skipping", seq_name)
            continue
        desc = np.stack([kf.descriptor for kf in kfs])
        poses = np.stack([kf.pose for kf in kfs])

        # ablation.disable_gnn must win even when a checkpoint populated
        # params — this is the entry point the train_offline refusal
        # directs raw-histogram ablation runs to
        if pipe.params is not None and not pipe.ablate_gnn:
            graph = build_graph_from_keyframes(
                kfs, temporal_neighbors=pipe.temporal_neighbors)
            emb = np.asarray(gnn_forward(
                pipe.model, pipe.params, pipe.batch_stats, graph))
        else:
            emb = desc

        t1 = time.perf_counter()
        metrics = evaluate_place_recognition(
            emb, poses, k_values,
            distance_threshold=results["config"]["distance_threshold"],
            skip_frames=results["config"]["skip_frames"])
        metrics["avg_query_time_ms"] = (
            1e3 * (time.perf_counter() - t1) / max(metrics["n_queries"], 1))
        metrics["encode_time_s"] = t_encode
        metrics["n_keyframes"] = len(kfs)
        results["sequences"][seq_name] = metrics
        logger.info("Benchmark %s: %s", seq_name, metrics)

    if results["sequences"]:
        agg = {}
        for k in k_values:
            agg[f"recall@{k}"] = float(np.mean(
                [m[f"recall@{k}"] for m in results["sequences"].values()]))
        agg["best_f1"] = float(np.mean(
            [m["best_f1"] for m in results["sequences"].values()]))
        results["mean"] = agg

    if results_path:
        Path(results_path).parent.mkdir(parents=True, exist_ok=True)
        with open(results_path, "w") as f:
            json.dump(results, f, indent=2)
        logger.info("Benchmark results saved to %s", results_path)
    return results
