"""Density defense: descriptor error vs point budget on realistic scans.

The headline benchmark must pick a scan size (BENCH/VERDICT round 2): a raw
KITTI HDL-64E scan carries ~120-133k returns, but the 64x360 range image
keeps only the per-pixel closest return, and empty pixels are circularly
interpolated before the FFT. On real (piecewise-smooth) geometry the
descriptor therefore saturates far below full density. This experiment
quantifies that: ray-cast structured scenes (ground plane + walls + boxes)
at full HDL-64E resolution (64 x 2088 ~ 133k rays), decimate by azimuth
striding (what a lower-rate spinning sensor would deliver), and measure

  * max |descriptor_budget - descriptor_full|   (parity-style error)
  * W1(descriptor_budget, descriptor_full)      (the retrieval metric)

against the two scales that matter for retrieval:

  * the encoder's own z-rotation-invariance jitter (its noise floor), and
  * same-place re-observation distance (sensor noise + pose perturbation),
  * different-place distances (the signal).

Run on TPU:  python experiments/density_defense.py
Writes docs/density_defense.md with the table.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_ELEV, N_AZIM_FULL = 64, 2088          # HDL-64E: 64 lasers x ~0.172 deg
ELEV = np.deg2rad(np.linspace(-24.8, 2.0, N_ELEV, endpoint=False)
                  + 26.8 / N_ELEV / 2)
SENSOR_Z = 1.73                          # KITTI mount height


def make_scene(rng, n_boxes=40):
    """Random urban-ish scene: axis-aligned boxes (buildings/cars) around
    the sensor + ground plane."""
    centers = rng.uniform(-60, 60, (n_boxes, 2))
    keep = np.linalg.norm(centers, axis=1) > 6.0
    centers = centers[keep]
    sizes = np.stack([rng.uniform(2, 20, len(centers)),
                      rng.uniform(2, 20, len(centers)),
                      rng.uniform(2, 12, len(centers))], axis=1)
    lo = np.concatenate([centers - sizes[:, :2] / 2,
                         np.zeros((len(centers), 1)) - SENSOR_Z], axis=1)
    hi = np.concatenate([centers + sizes[:, :2] / 2,
                         sizes[:, 2:] - SENSOR_Z], axis=1)
    return lo.astype(np.float32), hi.astype(np.float32)


def raycast(lo, hi, yaw, rng, pos=(0.0, 0.0)):
    """Cast the full 64 x N_AZIM_FULL ray grid from sensor position
    ``pos`` (sensor frame rotated by ``yaw``); returns (n_rays, 4)
    float32 points with 2 cm range noise and 8% dropout."""
    lo = lo - np.array([pos[0], pos[1], 0.0], np.float32)
    hi = hi - np.array([pos[0], pos[1], 0.0], np.float32)
    az = (np.linspace(-np.pi, np.pi, N_AZIM_FULL, endpoint=False)[None, :]
          + yaw)
    el = ELEV[:, None]
    d = np.stack(np.broadcast_arrays(
        np.cos(el) * np.cos(az), np.cos(el) * np.sin(az),
        np.sin(el) * np.ones_like(az)), axis=-1).reshape(-1, 3)

    t_best = np.full(len(d), np.inf, np.float32)
    # ground plane z = -SENSOR_Z
    dz = d[:, 2]
    tg = np.where(dz < -1e-6, -SENSOR_Z / np.where(dz < -1e-6, dz, -1.0),
                  np.inf)
    t_best = np.minimum(t_best, tg)
    # AABBs, slab test (vectorized over boxes)
    inv = 1.0 / np.where(np.abs(d) > 1e-9, d, 1e-9)
    for b in range(len(lo)):
        t0 = (lo[b][None, :] - 0.0) * inv
        t1 = (hi[b][None, :] - 0.0) * inv
        tmin = np.minimum(t0, t1).max(axis=1)
        tmax = np.maximum(t0, t1).min(axis=1)
        hit = (tmax >= tmin) & (tmax > 0)
        t_hit = np.where(tmin > 0, tmin, tmax)
        t_best = np.where(hit & (t_hit < t_best), t_hit, t_best)

    t_best = t_best + rng.normal(0, 0.02, len(t_best)).astype(np.float32)
    pts = d * t_best[:, None]
    drop = rng.random(len(pts)) < 0.08
    bad = drop | ~np.isfinite(t_best) | (t_best > 80) | (t_best < 1)
    pts = np.concatenate(
        [pts, rng.random((len(pts), 1)).astype(np.float32)], axis=1)
    pts[bad] = np.nan
    return pts.astype(np.float32)


def make_world_for_loop(rng, radius, n_boxes=120, extent=160.0):
    """Urban-ish world around a circular trajectory of ``radius``: boxes
    scattered over the area, none closer than 6 m to the path."""
    centers = rng.uniform(-extent, extent, (n_boxes, 2))
    dist_to_path = np.abs(np.linalg.norm(centers, axis=1) - radius)
    centers = centers[dist_to_path > 6.0]
    sizes = np.stack([rng.uniform(2, 20, len(centers)),
                      rng.uniform(2, 20, len(centers)),
                      rng.uniform(2, 12, len(centers))], axis=1)
    lo = np.concatenate([centers - sizes[:, :2] / 2,
                         np.zeros((len(centers), 1)) - SENSOR_Z], axis=1)
    hi = np.concatenate([centers + sizes[:, :2] / 2,
                         sizes[:, 2:] - SENSOR_Z], axis=1)
    return lo.astype(np.float32), hi.astype(np.float32)


def recall_at_strides(strides, rng, encode, w1_matrix,
                      n_per_loop=90, radius=60.0, skip_frames=30,
                      geo_threshold=5.0, top_ks=(1, 5, 10)):
    """Loop-trajectory Recall@K under the stage-1 W1 metric, per stride.

    Two passes around one ray-cast world; second-loop frames are true
    revisits of first-loop frames (same positions, fresh noise/dropout
    and heading jitter). For each stride: decimate every scan, encode,
    rank candidates older than ``skip_frames`` by W1, score top-k hits
    geometrically — the SAME protocol at every stride, so any recall gap
    is attributable to the decimation alone. Also evaluates the mixed
    deployment case (stride-decimated queries against the full-density
    database)."""
    lo, hi = make_world_for_loop(rng, radius)
    n = 2 * n_per_loop
    theta = np.linspace(0, 4 * np.pi, n, endpoint=False)
    positions = np.stack([radius * np.cos(theta), radius * np.sin(theta),
                          np.zeros(n)], axis=1)
    scans = []
    for i in range(n):
        yaw = theta[i] + np.pi / 2 + rng.normal(0, 0.03)
        scans.append(raycast(lo, hi, yaw, rng,
                             pos=(positions[i, 0], positions[i, 1])))

    full = N_ELEV * N_AZIM_FULL
    gap = np.abs(np.arange(n)[:, None] - np.arange(n)[None, :])
    geo = np.linalg.norm(positions[:, None, :] - positions[None, :, :],
                         axis=2)
    # queries: frames with at least one sufficiently-old true revisit
    has_rev = ((gap > skip_frames) & (geo < geo_threshold)).any(axis=1)
    queries = np.where(has_rev)[0]

    def protocol_recall(d_query, d_db):
        dist = w1_matrix(d_query[queries], d_db)          # (Q, n)
        dist = np.where(gap[queries] > skip_frames, dist, np.inf)
        order = np.argsort(dist, axis=1)
        out = {}
        for k in top_ks:
            hits = geo[queries[:, None], order[:, :k]] < geo_threshold
            out[k] = float(hits.any(axis=1).mean())
        return out

    descs = {}
    for s in strides:
        budget = -(-full // s)
        descs[s] = encode([p[::s] for p in scans], budget)

    results = {}
    for s in strides:
        results[("pure", s)] = protocol_recall(descs[s], descs[s])
        if s != 1:
            results[("mixed", s)] = protocol_recall(descs[s], descs[1])
    return results, len(queries)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from neural_spectral_codec_tpu.ops.range_image import pad_points
    from neural_spectral_codec_tpu.ops.spectral import (
        SpectralEncoderConfig, encode_points_batch)
    from neural_spectral_codec_tpu.ops.wasserstein import (
        wasserstein_1d, wasserstein_matrix)

    config = SpectralEncoderConfig()
    alpha = jnp.float32(2.0)
    rng = np.random.default_rng(11)
    n_scenes = 8
    full = N_ELEV * N_AZIM_FULL                     # 133,632
    strides = [1, 2, 4, 5, 8]                       # -> budgets below

    def encode(pts_list, budget):
        batch = np.stack([pad_points(p, budget) for p in pts_list])
        return np.asarray(encode_points_batch(
            jnp.asarray(batch), alpha, config))

    scenes = [make_scene(rng) for _ in range(n_scenes)]
    scans = [raycast(lo, hi, 0.0, rng) for lo, hi in scenes]
    rot_scans = [raycast(lo, hi, rng.uniform(0, 2 * np.pi), rng)
                 for lo, hi in scenes]
    # same place, re-observed: fresh noise + small yaw jitter
    reobs = [raycast(lo, hi, rng.normal(0, 0.02), rng)
             for lo, hi in scenes]

    d_full = encode(scans, full)
    d_rot = encode(rot_scans, full)
    d_reobs = encode(reobs, full)

    w1 = lambda a, b: float(wasserstein_1d(jnp.asarray(a), jnp.asarray(b)))
    rot_jitter = [w1(d_full[i], d_rot[i]) for i in range(n_scenes)]
    reobs_dist = [w1(d_full[i], d_reobs[i]) for i in range(n_scenes)]
    inter = [w1(d_full[i], d_full[j])
             for i in range(n_scenes) for j in range(i + 1, n_scenes)]

    rows = []
    for s in strides[1:]:
        budget = -(-full // s)
        dec = [p[::s] for p in scans]
        d_b = encode(dec, budget)
        max_abs = float(np.abs(d_b - d_full).max())
        w1s = [w1(d_b[i], d_full[i]) for i in range(n_scenes)]
        rows.append((s, budget, max_abs, float(np.mean(w1s)),
                     float(np.max(w1s))))
        print(f"stride {s} (N={budget:6d}): max|dDesc|={max_abs:.2e} "
              f"W1 mean={np.mean(w1s):.4f} max={np.max(w1s):.4f}")

    print(f"rotation jitter   W1: mean={np.mean(rot_jitter):.4f} "
          f"max={np.max(rot_jitter):.4f}")
    print(f"re-observation    W1: mean={np.mean(reobs_dist):.4f} "
          f"max={np.max(reobs_dist):.4f}")
    print(f"different places  W1: mean={np.mean(inter):.4f} "
          f"min={np.min(inter):.4f}")

    # ---- retrieval-level evidence: Recall@K at stride 1 vs stride 4 ----
    w1_matrix = lambda a, b: np.asarray(wasserstein_matrix(
        jnp.asarray(a), jnp.asarray(b)))
    recall, n_queries = recall_at_strides(
        [1, 4], np.random.default_rng(7), encode, w1_matrix)
    for key, r in sorted(recall.items()):
        mode, s = key
        print(f"recall[{mode} stride {s}] ({n_queries} queries): "
              + "  ".join(f"R@{k} {v:.4f}" for k, v in r.items()))

    out = Path(__file__).resolve().parent.parent / "docs" / "density_defense.md"
    with open(out, "w") as f:
        f.write(
            "# Density defense: descriptor error vs point budget\n\n"
            "Generated by `experiments/density_defense.py` (ray-cast "
            "structured scenes,\n64 x 2088 HDL-64E ray grid = 133,632 "
            "returns at full density, azimuth-stride\ndecimation, "
            f"{n_scenes} scenes, real TPU encode).\n\n"
            "| stride | points | max abs desc err | W1 to full (mean) | "
            "W1 to full (max) |\n|---|---|---|---|---|\n")
        for s, budget, max_abs, w1m, w1x in rows:
            f.write(f"| {s} | {budget} | {max_abs:.2e} | {w1m:.4f} | "
                    f"{w1x:.4f} |\n")
        s4 = next(r for r in rows if r[0] == 4)
        ratio = np.min(inter) / s4[4]
        f.write(
            f"\nReference scales (same encoder, full density):\n\n"
            f"- z-rotation-invariance jitter W1: mean "
            f"{np.mean(rot_jitter):.4f}, max {np.max(rot_jitter):.4f}\n"
            f"- same-place re-observation W1 (fresh noise/dropout): mean "
            f"{np.mean(reobs_dist):.4f}, max {np.max(reobs_dist):.4f}\n"
            f"- different-place W1 (the signal): mean "
            f"{np.mean(inter):.4f}, min {np.min(inter):.4f}\n\n"
            "**Criterion (descriptor level):** stride-4 decimation error "
            "is of the SAME\nORDER as the encoder's intrinsic same-place "
            f"noise floor (W1-to-full mean\n{s4[3]:.2f} vs rotation "
            f"jitter {np.mean(rot_jitter):.2f} / re-observation "
            f"{np.mean(reobs_dist):.2f} — comparable,\nnot below), and "
            f"its worst case ({s4[4]:.2f}) sits {ratio:.1f}x below the "
            "closest\ndifferent-place distance "
            f"({np.min(inter):.2f}). Beyond stride 4 the error jumps\n"
            "past the noise floor (stride 5: "
            f"{next(r for r in rows if r[0] == 5)[3]:.2f} mean). "
            "Descriptor distances alone\ndo not settle whether retrieval "
            "survives — the measurement that does is below.\n\n"
            "## Retrieval-level evidence (the claim that matters)\n\n"
            "Loop trajectory (two passes around one ray-cast world, "
            f"{n_queries} revisit\nqueries, frame gap > 30, 5 m ground "
            "truth), stage-1 W1 ranking — the same\nprotocol at every "
            "stride, so any gap is attributable to decimation alone:\n\n"
            "| descriptors | R@1 | R@5 | R@10 |\n|---|---|---|---|\n")
        label = {("pure", 1): "stride 1 (full density, 133,632 pts)",
                 ("pure", 4): "stride 4 (defended density, 33,408 pts)",
                 ("mixed", 4): "stride-4 queries vs stride-1 database"}
        for key in [("pure", 1), ("pure", 4), ("mixed", 4)]:
            r = recall[key]
            f.write(f"| {label[key]} | {r[1]:.4f} | {r[5]:.4f} | "
                    f"{r[10]:.4f} |\n")
        r1, r4, rm = (recall[("pure", 1)], recall[("pure", 4)],
                      recall[("mixed", 4)])
        f.write(
            "\n**Conclusion (round 3): the decimation is NOT free.** "
            "Despite the\ndescriptor-level distances sitting at the "
            f"noise floor, stride-4\ndecimation costs Recall@1 "
            f"{r1[1]:.3f} → {r4[1]:.3f} on this protocol (and "
            f"{rm[1]:.3f} in\nthe mixed deployment case of decimated "
            "queries against a full-density\ndatabase). "
            "Descriptor-distance arguments understated the retrieval\n"
            "impact — measured, acknowledged, and acted on: **the "
            "headline benchmark\nmoved to FULL density** (`bench.py`), "
            "where the ring-structured fast\npath (`ops/ring_path.py`) "
            "runs with zero decimation — see docs/performance.md\nfor "
            "the current number. The stride tables above remain as "
            "guidance for\nusers who deliberately trade recall for "
            "point budget, with the recall\ncost now quantified instead "
            "of assumed away.\n\n"
            "**Benchmark-input note:** `bench.py` times synthetic "
            "ring-major scans\nsatisfying the ring-path structure "
            "contract (verified at bench startup),\nwhile this defense "
            "uses ray-cast structured scenes; the hot path's\n"
            "roll/compare networks are data-oblivious (operation count "
            "independent of\nkey values), so the timing transfers — "
            "only the descriptor-quality\nargument needs ray-cast "
            "scenes.\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
