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


def raycast(lo, hi, yaw, rng):
    """Cast the full 64 x N_AZIM_FULL ray grid from the origin (sensor
    frame rotated by ``yaw``); returns (n_rays, 4) float32 points with
    2 cm range noise and 8% dropout."""
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


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from neural_spectral_codec_tpu.ops.range_image import pad_points
    from neural_spectral_codec_tpu.ops.spectral import (
        SpectralEncoderConfig, encode_points_batch)
    from neural_spectral_codec_tpu.ops.wasserstein import wasserstein_1d

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
        f.write(
            f"\nReference scales (same encoder, full density):\n\n"
            f"- z-rotation-invariance jitter W1: mean "
            f"{np.mean(rot_jitter):.4f}, max {np.max(rot_jitter):.4f}\n"
            f"- same-place re-observation W1 (fresh noise/dropout): mean "
            f"{np.mean(reobs_dist):.4f}, max {np.max(reobs_dist):.4f}\n"
            f"- different-place W1 (the signal): mean "
            f"{np.mean(inter):.4f}, min {np.min(inter):.4f}\n\n"
            "**Defended bench density:** the knee is the largest stride "
            "whose W1-to-full\nstays well below BOTH the encoder's own "
            "rotation jitter and same-place\nre-observation distance — "
            "decimation at that stride is invisible to retrieval\n"
            "relative to the method's intrinsic noise floor.\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
