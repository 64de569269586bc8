#!/usr/bin/env python
"""Cross-sensor demo: the HeLiPR(VLP-16) → KITTI(HDL-64E) recipe
(configs/training_helipr_to_kitti.yaml) end-to-end on synthetic streams.

The reference ships this recipe but no result; without HeLiPR/KITTI on
disk (zero egress) the synthetic world stands in: the TRAIN stream is a
simulated 16-beam sensor over ±15° (VLP-16-like), the VAL stream a
simulated 64-beam sensor over −24.8°..2° (HDL-64E-like) of the same
world model — both projected with the recipe's sensor-agnostic encoding
(n_elevation=16 fat rows over the VLP FOV + circular interpolation).

Three numbers come out:
  1. raw-descriptor loop-closure R@1 on the 64-beam val stream (the
     cross-sensor generalization floor),
  2. GNN-enhanced R@1 after training ONLY on the 16-beam stream (the
     recipe's deliverable: does trajectory context learned on sensor A
     transfer to sensor B?),
  3. mixed-sensor retrieval top-1: 64-beam queries against the 16-beam
     keyframe database (the cross-sensor comparability the descriptor
     design buys; tests/test_cross_sensor.py pins its floor).

Scans are viewpoint-degraded (azimuth wedge + dropout) so raw
descriptors have headroom — on clean synthetic streams raw R@1
saturates and the GNN has nothing to add (docs/density_defense.md).

Run:  python experiments/cross_sensor_uplift.py [--epochs 25] [--frames 300]
(Measured results are recorded in docs/cross_sensor.md.)
"""

import argparse
import logging
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=25)
    p.add_argument("--frames", type=int, default=300)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--seed-base", type=int, default=0,
                   help="world/degradation seed pair: train uses "
                        "seed-base, val seed-base+1 (default 0/1 = the "
                        "recorded headline draw)")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    from neural_spectral_codec_tpu.data.synthetic import (
        SensorSimLoader, SyntheticWorld, loop_trajectory, snap_to_beams)
    from neural_spectral_codec_tpu.ops.range_image import pad_points
    from neural_spectral_codec_tpu.ops.spectral import encode_points_batch
    from neural_spectral_codec_tpu.ops.wasserstein import wasserstein_matrix
    from neural_spectral_codec_tpu.pipeline import NeuralSpectralCodecPipeline
    from neural_spectral_codec_tpu.training.validation import (
        recall_loop_closure)
    from neural_spectral_codec_tpu.utils.config import load_config

    import jax.numpy as jnp

    root = Path(__file__).resolve().parent.parent
    cfg = load_config(str(root / "configs" / "training_helipr_to_kitti.yaml"))
    cfg["encoding"]["max_points"] = 16384
    cfg["keyframe"]["distance_threshold"] = 3.0
    cfg["training"].update({"n_epochs": args.epochs,
                            "patience": args.epochs,
                            "normalize_embeddings": True})
    cfg["system"]["checkpoint_dir"] = (args.checkpoint_dir
                                       or tempfile.mkdtemp())

    # train sensor: VLP-16-like; val sensor: HDL-64E-like. Same world
    # statistics, different seeds (different places) — the GNN must
    # transfer across sensors, not memorize places.
    train = SensorSimLoader(n_frames=args.frames, seed=args.seed_base,
                            n_points=16384,
                            loops=2.5, n_beams=16,
                            beam_fov_deg=(-15.0, 15.0),
                            wedge_deg=200.0, dropout=0.3)
    val = SensorSimLoader(n_frames=3 * args.frames // 4, seed=args.seed_base + 1,
                          n_points=16384, loops=2.5, n_beams=64,
                          beam_fov_deg=(-24.8, 2.0),
                          wedge_deg=200.0, dropout=0.3)

    # 1. raw-descriptor baseline on the 64-beam val stream
    baseline_pipe = NeuralSpectralCodecPipeline(cfg)
    val_kfs = baseline_pipe._process_sequence(val, sequence_id=0)
    vdesc = np.stack([k.descriptor for k in val_kfs])
    vposes = np.stack([k.pose for k in val_kfs])
    raw = {}
    for k in (1, 5):
        raw[k], nq = recall_loop_closure(vdesc, vposes, k, 5.0, 30)
    print(f"raw descriptors (64-beam val) : R@1 {raw[1]:.3f}  "
          f"R@5 {raw[5]:.3f}  ({nq} queries)")

    # 2. train on the 16-beam stream only, validate on the 64-beam stream
    pipe = NeuralSpectralCodecPipeline(cfg)
    trainer = pipe.train_offline([train], [val], n_epochs=args.epochs)
    gnn_r1 = trainer.best_val_metric
    rel = (gnn_r1 - raw[1]) / max(raw[1], 1e-9) * 100
    print(f"GNN-enhanced    (64-beam val) : R@1 {gnn_r1:.3f} "
          f"({rel:+.0f}% relative vs raw {raw[1]:.3f})")

    # 3. mixed-sensor retrieval along the two mismatch axes (clean scans
    #    — isolates the sensor effect). (a) BEAM DENSITY: 64- vs 16-beam
    #    sensors over the SAME FOV — the axis the fat-row pooling +
    #    circular interpolation are designed to absorb. (b) NATIVE FOV:
    #    VLP-16 (−15..15°) database vs HDL-64E (−24.8..2°) queries — a
    #    measured LIMITATION: the recipe's own config (VLP FOV for both)
    #    scores at chance here; encoding with the overlap FOV (−15..2°)
    #    recovers ~4× above chance but stays weak. The recipe never
    #    promises this case (its validation is within-KITTI).
    world = SyntheticWorld(seed=7)
    poses = loop_trajectory(30, radius=100.0, loops=1.0)
    rng = np.random.default_rng(0)

    def encode_with(cfg, pts):
        return np.asarray(encode_points_batch(
            jnp.asarray(pad_points(pts, 32768))[None],
            jnp.float32(2.0), cfg))[0]

    def top1(cfg, db_beams, db_fov, q_beams, q_fov):
        db, q = [], []
        for pose in poses:
            dense = world.scan(pose, n_points=30000, rng=rng)
            db.append(encode_with(cfg, snap_to_beams(dense, db_beams,
                                                     db_fov)))
            q.append(encode_with(cfg, snap_to_beams(dense, q_beams,
                                                    q_fov)))
        dmat = np.asarray(wasserstein_matrix(jnp.asarray(np.stack(q)),
                                             jnp.asarray(np.stack(db))))
        return (dmat.argmin(axis=1) == np.arange(len(poses))).mean()

    from neural_spectral_codec_tpu.ops.spectral import SpectralEncoderConfig
    hdl = (-24.8, 2.0)
    acc_density = top1(
        SpectralEncoderConfig(n_elevation=16, target_elevation_bins=16),
        16, hdl, 64, hdl)
    acc_fov = top1(
        SpectralEncoderConfig(n_elevation=16, target_elevation_bins=16,
                              elevation_range_deg=(-15.0, 2.0)),
        16, (-15.0, 15.0), 64, hdl)
    # the FIX for the native-FOV axis: drop (not clip) out-of-band
    # points and size rows to the coarser sensor's in-band beam spacing
    # (8 rows over the 17-degree overlap ~ 2.1 deg >= VLP 2.0 deg)
    acc_fov_drop = top1(
        SpectralEncoderConfig(n_elevation=8, target_elevation_bins=8,
                              elevation_range_deg=(-15.0, 2.0),
                              elevation_mode="drop"),
        16, (-15.0, 15.0), 64, hdl)
    print(f"beam-density retrieval 64q -> 16-db (same FOV) : "
          f"top-1 {acc_density:.3f} ({len(poses)} places)")
    print(f"native-FOV retrieval VLP-db <- HDL-q (overlap-FOV encoding, "
          f"reference clip semantics): top-1 {acc_fov:.3f}")
    print(f"native-FOV retrieval VLP-db <- HDL-q (elevation_mode=drop + "
          f"overlap fat rows): top-1 {acc_fov_drop:.3f}")
    return raw[1], gnn_r1, acc_density, acc_fov, acc_fov_drop


if __name__ == "__main__":
    main()
