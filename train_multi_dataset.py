#!/usr/bin/env python
"""Multi-dataset GNN training entry point (reference train_multi_dataset.py).

Six stages, each profiled (reference :215-531):
  1. encoder setup       4. graph construction (with edge features)
  2. train keyframes     5. GNN creation
  3. val keyframes       6. triplet training w/ recall validation

Differences from the reference, all TPU-first:
  * keyframe descriptors are encoded in fixed-shape device batches, not
    per-scan host→device copies (reference :182)
  * helipr is handled by the same loader factory instead of a special case
    (reference :331-348 works around its own MultiDatasetLoader rejecting
    helipr)
  * optional data-parallel training over a device mesh (--mesh-devices)
"""

import argparse
import logging
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))

logger = logging.getLogger(__name__)


def extract_keyframes(loaders, pipeline, base_sequence_id=0):
    """Per-dataset keyframe extraction with per-scan timing
    (reference process_dataset, train_multi_dataset.py:141-208)."""
    kfs = []
    for i, loader in enumerate(loaders):
        kfs.extend(pipeline._process_sequence(
            loader, sequence_id=base_sequence_id + i))
    return kfs


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Train the spectral GNN on multiple LiDAR datasets (TPU)")
    parser.add_argument("--config", required=True,
                        help="YAML config (e.g. configs/training_multi_dataset.yaml)")
    parser.add_argument("--checkpoint-dir", default=None,
                        help="Override system.checkpoint_dir")
    parser.add_argument("--epochs", type=int, default=None,
                        help="Override training.n_epochs")
    parser.add_argument("--resume", default=None, metavar="NAME",
                        help="Resume from a checkpoint in the checkpoint "
                             "dir (e.g. 'best_model') — the reference had "
                             "a resume config block no entry point honored")
    parser.add_argument("--synthetic", type=int, default=0, metavar="N",
                        help="Use N synthetic frames instead of datasets "
                             "(smoke testing without KITTI/NCLT on disk)")
    parser.add_argument("--synthetic-beams", type=int, default=None,
                        metavar="B",
                        help="With --synthetic: simulate a B-beam TRAIN "
                             "sensor (VLP-16-like FOV) — pairs with "
                             "--synthetic-val-beams for the cross-sensor "
                             "HeLiPR->KITTI recipe without data on disk")
    parser.add_argument("--synthetic-val-beams", type=int, default=None,
                        metavar="B",
                        help="With --synthetic: simulate a B-beam VAL "
                             "sensor (FOV from the known-sensor table, "
                             "or --synthetic-val-fov)")
    parser.add_argument("--synthetic-fov", type=float, nargs=2,
                        default=None, metavar=("LO", "HI"),
                        help="Vertical FOV (deg) of the synthetic TRAIN "
                             "sensor; required for beam counts without a "
                             "known-sensor default (16→VLP-16 ±15°, "
                             "64→HDL-64E −24.8°..2°)")
    parser.add_argument("--synthetic-val-fov", type=float, nargs=2,
                        default=None, metavar=("LO", "HI"),
                        help="Vertical FOV (deg) of the synthetic VAL "
                             "sensor (see --synthetic-fov)")
    parser.add_argument("--platform", default="default",
                        help="Force the jax platform (e.g. 'cpu') — env "
                             "vars alone cannot override plugin-registered "
                             "backends (utils/platform.py)")
    args = parser.parse_args(argv)

    from neural_spectral_codec_tpu.utils.platform import force_platform
    force_platform(args.platform)

    from neural_spectral_codec_tpu.pipeline import (
        NeuralSpectralCodecPipeline, _loaders_from_config)
    from neural_spectral_codec_tpu.utils.config import load_config
    from neural_spectral_codec_tpu.utils.logging_setup import setup_logging

    config = load_config(args.config)
    if args.checkpoint_dir:
        config.setdefault("system", {})["checkpoint_dir"] = args.checkpoint_dir
    log_path = setup_logging(config.get("system", {}).get("log_dir", "logs"))
    logger.info("Config: %s | log file: %s", args.config, log_path)

    pipeline = NeuralSpectralCodecPipeline(config)

    sensor_flags = (args.synthetic_beams is not None
                    or args.synthetic_val_beams is not None
                    or args.synthetic_fov is not None
                    or args.synthetic_val_fov is not None)
    if sensor_flags and not args.synthetic:
        parser.error("--synthetic-beams/--synthetic-fov flags require "
                     "--synthetic N (they configure the synthetic sensors)")
    if args.synthetic:
        from neural_spectral_codec_tpu.data.synthetic import (
            SensorSimLoader, SyntheticLoader)
        n_val = max(args.synthetic // 2, 30)
        if sensor_flags:
            # cross-sensor recipe on synthetic streams: train sensor is
            # VLP-16-like (16 beams, ±15°), val sensor HDL-64E-like
            # (64 beams, −24.8°..2°) unless overridden. FOV is resolved
            # from the known-sensor table or an explicit flag — NEVER
            # guessed from the beam count, so a cross-FOV experiment
            # cannot silently degrade into a same-FOV one.
            known_fov = {16: (-15.0, 15.0), 64: (-24.8, 2.0)}

            def fov_for(beams, explicit, flag):
                if explicit is not None:
                    return tuple(explicit)
                if beams in known_fov:
                    return known_fov[beams]
                parser.error(
                    f"no known vertical FOV for a {beams}-beam sensor; "
                    f"pass {flag} LO HI explicitly")

            tb = args.synthetic_beams or 16
            vb = args.synthetic_val_beams or 64
            tf = fov_for(tb, args.synthetic_fov, "--synthetic-fov")
            vf = fov_for(vb, args.synthetic_val_fov, "--synthetic-val-fov")
            logger.info("Synthetic cross-sensor: train %d beams %s deg, "
                        "val %d beams %s deg", tb, tf, vb, vf)
            train_loaders = [SensorSimLoader(
                n_frames=args.synthetic, seed=0, n_beams=tb,
                beam_fov_deg=tf)]
            val_loaders = [SensorSimLoader(
                n_frames=n_val, seed=1, n_beams=vb, beam_fov_deg=vf)]
        else:
            train_loaders = [SyntheticLoader(n_frames=args.synthetic, seed=0)]
            val_loaders = [SyntheticLoader(n_frames=n_val, seed=1)]
    else:
        train_loaders = _loaders_from_config(config, "train")
        val_loaders = _loaders_from_config(config, "val")
    if not train_loaders:
        parser.error("no training datasets in config (data.datasets.train)")

    trainer = pipeline.train_offline(train_loaders, val_loaders,
                                     n_epochs=args.epochs,
                                     resume=args.resume)
    logger.info("Best validation Recall@1: %.4f", trainer.best_val_metric)
    stats = pipeline.selector.get_statistics()
    logger.info("Keyframe stats: %s", stats)
    return trainer


if __name__ == "__main__":
    main()
