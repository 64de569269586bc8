#!/usr/bin/env python
"""Benchmark CLI: the evaluation suite the reference configured but never
implemented (reference configs/inference.yaml:107-121).

    python run_benchmark.py --config configs/inference.yaml \
        [--checkpoint checkpoints/best_model] [--synthetic N]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--output", default=None, help="results JSON path")
    p.add_argument("--synthetic", type=int, default=0, metavar="N",
                   help="benchmark on N synthetic frames instead of datasets")
    p.add_argument("--platform", default="default",
                   help="Force the jax platform (e.g. 'cpu') — env vars "
                        "alone cannot override plugin-registered backends "
                        "(utils/platform.py)")
    args = p.parse_args(argv)

    from neural_spectral_codec_tpu.utils.platform import force_platform
    force_platform(args.platform)

    from neural_spectral_codec_tpu.evaluation import run_benchmark
    from neural_spectral_codec_tpu.pipeline import _loaders_from_config
    from neural_spectral_codec_tpu.utils.config import load_config
    from neural_spectral_codec_tpu.utils.logging_setup import setup_logging

    setup_logging(None)
    config = load_config(args.config)
    if args.synthetic:
        from neural_spectral_codec_tpu.data.synthetic import SyntheticLoader
        loaders = [SyntheticLoader(n_frames=args.synthetic, seed=0, loops=2.0)]
    else:
        loaders = (_loaders_from_config(config, "test")
                   or _loaders_from_config(config, "val"))
    bench = config.get("benchmark", {})
    out_dir = config.get("system", {}).get("output_dir", "outputs")
    out = args.output or bench.get(
        "results_path", f"{out_dir}/benchmark_results.json")
    if not bench.get("save_results", True) and not args.output:
        out = None
    results = run_benchmark(loaders, config, checkpoint_path=args.checkpoint,
                            results_path=out)
    print(json.dumps(results.get("mean", results), indent=2))
    return results


if __name__ == "__main__":
    main()
