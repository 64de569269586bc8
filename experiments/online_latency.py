#!/usr/bin/env python
"""Serving-latency experiment: the streaming loop-closing path per scan.

The reference's deployment budget is 100 ms per scan (its
configs/inference.yaml:15, surfaced here as ``deployment.max_latency_ms``).
This drives ``NeuralSpectralCodecPipeline.run_online`` — select → encode →
incremental graph add → local GNN refresh → retrieval insert → periodic
two-stage loop closing — over a preloaded synthetic sequence and reports
per-scan wall latency percentiles plus the pipeline's own per-stage means.

Method: frames are pre-generated (loader cost ~0), and a wrapper loader
timestamps each ``__getitem__`` — the gap between consecutive fetches is
exactly the pipeline's processing time for the previous scan. Warmup
scans (jit compiles on first keyframe / first loop-closing call) are
reported separately from steady state.

Run:  python experiments/online_latency.py [--frames 400] [--async]

Caveat for interpreting absolute numbers: this dev setup reaches the TPU
through a tunnel with ~30 ms fixed round-trip per device dispatch; a
keyframe scan makes 2-3 dispatches (encode, local-GNN refresh, row
insert), so ~60-90 ms of the per-scan latency is tunnel overhead that a
co-located production host would not pay. The relative story (what the
framework does per scan, what --async removes from the hot path) holds
either way. Measured numbers live in README ("Online serving latency").
"""

import argparse
import logging
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


class TimedLoader:
    """Preloads all frames, then timestamps each fetch: the gap between
    fetch i and fetch i+1 is the pipeline's processing time for scan i."""

    def __init__(self, base):
        self.frames = [base[i] for i in range(len(base))]
        self.fetch_times = []

    def __len__(self):
        return len(self.frames)

    def __getitem__(self, idx):
        self.fetch_times.append(time.perf_counter())
        return self.frames[idx]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=400)
    p.add_argument("--n-points", type=int, default=16384)
    p.add_argument("--warmup-scans", type=int, default=30,
                   help="leading scans excluded from steady-state stats "
                        "(first-keyframe + first-loop-closing compiles)")
    p.add_argument("--async", dest="async_lc", action="store_true",
                   help="background loop closing: verification off the "
                        "per-scan hot path")
    p.add_argument("--no-fused-query", action="store_true",
                   help="disable the one-dispatch serving step "
                        "(deployment.fused_query) to measure the split "
                        "encode/insert/query dispatch chain instead")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    from neural_spectral_codec_tpu.data.synthetic import SyntheticLoader
    from neural_spectral_codec_tpu.pipeline import NeuralSpectralCodecPipeline
    from neural_spectral_codec_tpu.utils.config import load_config

    cfg = load_config(str(Path(__file__).resolve().parent.parent /
                          "configs" / "inference.yaml"))
    cfg["encoding"].update({"max_points": args.n_points})
    cfg.setdefault("deployment", {})["max_latency_ms"] = 100.0
    if args.no_fused_query:
        cfg["deployment"]["fused_query"] = False
    print(f"one-dispatch serving (deployment.fused_query): "
          f"{not args.no_fused_query}")

    loader = TimedLoader(SyntheticLoader(
        n_frames=args.frames, seed=3, n_points=args.n_points, loops=2.5))
    pipe = NeuralSpectralCodecPipeline(cfg)

    t_start = time.perf_counter()
    pipe.run_online(loader, loop_closure_interval=10,
                    async_loop_closing=args.async_lc)
    t_total = time.perf_counter() - t_start

    ft = np.asarray(loader.fetch_times)
    gaps_ms = np.diff(ft) * 1e3          # gap i = processing time of scan i
    kf_ids = sorted(kf.scan_id for kf in pipe.selector.keyframes)
    is_kf = np.zeros(len(gaps_ms), bool)
    for s in kf_ids:
        if s < len(is_kf):
            is_kf[s] = True

    steady = np.arange(len(gaps_ms)) >= args.warmup_scans
    kf_lat = gaps_ms[is_kf & steady]
    pt_lat = gaps_ms[~is_kf & steady]
    warm_lat = gaps_ms[~steady]

    def stats(x):
        if len(x) == 0:
            return "n/a"
        return (f"p50 {np.percentile(x, 50):6.1f}  "
                f"p95 {np.percentile(x, 95):6.1f}  "
                f"max {x.max():6.1f} ms  (n={len(x)})")

    budget = cfg["deployment"]["max_latency_ms"]
    print(f"\ntotal wall: {t_total:.1f} s for {args.frames} scans "
          f"({1e3 * t_total / args.frames:.1f} ms/scan incl. everything)")
    print(f"warmup scans (first {args.warmup_scans}): {stats(warm_lat)}")
    print(f"steady keyframe scans : {stats(kf_lat)}")
    print(f"steady passthrough    : {stats(pt_lat)}")
    viol = int((kf_lat > budget).sum() + (pt_lat > budget).sum())
    print(f"budget {budget:.0f} ms: {viol} violations after warmup")
    return kf_lat, pt_lat, viol


if __name__ == "__main__":
    main()
