#!/usr/bin/env python
"""Block-shape sweep for the ring kernel's operating point.

Two knobs the round-3 sweeps fixed under the OLD (pre-op-diet,
full-depth) kernel: the batch size (B=8 won then) and the rings-per-
program block height (_ROWS=64 won then). The round-5 kernel does ~45%
less work per lane, which can move both optima — re-sweep with the
jitter-proof methodology.

Run per _ROWS value in a FRESH process (the constant binds at import):
    python experiments/ring_block_sweep.py                # B sweep @ ROWS=64
    NSC_RING_ROWS=128 python experiments/ring_block_sweep.py --batches 8
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def measure(fn, x, iters):
    import jax
    import jax.numpy as jnp

    def timed(n_iters):
        @jax.jit
        def many(x):
            def body(i, carry):
                acc, x = carry
                acc = acc + fn(x).ravel()[0]
                x = x + jnp.where(jnp.isnan(acc), jnp.float32(1),
                                  jnp.float32(0))
                return (acc, x)
            acc, _ = jax.lax.fori_loop(0, n_iters, body,
                                       (jnp.float32(0), x))
            return acc

        acc = many(x)
        assert np.isfinite(float(acc))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            acc = many(x)
            assert np.isfinite(float(acc))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(iters) - timed(1)) / (iters - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*",
                    default=[4, 8, 16, 32])
    ap.add_argument("--iters", type=int, default=300)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.ops.pallas_ring import _ROWS
    from neural_spectral_codec_tpu.ops.ring_path import (
        encode_points_ring_batch, make_structured_ring_scans,
        ring_stage_bounds)
    from neural_spectral_codec_tpu.ops.spectral import SpectralEncoderConfig

    config = SpectralEncoderConfig()
    alpha = jnp.float32(2.0)
    rows = tuple(range(64))
    print(f"backend: {jax.default_backend()}  _ROWS={_ROWS}", flush=True)

    for b in args.batches:
        scans = make_structured_ring_scans(b, 64, 2088, config.projection,
                                           seed=0)
        bounds = ring_stage_bounds(scans, config.projection)
        x = jnp.asarray(scans)
        # iters scaled so device work stays ~100 ms per timed call
        iters = max(int(args.iters * 8 / b), 40)
        t = measure(lambda x: encode_points_ring_batch(
            x, alpha, config, rows, 2, bounds), x, iters) / b
        print(f"B={b:<3d} ROWS={_ROWS:<4d} bounds={bounds}: "
              f"{1e6 * t:6.2f} us/scan = {1 / t:7.0f} scans/s", flush=True)


if __name__ == "__main__":
    main()
