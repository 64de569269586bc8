"""Headline benchmark: end-to-end descriptor extraction throughput.

Measures the full per-scan hot path on device — scatter-min panoramic
projection → circular interpolation → rFFT magnitudes → exponential
histogram binning → normalization (ops/spectral.encode_points_batch) —
batched over scans, and reports scans/sec on one chip.

Baseline: the reference's own target of <10 ms/scan on GPU
(configs/training.yaml:98), i.e. 100 scans/s. ``vs_baseline`` is the
speedup over that. (The driver's north star is 10k scans/s/chip = 100×.)

Prints exactly ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    # persistent compile cache: reruns skip the ~minutes-long first compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.ops.spectral import (
        SpectralEncoderConfig, encode_points_batch)

    print(f"backend: {jax.default_backend()} devices: {jax.devices()}",
          file=sys.stderr)

    config = SpectralEncoderConfig()
    alpha = jnp.float32(2.0)
    batch, n_points = 256, 16384

    rng = np.random.default_rng(0)
    az = rng.uniform(-np.pi, np.pi, (batch, n_points))
    el = rng.uniform(np.deg2rad(-24.8), np.deg2rad(2.0), (batch, n_points))
    r = rng.uniform(2.0, 70.0, (batch, n_points))
    pts = np.stack([r * np.cos(el) * np.cos(az),
                    r * np.cos(el) * np.sin(az),
                    r * np.sin(el),
                    rng.uniform(0, 1, (batch, n_points))],
                   axis=2).astype(np.float32)
    scans = jax.device_put(jnp.asarray(pts))

    def run(iters: int) -> float:
        """Time ``iters`` dispatches, synced by fetching a scalar that
        depends on every iteration (block_until_ready is unreliable for
        queued work on the tunneled TPU platform)."""
        acc = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = encode_points_batch(scans, alpha, config)
            acc = acc + out[0, 0]
        assert np.isfinite(float(acc))
        return time.perf_counter() - t0

    run(1)  # warm-up / compile
    per_iter = run(1)
    iters = max(3, min(500, int(3.0 / max(per_iter, 1e-3))))
    elapsed = run(iters)

    scans_per_sec = batch * iters / elapsed
    print(f"{iters} iters x {batch} scans in {elapsed:.3f}s "
          f"({1e3 * elapsed / (batch * iters):.4f} ms/scan)", file=sys.stderr)

    print(json.dumps({
        "metric": "descriptor_extraction_throughput",
        "value": round(scans_per_sec, 1),
        "unit": "scans/sec/chip",
        "vs_baseline": round(scans_per_sec / 100.0, 2),
    }))


if __name__ == "__main__":
    main()
