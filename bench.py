"""Headline benchmark: end-to-end descriptor extraction throughput.

Measures the full per-scan hot path on device at FULL HDL-64E density
(64 rings x 2088 returns = 133,632 points — a raw KITTI scan), using the
ring-structured fast path (ops/ring_path.py): real spinning-LiDAR streams
are ring-major with azimuth monotone per ring, which reduces the
per-pixel scatter-min to segmented circular run-mins in one VMEM Pallas
kernel — no global sort. The bench input is a synthetic ring-major
stream satisfying that structure contract (verified at startup with
``ring_structure_report``); the hot path's roll/compare networks are
data-oblivious, so timing transfers to real streams. Output is
bit-identical to the general sorted path (tests/test_ring_path.py and
the in-bench assertion below).

Why full density is the headline (changed in round 3): the retrieval
experiment in docs/density_defense.md showed azimuth decimation is NOT
free at the retrieval level (stride 4: R@1 0.978 -> 0.839 on the
synthetic revisit protocol), so the defended operating point is full
density — and the ring path makes full density fast instead of arguing
the decimation away. Arbitrary-order point clouds take the general
sorted path (ops/range_image.py), reported on stderr.

Baseline: the reference's own target of <10 ms/scan on GPU
(configs/training.yaml:98) at its native KITTI density, i.e. 100
scans/s. ``vs_baseline`` is the speedup over that. (The driver's north
star is 10k scans/s/chip = 100x.)

Timing: the iteration loop runs ON DEVICE (lax.fori_loop whose next
input depends on this iteration's output, so XLA cannot hoist the
body) —
host dispatch/tunnel latency is excluded, and the final scalar fetch
synchronizes everything. Two-point form (t(N) - t(1)) / (N - 1) cancels
the ~30 ms constant dispatch+fetch cost per jit call on the tunnel.

Prints exactly ONE JSON line on stdout; diagnostics go to stderr.

Robustness (round 4, after BENCH_r03 died on a transiently-unavailable
axon lease at first backend touch): the measurement runs in a CHILD
process and the parent retries with bounded backoff — a fresh process
per attempt because JAX caches backend-init failures in-process.
Supervision is TWO-PHASE: the child prints a marker after its first
successful backend touch; before the marker a hang means the lease is
wedged and the child is killed quickly + safely (no compile in flight)
and retried — many cheap attempts ride out multi-minute lease resets —
while after the marker the child is killed only after RUN_STALL_S with
ZERO stderr activity (heartbeats print between stages, so the longest
legitimate silence is one Mosaic compile) or the absolute cap: a fixed
run deadline once fired mid-compile and wedged the lease for everyone
(CLAUDE.md). Fast pre-marker EXITS are split by stderr: transient
backend errors (UNAVAILABLE — the BENCH_r03 failure) keep the patient
retries; deterministic errors fail fast.
On final failure the parent still prints one structured JSON line
(value 0 + ``error``) and exits nonzero, so the driver records a
diagnosis instead of a null parse.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# Wedge-aware two-phase supervision: the child prints NSC_BACKEND_OK
# after its first successful backend touch. Until that marker, killing
# the child is SAFE (no compile in flight) and a hang means the axon
# lease is wedged — detect it in INIT_TIMEOUT_S and retry with backoff,
# riding out multi-minute lease resets instead of burning the whole
# budget on one doomed attempt. AFTER the marker, the child may be deep
# in a minutes-long Mosaic compile (killing there can wedge the lease,
# CLAUDE.md), so only the generous RUN_TIMEOUT_S applies.
INIT_TIMEOUT_S = 180
RUN_STALL_S = 1500               # run-phase kill only after this long with
                                 # ZERO stderr activity (a Mosaic compile is
                                 # minutes; heartbeats in main() reset this)
RUN_TIMEOUT_S = 3600             # absolute run-phase cap (last resort)
INIT_ATTEMPTS = 10               # attempts that HUNG before the marker
REAL_ATTEMPTS = 3                # attempts that errored/exited/stalled
BACKOFFS_S = (20, 45, 90, 120, 180, 240, 300, 300, 300)
BACKEND_MARKER = "NSC_BACKEND_OK"
CHILD_CMD = None                 # test hook: overrides the child command

N_RINGS = 64
PER_RING = 2088           # HDL-64E azimuth returns per ring
FULL_N = N_RINGS * PER_RING          # 133,632
# batch sweep (2026-08-17, docs/performance.md): per-scan cost is LOWEST at
# B=8 (~44 us vs ~55 at B=64 for the ring path; the general sorted path
# prefers it too) - smaller working sets alternate better between the XLA
# keys fusion and the Mosaic grid. Throughput is still sustained: the
# timing loop keeps the device busy end to end.
BENCH_B = 8


def make_random_scans(batch, n_points, seed=0):
    """Arbitrary-order uniform scans for the general sorted path."""
    rng = np.random.default_rng(seed)
    az = rng.uniform(-np.pi, np.pi, (batch, n_points))
    el = rng.uniform(np.deg2rad(-24.8), np.deg2rad(2.0), (batch, n_points))
    r = rng.uniform(2.0, 70.0, (batch, n_points))
    return np.stack([r * np.cos(el) * np.cos(az),
                     r * np.cos(el) * np.sin(az),
                     r * np.sin(el),
                     rng.uniform(0, 1, (batch, n_points))],
                    axis=2).astype(np.float32)


def main():
    import jax
    # persistent compile cache: reruns skip the ~minutes-long first compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.ops.ring_path import (
        encode_points_ring_batch, make_structured_ring_scans,
        ring_stage_bounds, ring_structure_report)
    from neural_spectral_codec_tpu.ops.spectral import (
        SpectralEncoderConfig, encode_points_batch)

    print(f"backend: {jax.default_backend()} devices: {jax.devices()}",
          file=sys.stderr)
    print(BACKEND_MARKER, file=sys.stderr, flush=True)

    config = SpectralEncoderConfig()
    alpha = jnp.float32(2.0)
    rows = tuple(range(N_RINGS))

    def measure(fn, x, batch, iters):
        def timed(n_iters):
            @jax.jit
            def many(x):
                # The next iteration's input is a data-dependent function
                # of this iteration's output (acc is runtime data, so the
                # where can't be folded) — XLA cannot hoist even a
                # pure-XLA body like the general path's sort out of the
                # loop (CLAUDE.md timing trap #1). acc stays finite, so x
                # never actually changes and every iteration does
                # identical work.
                def body(i, carry):
                    acc, x = carry
                    acc = acc + fn(x).ravel()[0]
                    x = x + jnp.where(jnp.isnan(acc), jnp.float32(1),
                                      jnp.float32(0))
                    return (acc, x)
                acc, _ = jax.lax.fori_loop(0, n_iters, body,
                                           (jnp.float32(0), x))
                return acc

            acc = many(x)                  # compile + warm
            assert np.isfinite(float(acc))
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                acc = many(x)
                assert np.isfinite(float(acc))
                best = min(best, time.perf_counter() - t0)
            return best

        per_iter = (timed(iters) - timed(1)) / (iters - 1)
        return batch / per_iter, 1e6 * per_iter / batch

    # ---- headline: full density, ring-structured stream ----------------
    scans = make_structured_ring_scans(BENCH_B, N_RINGS, PER_RING,
                                       config.projection, seed=0)
    rep = ring_structure_report(scans[:2], config.projection, rows)
    assert rep["ok"] and rep["max_folds_needed"] <= 2, rep
    # host-certified bounded doubling depths for THIS input (exactness
    # conditions in ring_stage_bounds; the parity assertion below checks
    # the bounded kernel against the general path bit-for-bit)
    bounds = ring_stage_bounds(scans, config.projection)
    print(f"certified stage bounds (fill, runmin): {bounds}",
          file=sys.stderr, flush=True)
    x = jax.device_put(jnp.asarray(scans))

    # output parity ring vs general on this exact input (bit-identical)
    print("parity check: compiling ring + general paths...",
          file=sys.stderr, flush=True)
    d_ring = np.asarray(encode_points_ring_batch(x[:8], alpha, config,
                                                 rows, 2, bounds))
    d_gen = np.asarray(encode_points_batch(
        x[:8].reshape(8, -1, 4), alpha, config))
    assert np.array_equal(d_ring, d_gen), "ring path diverged from general"

    # iters sized so on-device work (iters x B x ~40 us) dominates the
    # ~30 ms tunnel RTT whose run-to-run jitter otherwise leaks into the
    # two-point subtraction: at iters=40 (round 3) repeated runs spread
    # 22.9-31.4 us/scan; at 300 the device loop is ~100 ms and the
    # residual jitter is < 0.1 us/scan.
    print("measuring ring path (timing-loop compiles)...",
          file=sys.stderr, flush=True)
    sps, us = measure(
        lambda x: encode_points_ring_batch(x, alpha, config, rows, 2,
                                           bounds),
        x, BENCH_B, iters=300)
    print(f"FULL density N={FULL_N} ring-structured stream (ring path): "
          f"{us:.2f} us/scan = {sps:.0f} scans/s "
          f"({sps * FULL_N * 16 / 1e9:.1f} GB/s input stream)",
          file=sys.stderr)

    # ---- secondary: general sorted path (arbitrary point order) --------
    print("measuring general sorted path...", file=sys.stderr, flush=True)
    rnd = jax.device_put(jnp.asarray(make_random_scans(BENCH_B, FULL_N)))
    gsps, gus = measure(
        lambda x: encode_points_batch(x, alpha, config), rnd, BENCH_B,
        iters=50)
    print(f"FULL density N={FULL_N} arbitrary-order (general sorted "
          f"path): {gus:.2f} us/scan = {gsps:.0f} scans/s — the packed "
          f"1-key sort is ~2/3 of its runtime; ring-structured input "
          f"avoids it entirely", file=sys.stderr)

    print(json.dumps({
        "metric": "descriptor_extraction_throughput_full_density",
        "value": round(sps, 1),
        "unit": "scans/sec/chip",
        "vs_baseline": round(sps / 100.0, 2),
    }))


def _run_child():
    """One supervised child attempt. Returns
    (phase, rc, stdout, stderr_lines) where phase is 'init' if the child
    never printed BACKEND_MARKER (hang/kill there is wedge-safe) or
    'run' once it did."""
    import threading

    env = dict(os.environ, NSC_BENCH_CHILD="1")
    cmd = CHILD_CMD or [sys.executable, os.path.abspath(__file__)]
    proc = subprocess.Popen(
        cmd, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    err_lines = []
    marker_seen = threading.Event()
    last_activity = [time.time()]

    def drain_err():
        for ln in proc.stderr:
            err_lines.append(ln)
            last_activity[0] = time.time()
            if BACKEND_MARKER in ln:
                marker_seen.set()

    out_box = []

    def drain_out():
        out_box.append(proc.stdout.read())

    te = threading.Thread(target=drain_err, daemon=True)
    to = threading.Thread(target=drain_out, daemon=True)
    te.start()
    to.start()

    deadline = time.time() + INIT_TIMEOUT_S
    while (not marker_seen.is_set() and proc.poll() is None
           and time.time() < deadline):
        marker_seen.wait(0.5)
    if not marker_seen.is_set() and proc.poll() is None:
        # Backend init is hung (wedged lease). No compile can be in
        # flight before the marker, so killing here is safe.
        proc.kill()
        proc.wait()
        te.join(5)
        to.join(5)
        return "init", None, "", err_lines
    # Run phase: kill only on a genuine stall — no stderr activity for
    # RUN_STALL_S (main() prints a heartbeat between stages, and the
    # longest silent window is one Mosaic compile, minutes) — or past the
    # absolute cap. A fixed-deadline kill here once fired mid-compile and
    # wedged the lease server-side for everyone (CLAUDE.md).
    run_deadline = time.time() + RUN_TIMEOUT_S
    while proc.poll() is None:
        if (time.time() - last_activity[0] > RUN_STALL_S
                or time.time() > run_deadline):
            proc.kill()    # last resort; a >RUN_STALL_S silent child is
            proc.wait()    # hung, not compiling
            te.join(5)
            to.join(5)
            return "run", None, "".join(out_box), err_lines
        time.sleep(1)
    rc = proc.wait()
    te.join(10)
    to.join(10)
    phase = "run" if marker_seen.is_set() else "init"
    return phase, rc, "".join(out_box) if out_box else "", err_lines


def supervise():
    """Run main() in retried child processes (see module docstring):
    init-phase hangs (wedged lease) are detected in INIT_TIMEOUT_S and
    retried up to INIT_ATTEMPTS times; failures after backend init
    (real errors) get REAL_ATTEMPTS tries."""
    last_tail = ""
    init_fails = real_fails = 0
    attempt = 0
    while init_fails < INIT_ATTEMPTS and real_fails < REAL_ATTEMPTS:
        if attempt:
            delay = BACKOFFS_S[min(attempt - 1, len(BACKOFFS_S) - 1)]
            print(f"bench attempt {attempt} failed ({last_tail}); "
                  f"retrying in {delay}s", file=sys.stderr)
            time.sleep(delay)
        attempt += 1
        phase, rc, stdout, err_lines = _run_child()
        stderr = "".join(err_lines)
        sys.stderr.write(stderr)
        if rc is None:
            if phase == "init":
                init_fails += 1
                last_tail = (f"backend init hung >{INIT_TIMEOUT_S}s "
                             f"(axon lease wedged?)")
            else:
                real_fails += 1
                last_tail = (f"run stalled >{RUN_STALL_S}s silent or "
                             f"exceeded {RUN_TIMEOUT_S}s")
            continue
        line = next((ln for ln in stdout.splitlines()
                     if ln.startswith("{")), None)
        if rc == 0 and line is not None:
            print(line)
            return 0
        # The child EXITED with an error. Transient backend-init errors
        # (BENCH_r03 died fast with UNAVAILABLE at first backend touch)
        # deserve the patient wedge-riding retries; anything else — an
        # import error, a parity assertion — is deterministic and gets
        # only the few real-failure attempts instead of ~27 min of
        # backoff sleep before the diagnosis is printed.
        transient = phase == "init" and any(
            s in stderr for s in ("UNAVAILABLE", "DEADLINE_EXCEEDED",
                                  "backend setup", "Unable to initialize"))
        if transient:
            init_fails += 1
        else:
            real_fails += 1
        tail = (stderr.strip().splitlines() or ["no stderr"])[-1]
        last_tail = f"rc={rc}: {tail[-300:]}"
    print(json.dumps({
        "metric": "descriptor_extraction_throughput_full_density",
        "value": 0,
        "unit": "scans/sec/chip",
        "vs_baseline": 0,
        "error": f"{attempt} attempts failed ({init_fails} in backend "
                 f"init, {real_fails} after); last: {last_tail}",
    }))
    return 1


if __name__ == "__main__":
    if os.environ.get("NSC_BENCH_CHILD") == "1":
        main()
    else:
        sys.exit(supervise())
