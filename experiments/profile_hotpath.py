#!/usr/bin/env python
"""Stage-by-stage hot-path profile on the real TPU.

Grounds three documentation claims (docs/performance.md):
  1. the headline end-to-end ring-path number (43 µs/scan vs the stale
     21 µs kernel-only figure that leaked into two docs in round 3),
  2. the general sorted path's stage split (where the sort wall is),
  3. the roofline table (bytes moved / lane-stage counts per stage).

Timing uses the two traps' defenses (docs/performance.md): pure-XLA
stages feed outputs back through the loop carry so XLA cannot hoist
them, and every number is the two-point form (t(N)−t(1))/(N−1) to
cancel the ~30 ms tunnel dispatch+fetch constant.

Run:  python experiments/profile_hotpath.py [--iters 30]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_RINGS, PER_RING = 64, 2088
B = 8


def timed_loop(make_many, x, iters):
    """best-of-3 two-point timing of a jitted fori_loop program."""
    import jax

    def run(n):
        fn = make_many(n)
        acc = fn(x)
        assert np.isfinite(float(acc)), "non-finite probe"
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(x))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(iters) - run(1)) / (iters - 1)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.ops import range_image as ri
    from neural_spectral_codec_tpu.ops.ring_path import (
        _ring_keys, encode_points_ring_batch, make_structured_ring_scans,
        project_rings_batch)
    from neural_spectral_codec_tpu.ops.spectral import (
        SpectralEncoderConfig, encode_points_batch)

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    cfg = SpectralEncoderConfig()
    proj = cfg.projection
    alpha = jnp.float32(2.0)
    rows = tuple(range(N_RINGS))
    it = args.iters

    ring_scans = jax.device_put(jnp.asarray(make_structured_ring_scans(
        B, N_RINGS, PER_RING, proj, seed=0)))
    rng = np.random.default_rng(0)
    az = rng.uniform(-np.pi, np.pi, (B, N_RINGS * PER_RING))
    el = rng.uniform(np.deg2rad(-24.8), np.deg2rad(2.0), az.shape)
    r = rng.uniform(2.0, 70.0, az.shape)
    rand_scans = jax.device_put(jnp.asarray(np.stack(
        [r * np.cos(el) * np.cos(az), r * np.cos(el) * np.sin(az),
         r * np.sin(el), rng.uniform(0, 1, az.shape)], axis=2
    ).astype(np.float32)))

    def loop_feedback(body, probe):
        """fori_loop whose NEXT input is a data-dependent function of
        this iteration's output: acc is runtime data, so XLA can neither
        fold the where nor hoist even a pure-XLA body out of the loop
        (CLAUDE.md timing trap #1). acc stays finite, so x never actually
        changes value and every iteration does identical work."""
        def make(n):
            @jax.jit
            def many(x):
                def step(i, carry):
                    acc, x = carry
                    acc = acc + probe(body(x))
                    x = x + jnp.where(jnp.isnan(acc), jnp.float32(1),
                                      jnp.float32(0))
                    return (acc, x)
                acc, _ = jax.lax.fori_loop(0, n, step, (jnp.float32(0), x))
                return acc
            return many
        return make

    us = lambda t: 1e6 * t / B

    # ---- end-to-end -----------------------------------------------------
    t = timed_loop(loop_feedback(
        lambda x: encode_points_ring_batch(x, alpha, cfg, rows),
        lambda o: o.ravel()[0]), ring_scans, it)
    print(f"ring path end-to-end          : {us(t):8.2f} us/scan "
          f"({B / t:,.0f} scans/s)")

    t = timed_loop(loop_feedback(
        lambda x: encode_points_batch(x, alpha, cfg),
        lambda o: o.ravel()[0]), rand_scans, it)
    print(f"general path end-to-end       : {us(t):8.2f} us/scan "
          f"({B / t:,.0f} scans/s)")

    # ---- ring-path stages ----------------------------------------------
    t = timed_loop(loop_feedback(
        lambda x: project_rings_batch(x, proj, rows),
        lambda o: o.ravel()[0]), ring_scans, it)
    print(f"  ring: projection only       : {us(t):8.2f} us/scan")

    # keys only (feed back through x so the trig isn't hoisted)
    def keys_body(x):
        vals, key = _ring_keys(x, proj)
        return vals.ravel()[0] + key.ravel()[1]
    t = timed_loop(loop_feedback(keys_body, lambda o: o), ring_scans, it)
    print(f"  ring: spherical+keys only   : {us(t):8.2f} us/scan")

    # fused kernel only (Pallas call in body — XLA won't hoist it)
    from neural_spectral_codec_tpu.ops.pallas_ring import ring_fold_pallas
    vals, key = _ring_keys(ring_scans, proj)
    ppad = -(-PER_RING // 128) * 128
    key = jnp.pad(key, ((0, 0), (0, 0), (0, ppad - PER_RING)),
                  constant_values=-1.0).reshape(B * N_RINGS, ppad)
    vals = jnp.pad(vals, ((0, 0), (0, 0), (0, ppad - PER_RING)),
                   constant_values=jnp.inf).reshape(B * N_RINGS, ppad)

    kv = jnp.stack([key, vals])

    def make_kernel(n):
        @jax.jit
        def many(kv):
            def step(i, carry):
                acc, kv = carry
                out = ring_fold_pallas(kv[0] + i.astype(jnp.float32) * 0,
                                       kv[1], proj.n_azimuth, 2)
                return (acc + out.ravel()[0], kv)
            acc, _ = jax.lax.fori_loop(0, n, step, (jnp.float32(0), kv))
            return acc
        return many
    t = timed_loop(make_kernel, kv, it)
    print(f"  ring: fused VMEM kernel only: {us(t):8.2f} us/scan")

    # ---- general-path stages --------------------------------------------
    n_pix = proj.n_elevation * proj.n_azimuth
    NPTS = N_RINGS * PER_RING

    def keypack(x):
        rng_, azim, elev, finite = ri._spherical(x)
        valid = finite & (rng_ >= proj.min_range) & (rng_ <= proj.max_range)
        span = proj.elevation_max - proj.elevation_min
        eb = jnp.clip(jnp.floor((elev - proj.elevation_min) / span
                                * proj.n_elevation).astype(jnp.int32),
                      0, proj.n_elevation - 1)
        ab = jnp.clip(jnp.floor(azim / (2 * jnp.pi)
                                * proj.n_azimuth).astype(jnp.int32),
                      0, proj.n_azimuth - 1)
        li = jnp.where(valid, eb * proj.n_azimuth + ab, n_pix)
        v = jnp.where(valid, rng_, jnp.inf).astype(jnp.float32)
        return li.astype(jnp.int32), v

    t = timed_loop(loop_feedback(
        lambda x: keypack(x)[1],
        lambda o: o.ravel()[0]), rand_scans, it)
    print(f"  gen: spherical+keypack only : {us(t):8.2f} us/scan")

    # sort only: feed the sorted (key, val) back as the next input — sort
    # networks are data-oblivious, so timing is unchanged while XLA
    # cannot hoist the body
    li, v = keypack(rand_scans)
    qb = ri._quant_bits(n_pix)
    qmax = (1 << qb) - 1
    quant = jnp.clip((v * (qmax / proj.max_range)).astype(jnp.int32),
                     0, qmax)
    packed = (li << qb) | quant

    def make_sort(n):
        @jax.jit
        def many(kv):
            def step(i, carry):
                acc, (k, v) = carry
                k2, v2 = jax.vmap(
                    lambda kk, vv: jax.lax.sort((kk, vv), num_keys=1)
                )(k, v)
                return (acc + v2.ravel()[0], (k2, v2))
            acc, _ = jax.lax.fori_loop(0, n, step, (jnp.float32(0), kv))
            return acc
        return many
    t = timed_loop(make_sort, (packed, v), it)
    print(f"  gen: packed 1-key sort only : {us(t):8.2f} us/scan "
          f"({t / (B * NPTS) * 1e9:.2f} ns/elem)")

    # one fused batch sort (batch bits in the key) — candidate shave.
    # Use the library's own key layout so the probe measures exactly the
    # packing _segment_min_sorted_batch sorts (a hand-rolled shift here
    # once aliased the batch bits onto the pixel field).
    id_bits, _, qb2 = ri._batch_key_layout(B, n_pix)
    assert qb2 >= 0
    bb = jax.lax.broadcasted_iota(jnp.int32, (B, NPTS), 0)
    packed_b = ((bb << (id_bits + qb2))
                | (li << qb2)
                | (quant >> (qb - qb2))).reshape(1, B * NPTS)
    vb = v.reshape(1, B * NPTS)

    def make_sort1(n):
        @jax.jit
        def many(kv):
            def step(i, carry):
                acc, (k, v) = carry
                k2, v2 = jax.lax.sort((k[0], v[0]), num_keys=1)
                return (acc + v2[0], (k2[None], v2[None]))
            acc, _ = jax.lax.fori_loop(0, n, step, (jnp.float32(0), kv))
            return acc
        return many
    t = timed_loop(make_sort1, (packed_b, vb), it)
    print(f"  gen: ONE fused batch sort   : {us(t):8.2f} us/scan "
          f"({t / (B * NPTS) * 1e9:.2f} ns/elem)")

    # ---- VPU primitive floor: roll+compare+select throughput -------------
    # The ring kernel is a sequence of butterfly roll stages over
    # (rings, lanes) f32 arrays; its speed-of-light is the VPU's
    # roll+select rate at the kernel's own shape. Measure it in Pallas
    # (so nothing is hoisted) at the kernel's block shape: 64 rings x
    # 2112 lanes, B=8 scans -> (512, 2112).
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ROLL_STAGES = 64

    def _roll_kernel(x_ref, o_ref, *, stages):
        x = x_ref[...]
        y = x + 1.0
        for s in range(stages):
            r = pltpu.roll(y, 1 << (s % 11), axis=1)
            y = jnp.where(r < y, r, y)
        o_ref[...] = y

    @jax.jit
    def roll_probe(x, n):
        f = pl.pallas_call(
            functools.partial(_roll_kernel, stages=ROLL_STAGES),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))

        def step(i, carry):
            acc, x = carry
            out = f(x + i.astype(jnp.float32) * 0)
            return (acc + out.ravel()[0], x)
        acc, _ = jax.lax.fori_loop(0, n, step, (jnp.float32(0), x))
        return acc

    lanes = B * N_RINGS * 2112
    xroll = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (B * N_RINGS, 2112))
        .astype(np.float32))

    def make_roll(n):
        return lambda x: float(jax.block_until_ready(roll_probe(x, n)))

    def timed_roll(n):
        fn = make_roll(n)
        fn(xroll)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            fn(xroll)
            best = min(best, time.perf_counter() - t0)
        return best

    t = (timed_roll(it) - timed_roll(1)) / (it - 1)
    per_stage = t / ROLL_STAGES
    print(f"  VPU roll+min floor          : {per_stage * 1e9:8.2f} ns/stage "
          f"over {lanes:,} lanes ({per_stage / lanes * 1e12:.4f} ps/lane-"
          f"stage) — ring kernel ~92 stages -> floor "
          f"{92 * per_stage * 1e6 / B:.1f} us/scan")

    # key-only sort (lower bound for any key-only scheme)
    def make_sortk(n):
        @jax.jit
        def many(k):
            def step(i, carry):
                acc, k = carry
                k2 = jax.vmap(lambda kk: jax.lax.sort((kk,), num_keys=1)[0]
                              )(k)
                return (acc + k2.ravel()[0].astype(jnp.float32), k2)
            acc, _ = jax.lax.fori_loop(0, n, step, (jnp.float32(0), k))
            return acc
        return many
    t = timed_loop(make_sortk, packed, it)
    print(f"  gen: key-ONLY sort          : {us(t):8.2f} us/scan "
          f"({t / (B * NPTS) * 1e9:.2f} ns/elem)")


if __name__ == "__main__":
    main()
