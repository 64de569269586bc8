"""Per-stage-class cost probe for the fused ring kernel (VERDICT r4 #1).

The headline kernel (ops/pallas_ring.py) sustains ~1.74 ps/lane-stage,
~6 VPU issue slots per roll+compare+select whose floor is ~3 —
docs/performance.md declared the remaining ~2x "algorithmic" without
measuring WHICH stage class pays the extra slots. This probe answers
that with ablation deltas: a mirror of the production kernel whose six
stage classes (jump-fill, fold indexing, run-min, rank prefix,
compaction butterfly, expansion butterfly) can be toggled off
individually — every op is data-oblivious, so "full minus variant"
timing is the class's cost — plus bare roll+select floor kernels at the
same shapes to express each class in floor units.

Run on the real TPU (no JAX_PLATFORMS override):
    python experiments/ring_stage_probe.py [--iters 300]

Writes experiments/ring_stage_probe.json and prints a markdown table.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 64


def _variant_kernel(key_ref, val_ref, out_ref, *, p, n_azim, n_folds,
                    wpad, skip, bounds):
    """Mirror of ops/pallas_ring._ring_fold_kernel with per-class toggles.

    ``skip`` is a frozenset of class names to omit. Omitted classes get
    trivially-defined substitutes so downstream classes execute the same
    op sequence on (garbage) data — everything is data-oblivious, so the
    timing delta vs the full kernel is the class's cost. ``bounds`` =
    (fill, runmin, compact, expand) static stage depths, matching the
    production dispatch (round 5: the probe mirrors the post-op-diet,
    bounded-depth kernel; the round-4 table in docs/performance.md was
    taken with the pre-diet mirror at full depths).
    """
    fill_stages, runmin_stages, compact_stages, expand_stages = bounds
    base = 1 << (n_folds * n_azim).bit_length()
    key = key_ref[:]
    m = val_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, p), 1)
    colf32 = col.astype(jnp.float32)
    one = jnp.ones((_ROWS, p), jnp.float32)
    zero = jnp.zeros((_ROWS, p), jnp.float32)

    first_valid = jnp.min(jnp.where(key >= 0.0, colf32, float(p)),
                          axis=1, keepdims=True)

    if "jump" not in skip:
        for j in range(fill_stages):
            key = jnp.where(key < 0.0, pltpu.roll(key, 1 << j, axis=1),
                            key)

    prev = pltpu.roll(key, 1, axis=1)
    startf = jnp.where(((key != prev) | (colf32 == first_valid))
                       & (key >= 0.0), one, zero)

    if "fold" not in skip:
        noninc = ((startf > 0.5) & (colf32 > first_valid)
                  & (key <= prev))
        f = zero
        big = float(p)
        lo = jnp.full((_ROWS, 1), -1.0, jnp.float32)
        for _ in range(n_folds):
            pos_k = jnp.min(jnp.where(noninc & (colf32 > lo), colf32, big),
                            axis=1, keepdims=True)
            f = f + jnp.where(colf32 >= pos_k, one, zero)
            lo = pos_k
    else:
        f = zero

    fkey = key + float(n_azim) * f

    if "runmin" not in skip:
        for j in range(runmin_stages):
            sh = 1 << j
            back = p - sh
            fkey_s = pltpu.roll(fkey, back, axis=1)
            m_s = pltpu.roll(m, back, axis=1)
            m = jnp.where(fkey_s == fkey, jnp.minimum(m, m_s), m)

    flagged = (startf > 0.5) & jnp.isfinite(m) & (f <= float(n_folds - 1))
    flagf = jnp.where(flagged, one, zero)

    if "rank" not in skip:
        incl = flagf
        sh = 1
        while sh < p:
            incl = incl + jnp.where(col >= sh,
                                    pltpu.roll(incl, sh, axis=1), 0.0)
            sh *= 2
        rank = incl - flagf
    else:
        rank = zero

    valp = jnp.where(flagged, m, 0.0)
    packed = jnp.where(flagged,
                       (colf32 - rank) * float(base) + (fkey - rank + 1.0),
                       0.0)
    if "compact" not in skip:
        for k in range(compact_stages):
            step = 1 << k
            m_mod = float(base) * (2 << k)
            r = packed - m_mod * jnp.floor(packed * (1.0 / m_mod))
            moving = r >= float(base) * float(step)
            mv = jnp.where(moving, one, zero)
            back = p - step
            inc = pltpu.roll(mv, back, axis=1) > 0.5
            valp = jnp.where(inc, pltpu.roll(valp, back, axis=1),
                             jnp.where(moving, zero, valp))
            packed = jnp.where(inc, pltpu.roll(packed, back, axis=1),
                               jnp.where(moving, zero, packed))

    d1e = packed - float(base) * jnp.floor(packed * (1.0 / float(base)))

    if p >= wpad:
        valw = valp[:, :wpad]
        d1w = d1e[:, :wpad]
    else:
        padz = jnp.zeros((_ROWS, wpad - p), jnp.float32)
        valw = jnp.concatenate([valp, padz], axis=1)
        d1w = jnp.concatenate([d1e, padz], axis=1)
    if "expand" not in skip:
        onew = jnp.ones((_ROWS, wpad), jnp.float32)
        zerow = jnp.zeros((_ROWS, wpad), jnp.float32)
        for k in reversed(range(expand_stages)):
            step = 1 << k
            moving = d1w >= float(step + 1)
            mv = jnp.where(moving, onew, zerow)
            inc = pltpu.roll(mv, step, axis=1) > 0.5
            valw = jnp.where(inc, pltpu.roll(valw, step, axis=1),
                             jnp.where(moving, zerow, valw))
            d1w = jnp.where(inc, pltpu.roll(d1w, step, axis=1)
                            - float(step),
                            jnp.where(moving, zerow, d1w))
    out_ref[:] = valw + 0.0 * d1w   # keep d1w live under every toggle


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _variant_call(key, vals, n_azim, n_folds, skip, bounds):
    n, p = key.shape
    wpad = -(-(n_folds * n_azim) // 128) * 128
    kernel = functools.partial(_variant_kernel, p=p, n_azim=n_azim,
                               n_folds=n_folds, wpad=wpad, skip=skip,
                               bounds=bounds)
    return pl.pallas_call(
        kernel,
        grid=(n // _ROWS,),
        in_specs=[pl.BlockSpec((_ROWS, p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((_ROWS, wpad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, wpad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(key, vals)


def _floor_kernel(x_ref, y_ref, out_ref, *, n_stages, n_arrays, p):
    """n_stages of (roll + compare + select) over n_arrays carried
    arrays — the measured floor unit the classes are compared against."""
    a = x_ref[:]
    b = y_ref[:]
    sh = 1
    for _ in range(n_stages):
        a_s = pltpu.roll(a, p - (sh % p or 1), axis=1)
        if n_arrays == 2:
            b_s = pltpu.roll(b, p - (sh % p or 1), axis=1)
            take = a_s < a
            a = jnp.where(take, a_s, a)
            b = jnp.where(take, b_s, b)
        else:
            a = jnp.where(a_s < a, a_s, a)
        sh *= 2
    out_ref[:] = a + b


@functools.partial(jax.jit, static_argnums=(2, 3))
def _floor_call(x, y, n_stages, n_arrays):
    n, p = x.shape
    kernel = functools.partial(_floor_kernel, n_stages=n_stages,
                               n_arrays=n_arrays, p=p)
    return pl.pallas_call(
        kernel,
        grid=(n // _ROWS,),
        in_specs=[pl.BlockSpec((_ROWS, p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((_ROWS, p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, p), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, y)


def measure(fn, args, iters):
    """bench.py's hoist-proof two-point device-resident timing."""
    def timed(n_iters):
        @jax.jit
        def many(args):
            def body(i, carry):
                acc, a = carry
                acc = acc + fn(a).ravel()[0]
                bump = jnp.where(jnp.isnan(acc), jnp.float32(1),
                                 jnp.float32(0))
                a = tuple(x + bump for x in a)
                return (acc, a)
            acc, _ = jax.lax.fori_loop(0, n_iters, body,
                                       (jnp.float32(0), args))
            return acc

        acc = many(args)
        assert np.isfinite(float(acc)), "probe produced NaN"
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            acc = many(args)
            assert np.isfinite(float(acc))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(iters) - timed(1)) / (iters - 1)


CLASSES = ("jump", "fold", "runmin", "rank", "compact", "expand")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from neural_spectral_codec_tpu.ops.range_image import ProjectionConfig
    from neural_spectral_codec_tpu.ops.ring_path import (
        _ring_keys, make_structured_ring_scans, ring_stage_bounds)
    from neural_spectral_codec_tpu.ops.pallas_ring import ring_fold_pallas

    print(f"backend: {jax.default_backend()}", file=sys.stderr, flush=True)
    config = ProjectionConfig()
    scans = make_structured_ring_scans(args.batch, 64, 2088, config, seed=0)
    vals, key = _ring_keys(jnp.asarray(scans), config)
    ppad = -(-2088 // 128) * 128   # 2176
    key = jnp.pad(key, ((0, 0), (0, 0), (0, ppad - 2088)),
                  constant_values=-1.0)
    vals = jnp.pad(vals, ((0, 0), (0, 0), (0, ppad - 2088)),
                   constant_values=jnp.inf)
    key = key.reshape(-1, ppad)
    vals = vals.reshape(-1, ppad)
    n_azim, n_folds = config.n_azimuth, 2
    bounds = ring_stage_bounds(scans, config)
    print(f"certified bounds (fill, runmin, compact, expand): {bounds}",
          file=sys.stderr, flush=True)
    stage_counts = dict(zip(("jump", "runmin", "compact", "expand"),
                            bounds), fold=n_folds, rank=12)

    # sanity: the no-skip variant reproduces the production kernel
    ref = np.asarray(ring_fold_pallas(key, vals, n_azim, n_folds, False,
                                      *bounds))
    got = np.asarray(_variant_call(key, vals, n_azim, n_folds,
                                   frozenset(), bounds))
    assert np.array_equal(ref, got), "variant kernel diverged from production"
    print("variant==production: ok", file=sys.stderr, flush=True)

    results = {}
    t_full = measure(
        lambda a: _variant_call(a[0], a[1], n_azim, n_folds, frozenset(),
                                bounds),
        (key, vals), args.iters)
    results["full"] = t_full
    print(f"full: {1e6 * t_full / args.batch:.2f} us/scan",
          file=sys.stderr, flush=True)

    for cls in CLASSES:
        t = measure(
            lambda a, c=cls: _variant_call(a[0], a[1], n_azim, n_folds,
                                           frozenset([c]), bounds),
            (key, vals), args.iters)
        results[f"minus_{cls}"] = t
        print(f"minus {cls}: {1e6 * t / args.batch:.2f} us/scan "
              f"(class cost {1e6 * (t_full - t) / args.batch:.2f})",
              file=sys.stderr, flush=True)

    # floors: bare roll+compare+select chains at MATCHED stage counts
    # and widths (per-class fixed overheads — loop fill/drain, setup —
    # dominate short loops, so a 12-stage floor under-states the floor
    # of a 4-stage class)
    f32 = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (key.shape[0], ppad)).astype(np.float32))
    g32 = f32 + 1.0
    wpad = -(-(n_folds * n_azim) // 128) * 128
    fw = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, (key.shape[0], wpad)).astype(np.float32))
    gw = fw + 1.0
    floor_specs = {
        "floor_12stage_1array": (12, 1, (f32, g32)),
        "floor_12stage_2array": (12, 2, (f32, g32)),
        f"floor_{bounds[0]}stage_1array": (bounds[0], 1, (f32, g32)),
        f"floor_{bounds[1]}stage_2array": (bounds[1], 2, (f32, g32)),
        f"floor_{bounds[2]}stage_2array": (bounds[2], 2, (f32, g32)),
        f"floor_{bounds[3]}stage_2array_w{wpad}":
            (bounds[3], 2, (fw, gw)),
    }
    floors = {}
    for name, (ns, na, arrs) in floor_specs.items():
        t = measure(lambda a, ns=ns, na=na: _floor_call(a[0], a[1], ns,
                                                        na),
                    arrs, args.iters)
        results[name] = t
        floors[name] = t
        print(f"{name}: {1e6 * t / args.batch:.2f} us/scan-equiv",
              file=sys.stderr, flush=True)
    t_f1 = results["floor_12stage_1array"]
    matched_floor = {
        "jump": floors[f"floor_{bounds[0]}stage_1array"],
        "runmin": floors[f"floor_{bounds[1]}stage_2array"],
        "rank": floors["floor_12stage_1array"],
        "compact": floors[f"floor_{bounds[2]}stage_2array"],
        "expand": floors[f"floor_{bounds[3]}stage_2array_w{wpad}"],
    }

    b = args.batch
    table = {k: round(1e6 * v / b, 3) for k, v in results.items()}
    out = {
        "batch": b, "iters": args.iters, "p": ppad, "n_folds": n_folds,
        "us_per_scan": table,
        "class_cost_us": {
            cls: round(1e6 * (t_full - results[f"minus_{cls}"]) / b, 3)
            for cls in CLASSES},
        "stage_counts": stage_counts,
        "bounds": list(bounds),
    }
    path = Path(__file__).parent / "ring_stage_probe.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))

    out["matched_floor_ratio"] = {
        cls: round(out["class_cost_us"][cls]
                   / (1e6 * matched_floor[cls] / b), 2)
        for cls in matched_floor}
    path.write_text(json.dumps(out, indent=2))

    print("\n| class | stages | cost us/scan | matched floor us | "
          "ratio |")
    print("|---|---|---|---|---|")
    for cls in CLASSES:
        c = out["class_cost_us"][cls]
        ns = stage_counts[cls]
        if cls in matched_floor:
            fl = 1e6 * matched_floor[cls] / b
            print(f"| {cls} | {ns} | {c:.2f} | {fl:.2f} | "
                  f"{c / fl:.2f}x |")
        else:
            print(f"| {cls} | {ns} | {c:.2f} | n/a | n/a |")


if __name__ == "__main__":
    main()
