"""Pallas TPU kernel: the FULL ring-path per-ring pipeline in one VMEM pass.

The XLA formulation of the ring fast path (ops/ring_path._ring_run_starts
+ densify) runs ~35 roll+select stages over (B·R, P) f32 arrays — each a
full HBM round trip (~4 us/scan/stage at full HDL-64E density, ~140
us/scan total, measured). Earlier revisions split the work across three
kernels (ring stage chain → monotone compaction → butterfly expansion),
which still round-tripped the (col_f, m) run arrays through HBM twice.
This kernel runs the WHOLE chain per ring — circular jump-fill, fold
positions, segmented run-min on folded keys, run starts, in-VMEM rank
prefix + leftward compaction butterfly, and rightward expansion into the
ring's own folded-image row — in a single program: one HBM read of
(key, val), one write of the dense (n_folds·n_azim)-wide folded row.

Why per-ring compaction needs no cross-ring merge: a ring's folded
targets are strictly increasing values in [0, n_folds·n_azim), so a ring
emits at most one start per folded column — its compact prefix and its
expansion window are both bounded by the ring's own folded row. Rings
never interact (they own disjoint image rows).

Mosaic-safety (CLAUDE.md): every rolled array rides as f32 (keys, mins,
0/1 flags, displacements — all < 2^24, exact); ``pltpu.roll`` is
circular; leftward rolls are expressed as ``roll(x, P − s)``; flags ride
inside payloads as +1 sentinels and the static compaction displacement
packs with the expansion payload, so each butterfly rolls only TWO
arrays per stage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rings per Pallas program: per-op fixed overheads dominate at narrow
# blocks (measured 34 us/scan at 8 rows -> 21 at 64; flat beyond), and 64
# rows = one full HDL-64E scan per program, so the online B=1 path wastes
# no padding. VMEM at (64, 2176) x ~8 live arrays is ~4.5 MB.
# NSC_RING_ROWS overrides for block-shape experiments
# (experiments/ring_block_sweep.py) — production default stays 64.
import os

_ROWS = int(os.environ.get("NSC_RING_ROWS", "64"))


def _ring_fold_kernel(key_ref, val_ref, out_ref, *, p, n_azim, n_folds,
                      wpad, fill_stages, runmin_stages, compact_stages,
                      expand_stages):
    # packing base for the compaction payload: smallest power of two
    # above the max expansion displacement+1; exactness needs
    # p * base < 2^24 (guarded in ring_fold_pallas)
    base = 1 << (n_folds * n_azim).bit_length()
    key = key_ref[:]
    m = val_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, p), 1)
    colf32 = col.astype(jnp.float32)
    one = jnp.ones((_ROWS, p), jnp.float32)
    zero = jnp.zeros((_ROWS, p), jnp.float32)

    # first RAW-valid position (before fill): the circular run boundary
    # sits here when leading holes adopt the tail key — fold events at
    # or before it are phantom wrap events (see _ring_run_starts)
    first_valid = jnp.min(jnp.where(key >= 0.0, colf32, float(p)),
                          axis=1, keepdims=True)

    # 1. circular jump-fill: holes (key < 0) adopt the nearest valid key
    #    to the left. ``fill_stages`` may be bounded below log2(p) when
    #    the host proved every INTERIOR hole run (one with a valid lane
    #    after it in the same ring) is shorter than 2^fill_stages
    #    (ring_path.ring_stage_bounds): leading holes left unfilled are
    #    never starts and never noninc events (col > first_valid gates
    #    both), and trailing holes only ever adopt +inf values — both
    #    exactly as under the full fill.
    for j in range(fill_stages):
        key = jnp.where(key < 0.0, pltpu.roll(key, 1 << j, axis=1), key)

    # 2. run starts on raw keys; the first RAW-valid position is ALWAYS
    #    a start (wrap-run head pieces and circularly-constant rings);
    #    leading holes never emit starts — forcing column 0 instead
    #    creates a phantom duplicate of the final run's target on
    #    zero-wrap rings (see ring_path._ring_run_starts)
    prev = pltpu.roll(key, 1, axis=1)
    startf = jnp.where(((key != prev) | (colf32 == first_valid))
                       & (key >= 0.0), one, zero)

    # 3. per-position fold index from event-position min-reduces
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

    fkey = key + float(n_azim) * f

    # 4. segmented run-min: forward doubling on the folded key (non-
    #    decreasing along the ring → endpoint equality implies window
    #    uniformity, no carry needed). ``runmin_stages`` may be bounded
    #    when the host proved every run's last FINITE member lies within
    #    2^runmin_stages of its start — holes beyond the window carry
    #    +inf and never affect the min.
    for j in range(runmin_stages):
        sh = 1 << j
        back = p - sh                       # roll left by sh
        fkey_s = pltpu.roll(fkey, back, axis=1)
        m_s = pltpu.roll(m, back, axis=1)
        m = jnp.where(fkey_s == fkey, jnp.minimum(m, m_s), m)

    flagged = (startf > 0.5) & jnp.isfinite(m) & (f <= float(n_folds - 1))
    flagf = jnp.where(flagged, one, zero)

    # 5. rank: exclusive prefix count of kept starts (linear
    #    Hillis-Steele in VMEM)
    incl = flagf
    sh = 1
    while sh < p:
        incl = incl + jnp.where(col >= sh, pltpu.roll(incl, sh, axis=1),
                                0.0)
        sh *= 2
    rank = incl - flagf

    # 6. leftward LSB-first compaction butterfly, TWO rolled arrays.
    #    In LSB-first routing an entry's move at stage k is bit k of its
    #    ORIGINAL displacement (bits < k are already cleared when stage k
    #    tests bit k, and subtracting 2^k never borrows into higher
    #    bits), so the displacement needs no decrementing and rides as a
    #    STATIC payload — packed with the expansion displacement+1
    #    (d1e = fkey − rank + 1 ∈ [1, n_folds·n_azim] < base) into one
    #    exact f32 integer: packed = disp0·base + d1e < 2^24. Empty
    #    slots are 0 (d1e ≥ 1 keeps packed ≥ 1 even when disp0 = 0).
    valp = jnp.where(flagged, m, 0.0)
    packed = jnp.where(flagged,
                       (colf32 - rank) * float(base) + (fkey - rank + 1.0),
                       0.0)
    # ``compact_stages`` may be host-bounded: LSB-first needs exactly
    # bit_length(max disp0) stages, and the certifier computes the exact
    # maximum displacement over flagged starts (ring_stage_bounds)
    for k in range(compact_stages):
        # bit k of disp0 via one fmod: packed mod (base·2^{k+1}) =
        # bit_k·base·2^k + (bits<k of disp0)·base + d1e < base·2^k +
        # base·2^k, so the test is a single ≥. Exact in f32: packed <
        # 2^24 (guarded in ring_fold_pallas) and 1/M is a power of two.
        # Empty slots (packed = 0) give r = 0 → never move; no separate
        # emptiness guard needed.
        step = 1 << k
        m_mod = float(base) * (2 << k)
        r = packed - m_mod * jnp.floor(packed * (1.0 / m_mod))
        moving = r >= float(base) * float(step)
        mv = jnp.where(moving, one, zero)
        back = p - step
        # no (col < p - step) guard: an entry moving at stage k has
        # current lane = target + (disp0 with bits < k cleared) ≥
        # target + 2^k ≥ step, so the circular roll can only deliver
        # non-mover (False) flags into the tail lanes — the wrap is
        # self-guarding (probe: the guard was ~1 op/stage on the
        # kernel's hottest class)
        inc = pltpu.roll(mv, back, axis=1) > 0.5
        valp = jnp.where(inc, pltpu.roll(valp, back, axis=1),
                         jnp.where(moving, zero, valp))
        packed = jnp.where(inc, pltpu.roll(packed, back, axis=1),
                           jnp.where(moving, zero, packed))

    # unpack the expansion displacement+1: packed mod base
    d1e = packed - float(base) * jnp.floor(packed * (1.0 / float(base)))

    # 7. rightward MSB-first expansion inside the ring's own folded row
    #    (≤ n_folds·n_azim entries, targets < n_folds·n_azim ≤ wpad)
    if p >= wpad:
        valw = valp[:, :wpad]
        d1w = d1e[:, :wpad]
    else:
        padz = jnp.zeros((_ROWS, wpad - p), jnp.float32)
        valw = jnp.concatenate([valp, padz], axis=1)
        d1w = jnp.concatenate([d1e, padz], axis=1)
    onew = jnp.ones((_ROWS, wpad), jnp.float32)
    zerow = jnp.zeros((_ROWS, wpad), jnp.float32)
    # ``expand_stages`` likewise: MSB-first needs bit_length(max d1)
    for k in reversed(range(expand_stages)):
        step = 1 << k
        moving = d1w >= float(step + 1)
        mv = jnp.where(moving, onew, zerow)
        # no (colw >= step) guard: a mover sits at lane target − rem ≤
        # (n_folds·n_azim − 1) − step < wpad − step, so the circular
        # roll only wraps non-mover flags into the head lanes
        inc = pltpu.roll(mv, step, axis=1) > 0.5
        valw = jnp.where(inc, pltpu.roll(valw, step, axis=1),
                         jnp.where(moving, zerow, valw))
        d1w = jnp.where(inc, pltpu.roll(d1w, step, axis=1) - float(step),
                        jnp.where(moving, zerow, d1w))
    out_ref[:] = valw


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8))
def ring_fold_pallas(key: jnp.ndarray, vals: jnp.ndarray,
                     n_azim: int, n_folds: int,
                     interpret: bool = False,
                     fill_stages: int = None,
                     runmin_stages: int = None,
                     compact_stages: int = None,
                     expand_stages: int = None):
    """(N, Ppad) f32 key (−1 = invalid/pad) + vals (+inf at those slots)
    → (N, wpad) dense folded rows (wpad = n_folds·n_azim rounded up to
    128; zero = empty pixel), semantically the folded image the XLA
    chain (ring_path._ring_run_starts + _densify_xla) produces. Ppad
    must be 128-aligned; N is padded to a multiple of 8 internally.

    ``fill_stages``/``runmin_stages`` (default log2(Ppad): fully
    general) bound the jump-fill / run-min doubling loops; callers may
    pass smaller values ONLY under the host-verified data bounds of
    ``ring_path.ring_stage_bounds`` — output is then bit-identical to
    the unbounded kernel."""
    n, p = key.shape
    if p % 128:
        raise ValueError("ring_fold_pallas needs 128-aligned width")
    full = max((p - 1).bit_length(), 1)
    full_e = max((n_folds * n_azim - 1).bit_length(), 1)
    fill_stages = full if fill_stages is None else min(fill_stages, full)
    runmin_stages = full if runmin_stages is None \
        else min(runmin_stages, full)
    compact_stages = full if compact_stages is None \
        else min(compact_stages, full)
    expand_stages = full_e if expand_stages is None \
        else min(expand_stages, full_e)
    wpad = -(-(n_folds * n_azim) // 128) * 128
    if p * (1 << (n_folds * n_azim).bit_length()) >= 1 << 24:
        raise ValueError("ring_fold_pallas packed payload would exceed "
                         "exact f32 integer range; reduce Ppad or the "
                         "folded width")
    pad = (-n) % _ROWS
    if pad:
        key = jnp.concatenate(
            [key, -jnp.ones((pad, p), jnp.float32)])
        vals = jnp.concatenate(
            [vals, jnp.full((pad, p), jnp.inf, jnp.float32)])
    kernel = functools.partial(_ring_fold_kernel, p=p, n_azim=n_azim,
                               n_folds=n_folds, wpad=wpad,
                               fill_stages=fill_stages,
                               runmin_stages=runmin_stages,
                               compact_stages=compact_stages,
                               expand_stages=expand_stages)
    folded = pl.pallas_call(
        kernel,
        grid=(key.shape[0] // _ROWS,),
        in_specs=[pl.BlockSpec((_ROWS, p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((_ROWS, wpad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((key.shape[0], wpad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(key.astype(jnp.float32), vals.astype(jnp.float32))
    return folded[:n]
