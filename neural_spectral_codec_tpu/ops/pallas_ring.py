"""Pallas TPU kernel: the ring-path per-ring stage chain in VMEM.

The XLA formulation of the ring fast path (ops/ring_path._ring_run_starts)
runs ~35 roll+select stages over (B·R, P) f32 arrays — each a full HBM
round trip (~4 us/scan/stage at full HDL-64E density, ~140 us/scan total,
measured). This kernel keeps the whole chain — circular jump-fill,
segmented circular run-min, run starts, fold prefix — in VMEM: one HBM
read of (key, val), one write of (col_f, m).

Padding transparency: rows are padded to a 128-aligned width with
key = −1 / val = +inf, which the jump-fill treats exactly like dropout
(pad slots adopt the preceding run's key and carry +inf), so the circular
rolls over the PADDED width compute the same runs as the true ring length
— no special wrap handling needed.

Mosaic-safety (CLAUDE.md): every rolled array rides as f32 (keys, mins,
0/1 flags, fold counts — all < 2^24, exact in f32); ``pltpu.roll`` is
circular; leftward rolls are expressed as ``roll(x, P − s)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8


def _ring_kernel(key_ref, val_ref, colf_ref, m_ref, *, p, n_azim, n_folds):
    """Same stage chain and semantics as ring_path._ring_run_starts:
    folded-key run identity (no uniformity carry in the doubling) and
    min-reduce fold positions instead of a log2(P) prefix."""
    key = key_ref[:]
    m = val_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, p), 1)
    colf32 = col.astype(jnp.float32)
    one = jnp.ones((_ROWS, p), jnp.float32)
    zero = jnp.zeros((_ROWS, p), jnp.float32)

    # 1. circular jump-fill: holes (key < 0) adopt the nearest valid key
    #    to the left
    sh = 1
    while sh < p:
        key = jnp.where(key < 0.0, pltpu.roll(key, sh, axis=1), key)
        sh *= 2

    # 2. run starts on raw keys; position 0 is ALWAYS a start when valid
    #    (wrap-run head pieces and circularly-constant rings — see
    #    ring_path._ring_run_starts)
    prev = pltpu.roll(key, 1, axis=1)
    is_start = ((key != prev) | (col == 0)) & (key >= 0.0)
    startf = jnp.where(is_start, one, zero)

    # 3. per-position fold index from event-position min-reduces
    #    (≤ n_folds-1 wrap events per contract ring; clamped overflow
    #    runs are dropped below and cannot merge with kept ones)
    noninc = (startf > 0.5) & (col > 0) & (key <= prev)
    f = zero
    big = float(p)
    lo = jnp.full((_ROWS, 1), -1.0, jnp.float32)
    for _ in range(n_folds):
        pos_k = jnp.min(jnp.where(noninc & (colf32 > lo), colf32, big),
                        axis=1, keepdims=True)
        f = f + jnp.where(colf32 >= pos_k, one, zero)
        lo = pos_k

    fkey = key + float(n_azim) * f

    # 4. segmented run-min: forward doubling on the folded key — the
    #    folded-key sequence is non-decreasing along the ring, so
    #    endpoint equality implies window uniformity (no ok carry)
    sh = 1
    while sh < p:
        back = p - sh                       # roll left by sh
        fkey_s = pltpu.roll(fkey, back, axis=1)
        m_s = pltpu.roll(m, back, axis=1)
        m = jnp.where(fkey_s == fkey, jnp.minimum(m, m_s), m)
        sh *= 2

    startf = jnp.where(jnp.isfinite(m), startf, zero)
    colf_ref[:] = jnp.where((startf > 0.5) & (f <= float(n_folds - 1)),
                            fkey, -1.0)
    m_ref[:] = m


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def ring_run_starts_pallas(key: jnp.ndarray, vals: jnp.ndarray,
                           n_azim: int, n_folds: int,
                           interpret: bool = False):
    """(N, Ppad) f32 key (−1 = invalid/pad) + vals (+inf at those slots)
    → (col_f, m): folded target columns at run starts (−1 elsewhere) and
    exact circular run minima. Ppad must be 128-aligned; N is padded to a
    multiple of 8 internally. Semantically identical to the XLA stage
    chain in ops/ring_path._ring_run_starts."""
    n, p = key.shape
    if p % 128:
        raise ValueError("ring_run_starts_pallas needs 128-aligned width")
    pad = (-n) % _ROWS
    if pad:
        key = jnp.concatenate(
            [key, -jnp.ones((pad, p), jnp.float32)])
        vals = jnp.concatenate(
            [vals, jnp.full((pad, p), jnp.inf, jnp.float32)])
    kernel = functools.partial(_ring_kernel, p=p, n_azim=n_azim,
                               n_folds=n_folds)
    colf, m = pl.pallas_call(
        kernel,
        grid=(key.shape[0] // _ROWS,),
        in_specs=[pl.BlockSpec((_ROWS, p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec((_ROWS, p), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((key.shape[0], p), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(key.astype(jnp.float32), vals.astype(jnp.float32))
    return colf[:n], m[:n]
