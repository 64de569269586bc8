"""Pallas TPU kernel: butterfly expansion of compacted pixels → dense image.

The XLA version (range_image._monotone_expand) runs log2(n_pix) roll+select
stages, each a full HBM round-trip over the (B, n_pix + n_points) working
set. Here one program per 8-scan block keeps the whole working set in VMEM
(~3.8 MB) across all stages — a single HBM read of the compacted arrays and
a single write of the dense image.

Mosaic-safety notes (see CLAUDE.md):
  * displacements ride as f32 (chained int32 roll+select miscompiles on
    this toolchain); values < 2^24 so f32 arithmetic is exact;
  * MSB-first routing keeps the remaining displacement r < 2^(k+1) at
    stage k, so "bit k of r" reduces to ``r >= 2^k`` — comparisons only,
    no bit extraction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SCANS = 8


def _kernel(cval_ref, disp1_ref, out_ref, *, m, n_pix, n_stages):
    """``disp1`` carries displacement+1 for flagged entries and 0 for
    empty slots — the flag rides inside the displacement as a sentinel,
    so each stage rolls only TWO arrays (mover masks stay f32 0/1:
    Mosaic's rotate supports only 32-bit element types)."""
    val = cval_ref[:]
    disp1 = disp1_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (_SCANS, m), 1)
    one = jnp.ones_like(val)
    zero = jnp.zeros_like(val)
    for k in reversed(range(n_stages)):
        step = 1 << k
        # disp1 >= step+1 ⟺ flagged with remaining displacement >= step
        mv = jnp.where(disp1 >= float(step + 1), one, zero)
        inc = (pltpu.roll(mv, step, axis=1) > 0.5) & (col >= step)
        moving = mv > 0.5
        val = jnp.where(inc, pltpu.roll(val, step, axis=1),
                        jnp.where(moving, zero, val))
        disp1 = jnp.where(inc,
                          pltpu.roll(disp1, step, axis=1) - float(step),
                          jnp.where(moving, zero, disp1))
    out_ref[:] = val[:, :n_pix]


@functools.partial(jax.jit, static_argnums=(3, 4))
def expand_pallas(cval: jnp.ndarray, disp: jnp.ndarray, flag: jnp.ndarray,
                  n_pix: int, interpret: bool = False) -> jnp.ndarray:
    """(B, M) compacted values + f32 displacements + flags → (B, n_pix)
    dense images. Preconditions as in range_image._monotone_expand
    (compact flagged prefix, non-decreasing displacements). M and n_pix
    must be multiples of 128; B is padded to a multiple of 8."""
    b, m = cval.shape
    if m % 128 or n_pix % 128:
        raise ValueError("expand_pallas needs 128-aligned M and n_pix")
    n_stages = max(n_pix.bit_length(), 1)

    # pack flag into the displacement: disp+1 when flagged, 0 when empty
    disp1 = jnp.where(flag > 0.5, disp.astype(jnp.float32) + 1.0, 0.0)

    pad = (-b) % _SCANS
    if pad:
        z = jnp.zeros((pad, m), jnp.float32)
        cval = jnp.concatenate([cval, z])
        disp1 = jnp.concatenate([disp1, z])

    kernel = functools.partial(_kernel, m=m, n_pix=n_pix,
                               n_stages=n_stages)
    out = pl.pallas_call(
        kernel,
        grid=(cval.shape[0] // _SCANS,),
        in_specs=[pl.BlockSpec((_SCANS, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((_SCANS, n_pix), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cval.shape[0], n_pix), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(cval.astype(jnp.float32), disp1)
    return out[:b]
