"""Pallas TPU kernel: monotone stream compaction entirely in VMEM.

After the projection sort (ops/range_image._segment_min_sorted), the run
starts — one per occupied pixel, in ascending pixel order — must be
collected into a compact prefix before butterfly expansion to the dense
image. The XLA formulation (Hillis-Steele prefix rank + LSB-first leftward
butterfly, range_image._monotone_compact_left) makes ~2·log2(N) full HBM
round-trips over the (B, N) working set; measured on TPU v5e that is
~117 us/scan at 133k points — more than the sort's own output pass. Here
one program per 8-scan block keeps every stage in VMEM: one HBM read of
(val, pix), one write of the compacted prefix.

The kernel is shape-uniform across the whole densification pipeline:

  * level 0: inputs are (run-min val, pixf) where ``pixf`` holds the pixel
    id at run starts and -1 elsewhere; the kernel computes each start's
    local rank (in-VMEM prefix sum), adds the caller-provided cross-chunk
    rank offset, and emits ``expd = pix - global_rank`` — which is exactly
    the displacement ``pallas_densify.expand_pallas`` routes by
    (slot r holds global rank r, so target - slot = pix - rank).
  * merge levels: inputs are two (or more) concatenated compacted
    prefixes (val, expd) with expd = -1 sentinels in the gaps; compaction
    re-packs them. Exactness: the global sort makes each pixel's run
    contiguous, so chunk-local compaction of GLOBAL run starts is exact,
    chunk outputs are disjoint ascending pixel ranges, and their
    concatenation is again a monotone compaction instance.

Mosaic-safety (see CLAUDE.md): every array updated across butterfly
stages rides as f32 (chained int32 roll+select miscompiles); all values
(pixel ids < 2^15, ranks/displacements < 2^18, counts) are exact in f32.
LSB-first bit tests use floor arithmetic, no integer bit ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SCANS = 8


def _compact_kernel(val_ref, pix_ref, off_ref, val_out, expd_out, *,
                    m, n_out, n_stages, first_level):
    val = val_ref[:]
    pixf = pix_ref[:]                       # pix at flagged slots, -1 else
    flag = jnp.where(pixf >= 0.0, 1.0, 0.0)
    col = jax.lax.broadcasted_iota(jnp.int32, (_SCANS, m), 1)
    colf = col.astype(jnp.float32)
    one = jnp.ones_like(flag)
    zero = jnp.zeros_like(flag)

    # this chunk's rank offset per scan row: one-hot select of column
    # program_id(1) from the full (8, n_chunks) offsets block (a (8, 1)
    # block is not a legal Mosaic block shape)
    n_chunks = off_ref.shape[1]
    chunk_iota = jax.lax.broadcasted_iota(jnp.int32, (_SCANS, n_chunks), 1)
    sel = jnp.where(chunk_iota == pl.program_id(1), 1.0, 0.0)
    off = jnp.sum(off_ref[:] * sel, axis=1, keepdims=True)

    # rank: exclusive prefix count of flags (Hillis-Steele, all in VMEM)
    incl = flag
    shift = 1
    while shift < m:
        incl = incl + jnp.where(col >= shift,
                                pltpu.roll(incl, shift, axis=1), 0.0)
        shift *= 2
    rank = incl - flag

    # the flag rides INSIDE the payload as a +1 sentinel (expd1 = expd+1
    # when flagged, 0 when empty — expd is always >= 0 for flagged
    # entries since pix >= global rank under monotone compaction): one
    # fewer rolled array per butterfly stage
    if first_level:
        # payload displacement for the later expansion: pix - global rank
        expd1 = jnp.where(flag > 0.5, pixf - rank - off + 1.0, 0.0)
    else:
        expd1 = jnp.where(flag > 0.5, pixf + 1.0, 0.0)
    val = jnp.where(flag > 0.5, val, 0.0)
    disp = jnp.where(flag > 0.5, colf - rank, 0.0)  # leftward move distance

    # LSB-first leftward butterfly (collision-free for monotone compaction)
    for k in range(n_stages):
        step = 1 << k
        # bit k of disp, via exact f32 floor arithmetic
        t = jnp.floor(disp * (1.0 / step))
        bit = t - 2.0 * jnp.floor(t * 0.5)
        mv = jnp.where((expd1 > 0.5) & (bit > 0.5), one, zero)
        back = m - step
        inc = (pltpu.roll(mv, back, axis=1) > 0.5) & (col < m - step)
        moving = mv > 0.5
        val = jnp.where(inc, pltpu.roll(val, back, axis=1),
                        jnp.where(moving, zero, val))
        expd1 = jnp.where(inc, pltpu.roll(expd1, back, axis=1),
                          jnp.where(moving, zero, expd1))
        disp = jnp.where(inc, pltpu.roll(disp, back, axis=1) - float(step),
                         jnp.where(moving, zero, disp))

    val_out[:] = val[:, :n_out]
    # sentinel -1 beyond the compacted prefix so flags survive round-trips
    expd_out[:] = expd1[:, :n_out] - 1.0


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def compact_pallas(val: jnp.ndarray, pixf: jnp.ndarray,
                   offsets: jnp.ndarray, n_out: int,
                   first_level: bool = True,
                   interpret: bool = False):
    """Compact flagged entries of each row into a prefix, in VMEM.

    val, pixf: (B, C·M) with C = offsets.shape[1] chunks of M lanes each.
    offsets:   (B, C) f32 — per-chunk exclusive start counts (global rank
               offset); ignored (pass zeros) when ``first_level=False``,
               where ``pixf`` already carries final expansion displacements
               (−1 = empty slot).
    Returns (val_c, expd_c): (B, C·n_out); per chunk, the flagged entries
    occupy a prefix, val zeroed and expd −1 beyond it. ``n_out`` must be
    ≥ the per-chunk flagged count (guaranteed when n_out ≥ number of
    distinct pixel ids) and 128-aligned, as must the chunk width.
    """
    b, total = val.shape
    n_chunks = offsets.shape[1]
    m = total // n_chunks
    if total % n_chunks or m % 128 or n_out % 128:
        raise ValueError("compact_pallas needs 128-aligned chunk width and "
                         f"n_out (got total={total}, chunks={n_chunks}, "
                         f"n_out={n_out})")
    n_stages = max((m - 1).bit_length(), 1)

    pad = (-b) % _SCANS
    if pad:
        val = jnp.concatenate([val, jnp.zeros((pad, total), jnp.float32)])
        pixf = jnp.concatenate([pixf, -jnp.ones((pad, total), jnp.float32)])
        offsets = jnp.concatenate(
            [offsets, jnp.zeros((pad, n_chunks), jnp.float32)])

    kernel = functools.partial(_compact_kernel, m=m, n_out=n_out,
                               n_stages=n_stages, first_level=first_level)
    val_c, expd_c = pl.pallas_call(
        kernel,
        grid=(val.shape[0] // _SCANS, n_chunks),
        in_specs=[
            pl.BlockSpec((_SCANS, m), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SCANS, m), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SCANS, n_chunks), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_SCANS, n_out), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SCANS, n_out), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((val.shape[0], n_chunks * n_out),
                                 jnp.float32),
            jax.ShapeDtypeStruct((val.shape[0], n_chunks * n_out),
                                 jnp.float32),
        ],
        # the default 16 MiB scoped-vmem budget is marginal for wide
        # chunks (double-buffered blocks + butterfly temporaries); v5e
        # has far more physical VMEM — raise the compiler cap
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(val.astype(jnp.float32), pixf.astype(jnp.float32),
      offsets.astype(jnp.float32))
    return val_c[:b], expd_c[:b]
