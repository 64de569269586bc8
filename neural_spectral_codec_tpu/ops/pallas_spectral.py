"""Fused Pallas TPU kernel: range image → spectral histogram descriptor.

One VMEM-resident pass per 8-scan block covering the whole post-projection
chain (reference spectral_encoder.py:160-204 + range_image.py:15-89):

    circular empty-pixel interpolation  (pointer-doubling rolls, VPU)
    → empty-row fill                    (pointer-doubling rolls, VPU)
    → elevation pooling                 (P @ img, MXU)
    → real DFT magnitudes               (img @ cos/sin bases, MXU)
    → exponential histogram binning     (mags @ one-hot bin matrix, MXU)
    → global sum-to-1 normalization     (VPU)

Blocking 8 scans per program makes every matmul 128 rows tall — exactly
one MXU tile — and the whole block's working set (~1.4 MB) sits in VMEM,
so the chain runs with zero HBM round-trips between stages. The XLA
composition (ops/spectral.py) materializes the interpolated image and the
magnitudes in HBM between fusions; this kernel is the BASELINE.md "fused
Pallas encoding kernel".

The learnable-α binning matrix and the DFT bases are computed outside the
kernel (tiny, traced) and passed as operands, so α stays a traced scalar
exactly like the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neural_spectral_codec_tpu.ops.spectral import (
    SpectralEncoderConfig, binning_matrix, dft_bases, pooling_matrix)

_BLOCK = 8          # scans per program; 8 × 16 pooled rows = 128 MXU rows
_BIG = 1 << 20      # distance sentinel


def _interpolate_block(img, n_elev: int, n_azim: int):
    """Circular per-row interpolation + empty-row fill for a (R, A) block
    of stacked scan rows (R = _BLOCK · n_elev). Mirrors
    range_image.interpolate_range_image exactly, with scan boundaries
    respected in the row-fill phase.

    Distances are carried as float32 throughout: Mosaic miscompiles the
    chained int32 roll+compare+select pattern on this toolchain (verified
    empirically — the f32 variant is bit-exact, the int32 one is not).
    Distances ≤ n_azim are exactly representable in f32.
    """
    R = img.shape[0]
    big = jnp.float32(_BIG)
    valid = img > 0.0
    d0 = jnp.where(valid, 0.0, big)

    # nearest valid left/right along the circular azimuth axis
    val_l, d_l = img, d0
    val_r, d_r = img, d0
    shift = 1
    while shift < n_azim:
        sv = pltpu.roll(val_l, shift, axis=1)
        sd = pltpu.roll(d_l, shift, axis=1) + float(shift)
        take = sd < d_l
        val_l = jnp.where(take, sv, val_l)
        d_l = jnp.minimum(d_l, sd)
        sv = pltpu.roll(val_r, n_azim - shift, axis=1)
        sd = pltpu.roll(d_r, n_azim - shift, axis=1) + float(shift)
        take = sd < d_r
        val_r = jnp.where(take, sv, val_r)
        d_r = jnp.minimum(d_r, sd)
        shift *= 2

    row_has_valid = jnp.any(valid, axis=1, keepdims=True)
    denom = d_l + d_r
    safe = jnp.where(denom > 0, denom, 1.0)
    interp = (val_l * d_r + val_r * d_l) / safe
    interp = jnp.where(denom > 0, interp, val_l)
    out = jnp.where(valid | ~row_has_valid, img, interp)

    # empty-row fill within each scan's n_elev rows (above wins, else below)
    row_in_scan = (
        jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) % n_elev)
    nonempty = row_has_valid[:, 0]
    d0r = jnp.where(nonempty, 0.0, big)[:, None]
    val_a, d_a = out, d0r
    val_b, d_b = out, d0r
    shift = 1
    while shift < n_elev:
        sv = pltpu.roll(val_a, shift, axis=0)
        sd = jnp.where(row_in_scan >= shift,
                       pltpu.roll(d_a, shift, axis=0) + float(shift), big)
        take = sd < d_a
        val_a = jnp.where(take, sv, val_a)
        d_a = jnp.minimum(d_a, sd)
        sv = pltpu.roll(val_b, R - shift, axis=0)
        sd = jnp.where(row_in_scan < n_elev - shift,
                       pltpu.roll(d_b, R - shift, axis=0) + float(shift), big)
        take = sd < d_b
        val_b = jnp.where(take, sv, val_b)
        d_b = jnp.minimum(d_b, sd)
        shift *= 2
    filled = jnp.where(d_a < big, val_a, val_b)
    return jnp.where(nonempty[:, None], out, filled)


def _kernel(imgs_ref, pool_ref, cos_ref, sin_ref, bins_ref, group_ref,
            out_ref, *, n_elev, n_azim, n_target, n_bins, epsilon,
            interpolate):
    """Everything stays 2D — Mosaic dislikes 3D transposes/reshapes, so
    per-scan structure is encoded in the matrices instead: the pooling
    matrix is block-diagonal over the 8 stacked scans and ``group`` maps
    pooled rows ↔ scans for the normalization."""
    img = imgs_ref[:].reshape(_BLOCK * n_elev, n_azim)
    if interpolate:
        img = _interpolate_block(img, n_elev, n_azim)
    # block-diagonal pooling: (b·T, b·E) @ (b·E, A) -> (b·T, A)
    pooled = jnp.dot(pool_ref[:], img, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    re = jnp.dot(pooled, cos_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    im = jnp.dot(pooled, sin_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    mags = jnp.sqrt(re * re + im * im)           # (b·T, F)
    hist = jnp.dot(mags, bins_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    # per-scan sum over each scan's T rows: group (b, b·T) 0/1 matrix
    row_sum = jnp.sum(hist, axis=1, keepdims=True)        # (b·T, 1)
    scan_tot = jnp.dot(group_ref[:], row_sum,
                       preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)  # (b, 1)
    tot_rows = jnp.dot(group_ref[:].T, scan_tot,
                       preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)  # (b·T, 1)
    uniform = 1.0 / (n_target * n_bins)
    out_ref[:] = jnp.where(tot_rows > epsilon,
                           hist / (tot_rows + epsilon), uniform)


@functools.partial(jax.jit, static_argnums=(2, 3))
def encode_range_image_batch_pallas(
        imgs: jnp.ndarray, alpha: jnp.ndarray,
        config: SpectralEncoderConfig, interpret: bool = False) -> jnp.ndarray:
    """(B, E, A) range images → (B, output_dim) descriptors, fused.
    B is padded to a multiple of 8 internally."""
    b, n_elev, n_azim = imgs.shape
    n_target, n_bins = config.target_elevation_bins, config.n_bins
    n_freqs = config.n_freqs

    pad = (-b) % _BLOCK
    if pad:
        imgs = jnp.concatenate(
            [imgs, jnp.zeros((pad, n_elev, n_azim), imgs.dtype)])
    n_blocks = imgs.shape[0] // _BLOCK

    pool = jnp.asarray(np.kron(np.eye(_BLOCK, dtype=np.float32),
                               pooling_matrix(n_elev, n_target)))
    group = jnp.asarray(np.kron(np.eye(_BLOCK, dtype=np.float32),
                                np.ones((1, n_target), np.float32)))
    cos_b, sin_b = dft_bases(n_azim)
    bins = binning_matrix(alpha, n_bins, n_freqs, config.epsilon)

    kernel = functools.partial(
        _kernel, n_elev=n_elev, n_azim=n_azim, n_target=n_target,
        n_bins=n_bins, epsilon=config.epsilon,
        interpolate=config.interpolate_empty)

    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((_BLOCK, n_elev, n_azim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK * n_target, _BLOCK * n_elev),
                         lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_azim, n_freqs), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_azim, n_freqs), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_freqs, n_bins), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK, _BLOCK * n_target), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK * n_target, n_bins),
                               lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (imgs.shape[0] * n_target, n_bins), jnp.float32),
        interpret=interpret,
    )(imgs.astype(jnp.float32), pool, jnp.asarray(cos_b),
      jnp.asarray(sin_b), bins, group)
    return out.reshape(imgs.shape[0], n_target * n_bins)[:b]
