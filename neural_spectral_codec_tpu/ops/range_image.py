"""Panoramic range-image projection — batched, jit-compatible, fixed-shape.

Behavioral contract follows the reference projector
(/root/reference/src/encoding/range_image.py:92-232) but is designed for the
TPU compilation model:

  * The point dimension is a *static* padded size; invalid / padding points
    are masked out by the same finite+range gate the reference applies, so a
    scan with N points can be padded with NaNs (or zeros, which fail the
    ``min_range`` gate) to a fixed ``max_points``.
  * The scatter-min fill (``np.minimum.at``, range_image.py:208) becomes an
    XLA ``scatter-min`` (``.at[idx].min``) into a flat grid with one extra
    dump slot for masked points — no data-dependent shapes.
  * The sequential per-row circular interpolation (range_image.py:15-89)
    becomes a closed-form gather: per pixel we find the nearest valid pixel
    to the left/right with cumulative max/min scans and blend linearly.
    This reproduces ``np.interp`` over the circularly extended valid samples
    exactly (linear interpolation between the two surrounding valid pixels).

All functions are pure and shape-polymorphic only in Python (static) args so
they can be ``jit``-ed and ``vmap``-ed.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ProjectionConfig(NamedTuple):
    """Static projection geometry (reference range_image.py:102-127)."""

    n_elevation: int = 64
    n_azimuth: int = 360
    elevation_range_deg: Tuple[float, float] = (-24.8, 2.0)
    max_range: float = 80.0
    min_range: float = 1.0

    @property
    def elevation_min(self) -> float:
        return math.radians(self.elevation_range_deg[0])

    @property
    def elevation_max(self) -> float:
        return math.radians(self.elevation_range_deg[1])


def _spherical(points: jnp.ndarray):
    """xyz → (range, azimuth∈[0,2π), elevation). Mirrors range_image.py:157-171.

    Padding rows full of NaN/0 are neutralized: we substitute safe values
    before the trig so no NaNs propagate, and return a finiteness mask.
    """
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    finite = jnp.isfinite(x) & jnp.isfinite(y) & jnp.isfinite(z)
    x = jnp.where(finite, x, 1.0)
    y = jnp.where(finite, y, 0.0)
    z = jnp.where(finite, z, 0.0)
    # Overflow clip exactly as the reference (range_image.py:159-162).
    x_sq = jnp.clip(x * x, 0.0, 1e10)
    y_sq = jnp.clip(y * y, 0.0, 1e10)
    z_sq = jnp.clip(z * z, 0.0, 1e10)
    rng = jnp.sqrt(x_sq + y_sq + z_sq)
    azimuth = jnp.arctan2(y, x)
    azimuth = jnp.mod(azimuth + jnp.pi, 2.0 * jnp.pi)
    elevation = jnp.arctan2(z, jnp.sqrt(x_sq + y_sq))
    return rng, azimuth, elevation, finite


@functools.partial(jax.jit, static_argnums=(1,))
def project_points(points: jnp.ndarray, config: ProjectionConfig) -> jnp.ndarray:
    """Project one padded point cloud (N, 3|4) to a range image.

    Returns (n_elevation, n_azimuth) float32; empty pixels are 0 (reference
    range_image.py:205-214 keeps the closest point per pixel, inf→0).
    """
    rng, azimuth, elevation, finite = _spherical(points)
    valid = finite & (rng >= config.min_range) & (rng <= config.max_range)

    elev_span = config.elevation_max - config.elevation_min
    elev_norm = (elevation - config.elevation_min) / elev_span
    elev_bins = jnp.clip(
        jnp.floor(elev_norm * config.n_elevation).astype(jnp.int32),
        0,
        config.n_elevation - 1,
    )
    azim_bins = jnp.clip(
        jnp.floor(azimuth / (2.0 * jnp.pi) * config.n_azimuth).astype(jnp.int32),
        0,
        config.n_azimuth - 1,
    )

    n_pix = config.n_elevation * config.n_azimuth
    linear_idx = elev_bins * config.n_azimuth + azim_bins
    # Masked points land in a dump slot so the scatter stays fixed-shape.
    linear_idx = jnp.where(valid, linear_idx, n_pix)
    vals = jnp.where(valid, rng, jnp.inf).astype(jnp.float32)

    flat = jnp.full((n_pix + 1,), jnp.inf, dtype=jnp.float32)
    flat = flat.at[linear_idx].min(vals, mode="drop")
    img = flat[:n_pix].reshape(config.n_elevation, config.n_azimuth)
    return jnp.where(jnp.isinf(img), 0.0, img)


@functools.partial(jax.jit, static_argnums=(1,))
def project_points_batch(points: jnp.ndarray, config: ProjectionConfig) -> jnp.ndarray:
    """vmapped projection: (B, N, 3|4) → (B, n_elevation, n_azimuth)."""
    return jax.vmap(lambda p: project_points(p, config))(points)


def _fill_empty_rows(img: jnp.ndarray, row_nonempty: jnp.ndarray) -> jnp.ndarray:
    """Copy completely-empty rows from another row.

    The reference loop (range_image.py:78-87) mutates rows in order while
    reading already-filled rows; its fixed point is:
      * an empty row below at least one non-empty row takes the nearest
        ORIGINALLY non-empty row ABOVE it (forward fill), and
      * leading empty rows (no non-empty row above) take the FIRST
        originally non-empty row (back fill of the leading gap).
    We reproduce that closed form.
    """
    n_rows = img.shape[0]
    rows = jnp.arange(n_rows)
    # last non-empty index at or before r (forward cumulative max of masked idx)
    masked = jnp.where(row_nonempty, rows, -1)
    last_above = jax.lax.associative_scan(jnp.maximum, masked)
    first_nonempty = jnp.argmax(row_nonempty)  # first True (0 if none)
    src = jnp.where(last_above >= 0, last_above, first_nonempty)
    any_nonempty = jnp.any(row_nonempty)
    filled = img[src]
    out = jnp.where(row_nonempty[:, None], img, filled)
    return jnp.where(any_nonempty, out, img)


@jax.jit
def interpolate_range_image(img: jnp.ndarray) -> jnp.ndarray:
    """Circular linear interpolation of empty (zero) pixels, per row.

    Equivalent to the reference's ``np.interp`` over circularly extended
    valid samples (range_image.py:52-64) followed by its empty-row fill
    (range_image.py:78-87). Fully vectorized: nearest valid pixel to the
    left/right via cumulative max/min, then a linear blend.
    """
    n_rows, width = img.shape
    valid = img > 0.0
    cols = jnp.arange(width)

    # Nearest valid index at or before i (non-circular), -inf sentinel.
    left_idx = jax.lax.associative_scan(
        jnp.maximum, jnp.where(valid, cols, -(width + 1)), axis=1
    )
    # Nearest valid index at or after i.
    right_idx = jax.lax.associative_scan(
        jnp.minimum, jnp.where(valid, cols, 2 * width + 1), axis=1, reverse=True
    )
    row_has_valid = jnp.any(valid, axis=1, keepdims=True)
    # Circular wrap: if no valid to the left, use (max valid index - width);
    # if none to the right, use (min valid index + width).
    max_valid = jnp.max(jnp.where(valid, cols, -1), axis=1, keepdims=True)
    min_valid = jnp.min(jnp.where(valid, cols, width + 1), axis=1, keepdims=True)
    left = jnp.where(left_idx >= 0, left_idx, max_valid - width)
    right = jnp.where(right_idx <= width, right_idx, min_valid + width)

    v_left = jnp.take_along_axis(img, jnp.mod(left, width), axis=1)
    v_right = jnp.take_along_axis(img, jnp.mod(right, width), axis=1)
    d_left = (cols[None, :] - left).astype(img.dtype)
    d_right = (right - cols[None, :]).astype(img.dtype)
    denom = d_left + d_right
    safe = jnp.where(denom > 0, denom, 1.0)
    interp = (v_left * d_right + v_right * d_left) / safe
    interp = jnp.where(denom > 0, interp, v_left)

    out = jnp.where(valid | ~row_has_valid, img, interp)
    return _fill_empty_rows(out, row_has_valid[:, 0])


@functools.partial(jax.jit, static_argnums=(1, 2))
def unproject_range_image(
    img: jnp.ndarray,
    config: ProjectionConfig,
    keep_mask: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Range image → fixed-shape point set (reference range_image.py:234-285).

    Returns (points (n_elev*n_azim, 3), mask) where mask marks non-empty
    pixels; the point list is fixed-shape with masked rows zeroed.
    """
    n_elev, n_azim = img.shape
    elev_grid = jnp.arange(n_elev)[:, None]
    azim_grid = jnp.arange(n_azim)[None, :]
    elevation = config.elevation_min + (elev_grid / n_elev) * (
        config.elevation_max - config.elevation_min
    )
    azimuth = (azim_grid / n_azim) * 2.0 * jnp.pi
    mask = (img > 0.0).reshape(-1)
    r = img
    x = r * jnp.cos(elevation) * jnp.cos(azimuth)
    y = r * jnp.cos(elevation) * jnp.sin(azimuth)
    z = r * jnp.sin(elevation) * jnp.ones_like(azimuth)
    pts = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    pts = jnp.where(mask[:, None], pts, 0.0)
    return pts, mask


@jax.jit
def range_image_difference(
    img1: jnp.ndarray, img2: jnp.ndarray, threshold: float = 0.5
) -> jnp.ndarray:
    """Fraction of jointly-valid pixels differing > threshold
    (reference range_image.py:326-351; returns 1.0 when nothing overlaps)."""
    valid = (img1 > 0) & (img2 > 0)
    n_valid = jnp.sum(valid)
    diff_cnt = jnp.sum(valid & (jnp.abs(img1 - img2) > threshold))
    return jnp.where(n_valid > 0, diff_cnt / jnp.maximum(n_valid, 1), 1.0)


def pad_points(points: np.ndarray, max_points: int) -> np.ndarray:
    """Host helper: pad/truncate an (N, 3|4) cloud to (max_points, 4) with NaN.

    NaN padding fails the finiteness gate inside :func:`project_points`, so
    padded rows are invisible to the projection.
    """
    out = np.full((max_points, 4), np.nan, dtype=np.float32)
    n = min(len(points), max_points)
    out[:n, : points.shape[1]] = points[:n]
    if points.shape[1] == 3:
        out[:n, 3] = 0.0
    return out
