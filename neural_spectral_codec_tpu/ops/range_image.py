"""Panoramic range-image projection — batched, jit-compatible, fixed-shape.

Behavioral contract follows the reference projector
(/root/reference/src/encoding/range_image.py:92-232) but is designed for the
TPU compilation model:

  * The point dimension is a *static* padded size; invalid / padding points
    are masked out by the same finite+range gate the reference applies, so a
    scan with N points can be padded with NaNs (or zeros, which fail the
    ``min_range`` gate) to a fixed ``max_points``.
  * The scatter-min fill (``np.minimum.at``, range_image.py:208) becomes a
    sort-based segment-min (packed single-key sort + exact run-suffix-min
    fix-up), densified either by a unique-indices scatter (single scan) or
    scatter-free via sort-compaction + butterfly expansion (TPU batch path)
    — scatters serialize/crawl on TPU; sorts and rolls do not.
  * The sequential per-row circular interpolation (range_image.py:15-89)
    becomes value-carrying pointer doubling: nearest valid pixel left/right
    in log2(width) roll+select steps, then a linear blend. Reproduces
    ``np.interp`` over the circularly extended valid samples exactly.

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
    # "clip" (reference range_image.py:193-198 parity): out-of-range
    # elevations land in the boundary rows. "drop": they are discarded —
    # required for cross-FOV retrieval, where two sensors encoded over
    # their overlap band must see the SAME physical points
    # (docs/cross_sensor.md; clip poisons the boundary rows with
    # out-of-band returns and the global normalization with their mass)
    elevation_mode: str = "clip"

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


def _valid_mask(rng, elevation, finite, config: ProjectionConfig):
    """Range gates + (drop mode only) the elevation-band gate."""
    valid = finite & (rng >= config.min_range) & (rng <= config.max_range)
    if config.elevation_mode == "drop":
        valid = valid & (elevation >= config.elevation_min) \
            & (elevation <= config.elevation_max)
    return valid


@functools.partial(jax.jit, static_argnums=(1,))
def project_points(points: jnp.ndarray, config: ProjectionConfig) -> jnp.ndarray:
    """Project one padded point cloud (N, 3|4) to a range image.

    Returns (n_elevation, n_azimuth) float32; empty pixels are 0 (reference
    range_image.py:205-214 keeps the closest point per pixel, inf→0).
    """
    rng, azimuth, elevation, finite = _spherical(points)
    valid = _valid_mask(rng, elevation, finite, config)

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
    # Masked points land in a dump slot past the last pixel.
    linear_idx = jnp.where(valid, linear_idx, n_pix).astype(jnp.int32)
    vals = jnp.where(valid, rng, jnp.inf).astype(jnp.float32)

    sorted_idx, run_min, is_start = _segment_min_sorted(
        linear_idx, vals, config.max_range, n_pix)

    # non-starts go far out of bounds and are dropped — the surviving
    # indices are unique, so XLA can parallelize the scatter
    target = jnp.where(is_start, sorted_idx, 1 << 29)
    buf = jnp.zeros((n_pix,), jnp.float32)
    buf = buf.at[target].set(run_min, mode="drop", unique_indices=True)
    img = jnp.where(jnp.isinf(buf), 0.0, buf)
    return img.reshape(config.n_elevation, config.n_azimuth)


def _quant_bits(n_pix: int) -> int:
    """Low bits available for range quantization in the packed int31 sort
    key: pixel ids (incl. the dump slot n_pix) take the high bits. With
    FEWER quant bits the result stays exact — the suffix-min fix-up
    recovers the true minimum over any equal-key run; the quantization
    only pre-orders within runs. 0 bits = plain pixel sort, still exact."""
    id_bits = (n_pix + 1).bit_length()
    if id_bits > 31:
        raise ValueError(f"image with {n_pix} pixels exceeds int32 sort keys")
    return min(16, 31 - id_bits)


def _segment_min_sorted(linear_idx: jnp.ndarray, vals: jnp.ndarray,
                        max_range: float, n_pix: int):
    """Sort-based segment-min: returns (sorted pixel ids, exact per-run
    min at run starts, run-start mask).

    XLA serializes conflicting scatters on TPU (~10⁴× slower than this),
    and a SINGLE int32 sort key is ~12× faster than a 2-key lexicographic
    sort — so the key packs (pixel << qb | qb-bit-quantized range) with
    the exact fp32 range riding along as payload. Quantization is
    monotone, so each pixel run starts with the quantum containing the
    true minimum; a log-step suffix-min over equal-key runs then recovers
    the EXACT min (bit-identical to the reference's np.minimum.at,
    range_image.py:208)."""
    n_points = linear_idx.shape[0]
    qb = _quant_bits(n_pix)
    qmax = (1 << qb) - 1
    quant = jnp.clip(
        (vals * (qmax / max_range)).astype(jnp.int32), 0, qmax)
    packed = (linear_idx << qb) | quant
    sorted_key, sorted_rng = jax.lax.sort((packed, vals), num_keys=1)

    pos = jnp.arange(n_points, dtype=jnp.int32)
    run_min = sorted_rng
    shift = 1
    while shift < n_points:
        cand = jnp.roll(run_min, -shift)
        same = (jnp.roll(sorted_key, -shift) == sorted_key) & \
               (pos < n_points - shift)
        run_min = jnp.where(same, jnp.minimum(run_min, cand), run_min)
        shift *= 2

    sorted_idx = jax.lax.shift_right_logical(sorted_key, qb)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_idx[1:] != sorted_idx[:-1]])
    return sorted_idx, run_min, is_start


def _batch_key_layout(b: int, n_pix: int):
    """Bit layout of the fused batch-sort key: returns (id_bits, batch_bits,
    quant_bits) with quant_bits < 0 meaning the combination exceeds the
    int32 key budget. Single source of truth for
    :func:`_segment_min_sorted_batch`, its dispatch gate, and the probe in
    experiments/profile_hotpath.py."""
    id_bits = (n_pix + 1).bit_length()
    bb = max(b - 1, 0).bit_length()
    return id_bits, bb, min(16, 31 - id_bits - bb)


def _segment_min_sorted_batch(linear_idx: jnp.ndarray, vals: jnp.ndarray,
                              max_range: float, n_pix: int):
    """Batched :func:`_segment_min_sorted`: ONE flat sort over the whole
    (B, N) batch with the batch id riding the key's high bits, instead of
    B vmapped sorts — the remaining constant-factor candidate against the
    general path's sort wall (docs/performance.md "dead ends" tail;
    measured head-to-head in experiments/profile_hotpath.py).

    ``lax.sort`` is stable, so the flat sort restricted to one batch row
    equals that row's own stable sort — reshaping back to (B, N) yields
    per-row (pixel, quantum)-sorted order. The batch bits displace
    quantization bits (qb drops by ceil(log2 B)), which only re-orders
    payloads WITHIN a pixel run; the suffix-min over full-key runs still
    recovers the exact minimum at every run start, so the projected image
    is bit-identical to the vmapped path (tests/test_encoding.py).
    """
    b, n = linear_idx.shape
    id_bits, _, qb = _batch_key_layout(b, n_pix)
    if qb < 0:
        raise ValueError(
            f"batch {b} x image {n_pix} exceeds the int32 key budget")
    qmax = (1 << qb) - 1
    quant = jnp.clip((vals * (qmax / max_range)).astype(jnp.int32), 0, qmax)
    bid = jax.lax.broadcasted_iota(jnp.int32, (b, n), 0)
    packed = (bid << (id_bits + qb)) | (linear_idx << qb) | quant
    sorted_key, sorted_rng = jax.lax.sort(
        (packed.reshape(-1), vals.reshape(-1)), num_keys=1)
    sorted_key = sorted_key.reshape(b, n)
    sorted_rng = sorted_rng.reshape(b, n)

    pos = jnp.arange(n, dtype=jnp.int32)
    run_min = sorted_rng
    shift = 1
    while shift < n:
        cand = jnp.roll(run_min, -shift, axis=-1)
        same = (jnp.roll(sorted_key, -shift, axis=-1) == sorted_key) & \
               (pos < n - shift)
        run_min = jnp.where(same, jnp.minimum(run_min, cand), run_min)
        shift *= 2

    sorted_idx = jax.lax.shift_right_logical(sorted_key, qb) & \
        ((1 << id_bits) - 1)
    is_start = jnp.concatenate(
        [jnp.ones((b, 1), bool), sorted_idx[:, 1:] != sorted_idx[:, :-1]],
        axis=1)
    return sorted_idx, run_min, is_start


# Measured LOSING on v5e (2026-08-19, experiments/profile_hotpath.py):
# one fused 1.07M-element sort runs at 1.96 ns/elem vs 1.65 for the 8
# vmapped 133k sorts — XLA's sort cost per element RISES from 133k to
# 1M, so fusing the batch into one sort is an 18% regression, not a
# constant-factor save. Kept default-off (bit-identical, CPU-tested)
# for topologies where the crossover differs; flip via env
# NSC_FUSED_BATCH_SORT=1.
_FUSED_BATCH_SORT = bool(int(
    __import__("os").environ.get("NSC_FUSED_BATCH_SORT", "0")))


@functools.partial(jax.jit, static_argnums=(1,))
def project_points_batch(points: jnp.ndarray, config: ProjectionConfig) -> jnp.ndarray:
    """Batched projection: (B, N, 3|4) → (B, n_elevation, n_azimuth).

    On TPU, densification runs scatter-free (XLA's unique-indices scatter
    still costs ~6 ns/element): run-starts are compacted by a second
    single-key sort into UNIQUE ascending pixel ids, then routed to their
    dense pixel slots by a butterfly expansion (_monotone_expand).
    Elsewhere (CPU tests) it falls back to the per-scan scatter path —
    both paths are bit-identical.
    """
    if jax.default_backend() == "tpu":
        return _project_points_batch_compact(points, config)
    return jax.vmap(lambda p: project_points(p, config))(points)


def _monotone_compact_left(payloads, flag, disp, n_stages: int):
    """Butterfly compaction: route flagged elements LEFT along the last
    axis by ``disp`` (= position − rank among flagged) via LSB-first
    log2 stages of roll+select — the streaming-compaction mirror of
    :func:`_monotone_expand`.

    Collision-freedom: compaction is a monotone partial permutation
    (sources increasing, targets = ranks strictly increasing, target ≤
    source, distances non-decreasing); LSB-first scheduling routes it
    without conflicts (brute-force-verified; note MSB-first does NOT work
    for the leftward direction — see _monotone_expand's docstring).
    """
    m = disp.shape[-1]
    idx = jnp.arange(m, dtype=jnp.int32)
    for k in range(n_stages):
        step = 1 << k
        mv = flag & (((disp >> k) & 1) == 1)
        inc = jnp.roll(mv, -step, axis=-1) & (idx < m - step)

        def take(p):
            return jnp.where(inc, jnp.roll(p, -step, axis=-1),
                             jnp.where(mv, jnp.zeros_like(p), p))

        payloads = tuple(take(p) for p in payloads)
        disp = jnp.where(inc, jnp.roll(disp, -step, axis=-1) - step,
                         jnp.where(mv, 0, disp))
        flag = inc | (flag & ~mv)
    return payloads, flag


def _monotone_expand(payloads, flag, disp, n_stages: int):
    """Butterfly expansion: route flagged elements RIGHT along the last
    axis by their per-element displacement via MSB-first log2 stages of
    roll+select — no sort, no scatter, no gather.

    Precondition (collision-freedom): flagged elements occupy a compact
    prefix with non-decreasing ``disp`` (equivalently: strictly increasing
    targets, target ≥ slot). Note the mirrored LEFTWARD compaction does
    NOT share this property (elements with larger remaining low bits can
    land on parked ones — verified by counterexample), which is why
    compaction below uses a sort instead.
    """
    m = disp.shape[-1]
    idx = jnp.arange(m, dtype=jnp.int32)
    for k in reversed(range(n_stages)):
        step = 1 << k
        mv = flag & (((disp >> k) & 1) == 1)
        inc = jnp.roll(mv, step, axis=-1) & (idx >= step)

        def take(p):
            return jnp.where(inc, jnp.roll(p, step, axis=-1),
                             jnp.where(mv, jnp.zeros_like(p), p))

        payloads = tuple(take(p) for p in payloads)
        disp = jnp.where(inc, jnp.roll(disp, step, axis=-1) - step,
                         jnp.where(mv, 0, disp))
        flag = inc | (flag & ~mv)
    return payloads, flag


_CHUNK_MAX = 36864   # max compaction-kernel chunk width (VMEM budget)


def _densify_vmem(sorted_idx: jnp.ndarray, run_min: jnp.ndarray,
                  start: jnp.ndarray, n_pix: int,
                  interpret: bool = False) -> jnp.ndarray:
    """Run starts → dense image with every butterfly stage in VMEM.

    Level-0 chunks of ≤ _CHUNK_MAX lanes are compacted independently
    (exact: the global sort makes each pixel's run contiguous, so GLOBAL
    run starts compact chunk-locally; cross-chunk rank offsets come from
    cheap per-chunk counts), then pairwise-merged — each merge is again a
    monotone compaction of two disjoint ascending pixel ranges — and
    finally butterfly-expanded to the dense image. HBM sees one read of
    (val, pix) and one image write instead of ~2·log2(N) round-trips.
    """
    from neural_spectral_codec_tpu.ops.pallas_compact import compact_pallas
    from neural_spectral_codec_tpu.ops.pallas_densify import expand_pallas

    b, n = sorted_idx.shape
    pixf = jnp.where(start, sorted_idx.astype(jnp.float32), -1.0)
    valz = jnp.where(start, run_min, 0.0)

    n_chunks = 1
    while -(-n // n_chunks) > _CHUNK_MAX:
        n_chunks *= 2
    c = (-(-n // n_chunks) + 127) // 128 * 128
    mpad = n_chunks * c
    if mpad > n:
        pixf = jnp.pad(pixf, ((0, 0), (0, mpad - n)), constant_values=-1.0)
        valz = jnp.pad(valz, ((0, 0), (0, mpad - n)))

    counts = (pixf >= 0).reshape(b, n_chunks, c).sum(-1).astype(jnp.float32)
    offsets = jnp.cumsum(counts, axis=1) - counts

    n_out = min(n_pix, c)
    val_c, expd_c = compact_pallas(valz, pixf, offsets, n_out,
                                   first_level=True, interpret=interpret)
    while n_chunks > 1:
        n_chunks //= 2
        n_next = min(n_pix, 2 * n_out)
        val_c, expd_c = compact_pallas(
            val_c, expd_c, jnp.zeros((b, n_chunks), jnp.float32), n_next,
            first_level=False, interpret=interpret)
        n_out = n_next
    if n_out < n_pix:
        val_c = jnp.pad(val_c, ((0, 0), (0, n_pix - n_out)))
        expd_c = jnp.pad(expd_c, ((0, 0), (0, n_pix - n_out)),
                         constant_values=-1.0)

    flag = (expd_c >= 0).astype(jnp.float32)
    return expand_pallas(val_c, jnp.maximum(expd_c, 0.0), flag, n_pix,
                         interpret=interpret)


def _densify_xla(sorted_idx: jnp.ndarray, run_min: jnp.ndarray,
                 start: jnp.ndarray, n_pix: int) -> jnp.ndarray:
    """Pure-XLA densification fallback (CPU tests / unaligned geometries):
    Hillis-Steele prefix rank + LSB-first leftward butterfly compaction,
    then MSB-first rightward expansion. Bit-identical to _densify_vmem."""
    n_points = sorted_idx.shape[1]

    def compact(sorted_idx, run_min, start):
        incl = start.astype(jnp.int32)
        shift = 1
        while shift < incl.shape[-1]:
            incl = incl + jnp.where(
                jnp.arange(incl.shape[-1]) >= shift,
                jnp.roll(incl, shift, axis=-1), 0)
            shift *= 2
        rank = incl - start.astype(jnp.int32)
        pos = jnp.arange(start.shape[-1], dtype=jnp.int32)
        disp = jnp.where(start, pos - rank, 0)
        (pix_c, val_c), flag_c = _monotone_compact_left(
            (sorted_idx, run_min), start, disp,
            max((start.shape[-1] - 1).bit_length(), 1))
        return jnp.where(flag_c, pix_c, jnp.int32(1 << 29)), val_c

    cpix, cval = jax.vmap(compact)(sorted_idx, run_min, start)

    # all real entries (unique ascending pixels, ≤ one per pixel) sit in
    # the first min(n_points, n_pix) slots — slice before expanding so
    # expansion cost is set by the IMAGE size, not the point density
    L = min(n_points, n_pix)
    cpix = cpix[:, :L]
    cval = cval[:, :L]

    m = n_pix + (-n_pix) % 128
    pad = m - L
    cflag = cpix < n_pix
    cval = jnp.where(cflag, cval, 0.0)
    pos = jnp.arange(L, dtype=jnp.int32)
    disp = jnp.pad(jnp.where(cflag, cpix - pos, 0), ((0, 0), (0, pad)))
    cval = jnp.pad(cval, ((0, 0), (0, pad)))
    cflag = jnp.pad(cflag, ((0, 0), (0, pad)))
    (img,), _ = _monotone_expand((cval,), cflag, disp,
                                 max(n_pix.bit_length(), 1))
    return img[:, :n_pix]


def _project_points_batch_compact(points: jnp.ndarray,
                                  config: ProjectionConfig) -> jnp.ndarray:
    """Scatter-free batched projection (TPU path).

    After the segment-min sort, run starts (one per occupied pixel) are
    COMPACTED into a dense prefix and EXPANDED to their pixel slots by
    butterfly roll+select passes. Sorts and rolls are the only data movers
    — this replaces XLA's unique-indices scatter (~6 ns/element ≈ 26 ms
    per 256-scan batch) bit-identically. On TPU the whole post-sort chain
    runs inside VMEM-resident Pallas kernels (see _densify_vmem).
    """
    n_pix = config.n_elevation * config.n_azimuth
    b = points.shape[0]

    rng, azimuth, elevation, finite = _spherical(points)
    valid = _valid_mask(rng, elevation, finite, config)
    elev_span = config.elevation_max - config.elevation_min
    elev_bins = jnp.clip(
        jnp.floor((elevation - config.elevation_min) / elev_span
                  * config.n_elevation).astype(jnp.int32),
        0, config.n_elevation - 1)
    azim_bins = jnp.clip(
        jnp.floor(azimuth / (2.0 * jnp.pi)
                  * config.n_azimuth).astype(jnp.int32),
        0, config.n_azimuth - 1)
    linear_idx = jnp.where(valid, elev_bins * config.n_azimuth + azim_bins,
                           n_pix).astype(jnp.int32)
    vals = jnp.where(valid, rng, jnp.inf).astype(jnp.float32)

    if _FUSED_BATCH_SORT and b > 1 and _batch_key_layout(b, n_pix)[2] >= 0:
        sorted_idx, run_min, is_start = _segment_min_sorted_batch(
            linear_idx, vals, config.max_range, n_pix)
    else:
        sorted_idx, run_min, is_start = jax.vmap(
            lambda i, v: _segment_min_sorted(i, v, config.max_range, n_pix)
        )(linear_idx, vals)
    start = is_start & (sorted_idx < n_pix)

    if (jax.default_backend() == "tpu" and n_pix % 128 == 0
            and n_pix <= _CHUNK_MAX):
        img = _densify_vmem(sorted_idx, run_min, start, n_pix)
    else:
        img = _densify_xla(sorted_idx, run_min, start, n_pix)
    return img.reshape(b, config.n_elevation, config.n_azimuth)


_BIG = 1 << 20  # distance sentinel for "no valid pixel found"


def _fill_empty_rows(img: jnp.ndarray, row_nonempty: jnp.ndarray) -> jnp.ndarray:
    """Copy completely-empty rows from another row.

    The reference loop (range_image.py:78-87) mutates rows in order while
    reading already-filled rows; its fixed point is:
      * an empty row below at least one non-empty row takes the nearest
        ORIGINALLY non-empty row ABOVE it (forward fill), and
      * leading empty rows (no non-empty row above) take the FIRST
        originally non-empty row — which is also their nearest non-empty
        row BELOW.
    Both directions via pointer doubling over the (small) row axis.
    """
    n_rows = img.shape[0]
    rows = jnp.arange(n_rows, dtype=jnp.int32)
    d0 = jnp.where(row_nonempty, 0, _BIG).astype(jnp.int32)

    val_a, d_a = img, d0
    val_b, d_b = img, d0
    shift = 1
    while shift < n_rows:
        # from above (non-circular down-shift)
        sv = jnp.roll(val_a, shift, axis=0)
        sd = jnp.where(rows >= shift, jnp.roll(d_a, shift) + shift, _BIG)
        take = sd < d_a
        val_a = jnp.where(take[:, None], sv, val_a)
        d_a = jnp.minimum(d_a, sd)
        # from below (non-circular up-shift)
        sv = jnp.roll(val_b, -shift, axis=0)
        sd = jnp.where(rows < n_rows - shift, jnp.roll(d_b, -shift) + shift,
                       _BIG)
        take = sd < d_b
        val_b = jnp.where(take[:, None], sv, val_b)
        d_b = jnp.minimum(d_b, sd)
        shift *= 2

    filled = jnp.where((d_a < _BIG)[:, None], val_a, val_b)
    out = jnp.where(row_nonempty[:, None], img, filled)
    return jnp.where(jnp.any(row_nonempty), out, img)


@functools.partial(jax.jit, static_argnames=("method",))
def interpolate_range_image(img: jnp.ndarray,
                            method: str = "linear") -> jnp.ndarray:
    """Circular interpolation of empty (zero) pixels, per row.

    ``method='linear'`` is the reference's ``np.interp`` over circularly
    extended valid samples (range_image.py:52-64); ``method='nearest'`` is
    its nearest-valid-pixel fill (range_image.py:66-75) including the
    tie-break — ``np.argmin`` over ascending valid indices picks the
    candidate with the smaller ABSOLUTE column index, which with
    wraparound is not always the left neighbor. Both are followed by the
    empty-row fill (range_image.py:78-87). TPU-first: nearest valid pixel
    left/right via value-carrying pointer doubling (log2(width)
    roll+select steps, pure VPU) instead of scans + gathers along the
    lane axis.
    """
    if method not in ("linear", "nearest"):
        raise ValueError(f"unknown interpolation method: {method!r}")
    n_rows, width = img.shape
    valid = img > 0.0
    d0 = jnp.where(valid, 0, _BIG).astype(jnp.int32)

    val_l, d_l = img, d0
    val_r, d_r = img, d0
    shift = 1
    while shift < width:
        sv = jnp.roll(val_l, shift, axis=1)
        sd = jnp.roll(d_l, shift, axis=1) + shift
        take = sd < d_l
        val_l = jnp.where(take, sv, val_l)
        d_l = jnp.minimum(d_l, sd)
        sv = jnp.roll(val_r, -shift, axis=1)
        sd = jnp.roll(d_r, -shift, axis=1) + shift
        take = sd < d_r
        val_r = jnp.where(take, sv, val_r)
        d_r = jnp.minimum(d_r, sd)
        shift *= 2

    row_has_valid = jnp.any(valid, axis=1, keepdims=True)
    if method == "linear":
        dl = d_l.astype(img.dtype)
        dr = d_r.astype(img.dtype)
        denom = dl + dr
        safe = jnp.where(denom > 0, denom, 1.0)
        interp = (val_l * dr + val_r * dl) / safe
        interp = jnp.where(denom > 0, interp, val_l)
    else:
        # nearest: strictly closer side wins; on a distance tie the
        # reference's argmin returns the first (ascending) valid index,
        # i.e. the candidate at the smaller absolute column position.
        cols = jnp.arange(width, dtype=jnp.int32)[None, :]
        idx_l = jnp.mod(cols - d_l, width)
        idx_r = jnp.mod(cols + d_r, width)
        take_left = (d_l < d_r) | ((d_l == d_r) & (idx_l <= idx_r))
        interp = jnp.where(take_left, val_l, val_r)

    out = jnp.where(valid | ~row_has_valid, img, interp)
    return _fill_empty_rows(out, row_has_valid[:, 0])


@functools.partial(jax.jit, static_argnums=(1,))
def project_points_with_intensity(
    points: jnp.ndarray, config: ProjectionConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Projection that also returns the intensity image — the MAX intensity
    among points whose range exactly ties the pixel minimum, floored at 0
    (bit-identical to the reference's ``np.maximum.at`` over the
    closest-point mask with its zero-initialized buffer,
    range_image.py:217-230).

    Kept separate from :func:`project_points` so the descriptor hot path
    (which never reads intensity) doesn't pay for the extra sort operand
    and chains. Pipeline: packed sort → run-suffix-min (exact pixel min) →
    forward-fill of the run-start min across each run → suffix-max of the
    exact-tie-masked intensities.
    """
    rng, azimuth, elevation, finite = _spherical(points)
    valid = _valid_mask(rng, elevation, finite, config)
    intens = points[..., 3] if points.shape[-1] > 3 else jnp.zeros_like(rng)
    intens = jnp.where(valid & jnp.isfinite(intens), intens, 0.0)

    elev_span = config.elevation_max - config.elevation_min
    elev_bins = jnp.clip(
        jnp.floor((elevation - config.elevation_min) / elev_span
                  * config.n_elevation).astype(jnp.int32),
        0, config.n_elevation - 1)
    azim_bins = jnp.clip(
        jnp.floor(azimuth / (2.0 * jnp.pi) * config.n_azimuth).astype(jnp.int32),
        0, config.n_azimuth - 1)

    n_pix = config.n_elevation * config.n_azimuth
    linear_idx = jnp.where(valid, elev_bins * config.n_azimuth + azim_bins,
                           n_pix).astype(jnp.int32)
    vals = jnp.where(valid, rng, jnp.inf).astype(jnp.float32)

    n_points = linear_idx.shape[0]
    qb = _quant_bits(n_pix)
    qmax = (1 << qb) - 1
    quant = jnp.clip(
        (vals * (qmax / config.max_range)).astype(jnp.int32), 0, qmax)
    packed = (linear_idx << qb) | quant
    sorted_key, sorted_rng, sorted_int = jax.lax.sort(
        (packed, vals, intens.astype(jnp.float32)), num_keys=1)
    sorted_idx = jax.lax.shift_right_logical(sorted_key, qb)
    pos = jnp.arange(n_points, dtype=jnp.int32)

    # pass 1: exact per-run min (suffix-min over equal-pixel runs)
    run_min = sorted_rng
    shift = 1
    while shift < n_points:
        cand = jnp.roll(run_min, -shift)
        same = (jnp.roll(sorted_idx, -shift) == sorted_idx) & \
               (pos < n_points - shift)
        run_min = jnp.where(same, jnp.minimum(run_min, cand), run_min)
        shift *= 2

    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_idx[1:] != sorted_idx[:-1]])

    # pass 2: broadcast each run start's exact min forward over its run
    # (pointer doubling; mid-run slots start at +inf and take the value
    # carried from the left within the same pixel run)
    full_min = jnp.where(is_start, run_min, jnp.inf)
    shift = 1
    while shift < n_points:
        cand = jnp.roll(full_min, shift)
        same = (jnp.roll(sorted_idx, shift) == sorted_idx) & (pos >= shift)
        full_min = jnp.where(same, jnp.minimum(full_min, cand), full_min)
        shift *= 2

    # pass 3: max intensity among exact ties with the pixel min, floored
    # at 0 exactly like the reference's zero-initialized maximum.at buffer
    tie_int = jnp.where(sorted_rng == full_min, sorted_int, -jnp.inf)
    run_int = tie_int
    shift = 1
    while shift < n_points:
        cand = jnp.roll(run_int, -shift)
        same = (jnp.roll(sorted_idx, -shift) == sorted_idx) & \
               (pos < n_points - shift)
        run_int = jnp.where(same, jnp.maximum(run_int, cand), run_int)
        shift *= 2
    run_int = jnp.maximum(run_int, 0.0)
    target = jnp.where(is_start, sorted_idx, 1 << 29)
    rbuf = jnp.zeros((n_pix,), jnp.float32).at[target].set(
        run_min, mode="drop", unique_indices=True)
    ibuf = jnp.zeros((n_pix,), jnp.float32).at[target].set(
        run_int, mode="drop", unique_indices=True)
    img = jnp.where(jnp.isinf(rbuf), 0.0, rbuf)
    iimg = jnp.where(jnp.isinf(rbuf), 0.0, ibuf)
    return (img.reshape(config.n_elevation, config.n_azimuth),
            iimg.reshape(config.n_elevation, config.n_azimuth))


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


class RangeImageProjector:
    """Class-style wrapper matching the reference's projector surface
    (reference range_image.py:92: project/unproject methods) over the
    functional jit kernels. Accepts unpadded (N, 3|4) numpy clouds."""

    def __init__(self, n_elevation: int = 64, n_azimuth: int = 360,
                 elevation_range: Tuple[float, float] = (-24.8, 2.0),
                 max_range: float = 80.0, min_range: float = 1.0,
                 max_points: int = 131072):
        self.config = ProjectionConfig(
            n_elevation=n_elevation, n_azimuth=n_azimuth,
            elevation_range_deg=tuple(elevation_range),
            max_range=max_range, min_range=min_range)
        self.n_elevation = n_elevation
        self.n_azimuth = n_azimuth
        self.max_points = max_points

    def project(self, points: np.ndarray, keep_intensity: bool = False):
        """(N, 3|4) → range image (and intensity image when requested),
        as numpy. Returns (range_image, intensity_image|None) like the
        reference."""
        import jax.numpy as jnp
        padded = jnp.asarray(pad_points(points, self.max_points))
        if keep_intensity:
            img, iimg = project_points_with_intensity(padded, self.config)
            return np.asarray(img), np.asarray(iimg)
        return np.asarray(project_points(padded, self.config)), None

    def unproject(self, range_image: np.ndarray) -> np.ndarray:
        """Range image → (N, 3) valid points (reference :234-285)."""
        import jax.numpy as jnp
        pts, mask = unproject_range_image(jnp.asarray(range_image),
                                          self.config)
        return np.asarray(pts)[np.asarray(mask)]
