"""Ring-structured projection fast path — no global sort.

The general projection (ops/range_image.py) handles arbitrary point order
with a packed single-key ``lax.sort`` — which is ~2/3 of the full-density
hot path (~230 of 334 us/scan at 133k points, docs/performance.md). Real
spinning-LiDAR streams are not arbitrary: HDL-64E/VLP-class sensors emit
points RING-MAJOR with azimuth monotone within each ring (KITTI .bin
order; HeLiPR even carries an explicit ``ring`` field). For input shaped
``(B, n_rings, per_ring, 3|4)`` satisfying the structure contract below,
the per-pixel scatter-min (reference range_image.py:200-214) reduces to
segmented CIRCULAR run-mins along each ring — log2(per_ring) roll+select
stages on the VPU, zero sorts, zero scatters — with per-ring compaction
and expansion fused into the SAME VMEM kernel (ops/pallas_ring.py) on
TPU; the XLA chain below is the CPU/test fallback.

Structure contract (verified by :func:`ring_structure_report`; violating
inputs must use the general path — the caller decides, typically via one
host-side check per sensor/stream):

  C1. every VALID point of ring r falls in elevation row ``row_of_ring[r]``
      (rings are fixed laser angles; with ring angles away from row
      boundaries this holds exactly — the fast path therefore never
      computes per-point elevation);
  C2. within each ring the azimuth-bin sequence of valid points is
      circularly monotone: traversed linearly it is non-decreasing except
      for at most ``n_folds - 1`` wrap/jitter events (a clean spinning
      sweep has exactly one wrap → the default ``n_folds=2``);
  C3. ``row_of_ring`` is strictly increasing (sort rings by elevation on
      the host first — a static permutation).

Algorithm (all fixed-shape, jit-compatible):
  1. spherical range + azimuth bins only (no per-point elevation — C1);
  2. invalid points (NaN padding, range-gate failures, dropout) become
     TRANSPARENT via a circular jump-fill of the azimuth-bin key from the
     nearest valid point to the left (log2 P stages) — they join that
     point's run carrying value +inf;
  3. per-position fold index f (inclusive count of linear non-increase
     events, found with ``n_folds`` min-reduces — at most n_folds-1
     events per contract ring; events at or before the first RAW-valid
     position are excluded — leading holes adopt the circular tail key,
     so the circular boundary comparison happens there, not at column
     0); run identity is the FOLDED key
     ``azbin + 360·f``, which is non-decreasing along the ring, so the
     run-min doubling needs no window-uniformity carry;
  4. segmented run-min on folded keys: each start carries the exact min
     of its own fold piece (a wrap-around run splits into head and tail
     pieces whose fold-min reunites to the exact circular min); start
     targets are strictly increasing per ring, and the fold-min at the
     end restores exact scatter-min semantics;
  5. per-ring rank prefix → leftward compaction butterfly → rightward
     expansion into the ring's own (n_folds·360)-wide folded row — all
     inside the one VMEM kernel on TPU — then fold-min and static row
     placement.

Exactness: identical output to ``project_points_batch`` for any input
satisfying C1-C3 (tests/test_ring_path.py proves bit-equality on CPU and
the TPU run is covered by the same parity bars as the general path).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neural_spectral_codec_tpu.ops.range_image import (
    ProjectionConfig, _densify_xla)


def _ring_keys(points: jnp.ndarray, config: ProjectionConfig):
    """(B, R, P, 3|4) → (range, azimuth-bin-f32 with -1 at invalid).

    Same gates and bin formulas as the general path's ``_spherical`` +
    binning (range_image.py:54-97) minus the elevation computation (C1
    makes it statically known per ring)."""
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    finite = jnp.isfinite(x) & jnp.isfinite(y) & jnp.isfinite(z)
    x = jnp.where(finite, x, 1.0)
    y = jnp.where(finite, y, 0.0)
    z = jnp.where(finite, z, 0.0)
    x_sq = jnp.clip(x * x, 0.0, 1e10)
    y_sq = jnp.clip(y * y, 0.0, 1e10)
    z_sq = jnp.clip(z * z, 0.0, 1e10)
    rng = jnp.sqrt(x_sq + y_sq + z_sq)
    azimuth = jnp.arctan2(y, x)
    azimuth = jnp.mod(azimuth + jnp.pi, 2.0 * jnp.pi)
    valid = finite & (rng >= config.min_range) & (rng <= config.max_range)
    if config.elevation_mode == "drop":
        # per-point elevation gate, matching range_image._valid_mask —
        # rings sweep nominally-constant elevations but snapped/real beams
        # can straddle the band edge (static branch: free in clip mode)
        elevation = jnp.arctan2(z, jnp.sqrt(x_sq + y_sq))
        valid = valid & (elevation >= config.elevation_min) \
            & (elevation <= config.elevation_max)
    azb = jnp.clip(
        jnp.floor(azimuth / (2.0 * jnp.pi) * config.n_azimuth), 0.0,
        config.n_azimuth - 1.0)
    key = jnp.where(valid, azb, -1.0).astype(jnp.float32)
    vals = jnp.where(valid, rng, jnp.inf).astype(jnp.float32)
    return vals, key


def _ring_run_starts(key: jnp.ndarray, vals: jnp.ndarray, n_azim: int,
                     n_folds: int, fill_stages: int = None,
                     runmin_stages: int = None):
    """Per-ring circular segment-min without sorting.

    key:  (N, P) azimuth bin (f32), -1 at invalid slots.
    vals: (N, P) range, +inf at invalid slots.
    Returns (col_f, min_f): the folded target column (azbin + n_azim·fold,
    f32, -1 at non-starts / fold-overflow) and the exact run min at each
    start. All comparisons/carries in f32 (values < 2^24, exact).

    Run identity is the FOLDED key (azbin + n_azim·fold with fold
    computed per POSITION): the folded-key sequence is non-decreasing
    along the ring, so window-endpoint equality already implies window
    uniformity and the doubling needs no separate uniformity carry (one
    fewer rolled array per stage). A wrap-around run thereby splits into
    its head (fold 0) and tail (last fold) pieces, each start carrying
    its own piece's min — the downstream fold-min reunites them into the
    exact circular pixel min, so the final image is unchanged. Fold
    positions come from ``n_folds`` min-reduces (at most n_folds-1 wrap
    events per contract-satisfying ring) instead of a log2(P)-stage
    prefix."""
    P = key.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, key.shape, key.ndim - 1)
    colf32 = col.astype(jnp.float32)

    # position of the first RAW-valid point (before fill): leading holes
    # adopt the circular tail key, so the circular run boundary sits at
    # the first valid position, not necessarily at column 0 — fold
    # events at or before it would be phantom wrap events
    first_valid = jnp.min(jnp.where(key >= 0.0, colf32, float(P)),
                          axis=-1, keepdims=True)

    full = max((P - 1).bit_length(), 1)
    fill_stages = full if fill_stages is None else min(fill_stages, full)
    runmin_stages = full if runmin_stages is None \
        else min(runmin_stages, full)

    # 1. circular jump-fill: holes adopt the nearest valid key to the
    #    left (``fill_stages`` may be host-bounded — see
    #    ring_stage_bounds and the kernel-side proof in pallas_ring)
    for j in range(fill_stages):
        key = jnp.where(key < 0.0, jnp.roll(key, 1 << j, axis=-1), key)

    # 2. run starts on RAW keys (positions where the key changes).
    #    The FIRST RAW-VALID position is ALWAYS a start: a wrap-around
    #    run whose head piece begins there has no key change (leading
    #    holes adopt the circular tail key through the fill), yet its
    #    head-piece min must be emitted (fold 0) — the tail start only
    #    carries the tail piece under folded-key run identity. This also
    #    covers circularly-constant rings. Forcing the start at column 0
    #    instead would be WRONG when column 0 is a hole: the filled slot
    #    carries the tail key at fold 0, and on a zero-wrap ring that
    #    aliases the real final run's folded key — the circular roll in
    #    the run-min doubling can then hand the phantom a finite min
    #    (whenever a power-of-two offset lands inside the final run),
    #    emitting a duplicate target that breaks the strictly-increasing
    #    precondition of the compaction/expansion butterflies. Leading
    #    holes therefore never emit starts (their rings' circular
    #    boundary sits at first_valid).
    prev = jnp.roll(key, 1, axis=-1)
    start = ((key != prev) | (colf32 == first_valid)) & (key >= 0.0)

    # 3. per-position fold index via event-position reduces: event k's
    #    position is the k-th linear non-increase among starts; f[p] =
    #    #{events at positions <= p}, clamped at n_folds (clamped runs
    #    are dropped below and cannot merge with kept ones — their
    #    folded keys differ from every kept run's)
    noninc = start & (colf32 > first_valid) & (key <= prev)
    f = jnp.zeros(key.shape, jnp.float32)
    big = float(P)
    lo = jnp.full(key.shape[:-1] + (1,), -1.0)
    for _ in range(n_folds):
        pos_k = jnp.min(jnp.where(noninc & (colf32 > lo), colf32, big),
                        axis=-1, keepdims=True)
        f = f + jnp.where(colf32 >= pos_k, 1.0, 0.0)
        lo = pos_k

    fkey = key + float(n_azim) * f

    # 4. segmented run-min (forward doubling on the folded key; no
    #    uniformity carry needed — see docstring; ``runmin_stages`` may
    #    be host-bounded, see ring_stage_bounds)
    m = vals
    for j in range(runmin_stages):
        sh = 1 << j
        fkey_s = jnp.roll(fkey, -sh, axis=-1)
        m_s = jnp.roll(m, -sh, axis=-1)
        m = jnp.where(fkey_s == fkey, jnp.minimum(m, m_s), m)

    start = start & jnp.isfinite(m)
    # overflowing folds (contract violation beyond n_folds-1) are DROPPED,
    # never allowed to corrupt the monotone routing
    col_f = jnp.where(start & (f <= float(n_folds - 1)), fkey, -1.0)
    return col_f, m


def _fold_min(img_folded: jnp.ndarray, n_folds: int,
              n_azim: int) -> jnp.ndarray:
    """(B, R, n_folds·A) → (B, R, A) treating 0 as empty (+inf)."""
    b, r, _ = img_folded.shape
    x = img_folded.reshape(b, r, n_folds, n_azim)
    x = jnp.where(x > 0.0, x, jnp.inf)
    x = jnp.min(x, axis=2)
    return jnp.where(jnp.isinf(x), 0.0, x)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def project_rings_batch(points: jnp.ndarray, config: ProjectionConfig,
                        row_of_ring: Tuple[int, ...],
                        n_folds: int = 2,
                        stage_bounds: Optional[Tuple[int, ...]] = None
                        ) -> jnp.ndarray:
    """(B, R, P, 3|4) ring-structured clouds → (B, n_elev, n_azim) range
    images, bit-identical to ``project_points_batch`` on the flattened
    points for inputs satisfying C1-C3 (module docstring).

    ``row_of_ring`` must be a strictly-increasing tuple of image rows
    (C3); rows without a ring stay empty.

    ``stage_bounds=(fill_stages, runmin_stages[, compact_stages,
    expand_stages])`` bounds the doubling/butterfly depths; pass only values certified for this input by
    :func:`ring_stage_bounds` (output stays bit-identical). ``None`` =
    fully general log2(P) depth."""
    rows = tuple(int(v) for v in row_of_ring)
    if list(rows) != sorted(set(rows)):
        raise ValueError("row_of_ring must be strictly increasing (C3); "
                         "sort rings by elevation on the host first")
    if max(rows) >= config.n_elevation:
        raise ValueError("row_of_ring exceeds n_elevation")
    b, R, P = points.shape[:3]
    if R != len(rows):
        raise ValueError(f"{R} rings but {len(rows)} row assignments")

    vals, key = _ring_keys(points, config)
    # pad BEFORE the stage chain: key = -1 / val = +inf pad slots behave
    # exactly like dropout (transparent through the jump-fill), so the
    # circular rolls over the padded width compute identical runs
    ppad = -(-P // 128) * 128
    if ppad != P:
        key = jnp.pad(key, ((0, 0), (0, 0), (0, ppad - P)),
                      constant_values=-1.0)
        vals = jnp.pad(vals, ((0, 0), (0, 0), (0, ppad - P)),
                       constant_values=jnp.inf)
    width = n_folds * config.n_azimuth

    bounds4 = tuple(stage_bounds) + (None,) * (4 - len(stage_bounds)) \
        if stage_bounds else (None,) * 4
    fill_st, runmin_st, compact_st, expand_st = bounds4
    if jax.default_backend() == "tpu":
        # ONE fused VMEM kernel per 8 rings: stage chain + in-VMEM
        # per-ring compaction + expansion into the folded rows — no
        # intermediate HBM arrays at all
        from neural_spectral_codec_tpu.ops.pallas_ring import (
            ring_fold_pallas)
        folded = ring_fold_pallas(
            key.reshape(b * R, ppad), vals.reshape(b * R, ppad),
            config.n_azimuth, n_folds, False, fill_st, runmin_st,
            compact_st, expand_st)
        folded = folded[:, :width].reshape(b, R, width)
    else:
        # XLA fallback (CPU tests): the flattened (ring-major) start
        # sequence has globally increasing targets, which is exactly
        # _densify_xla's precondition
        col_f, m = _ring_run_starts(key.reshape(b * R, ppad),
                                    vals.reshape(b * R, ppad),
                                    config.n_azimuth, n_folds,
                                    fill_st, runmin_st)
        col_f = col_f.reshape(b, R, ppad)
        m = m.reshape(b, R, ppad)
        ring_base = (jnp.arange(R, dtype=jnp.float32)
                     * float(width))[None, :, None]
        pix = jnp.where(col_f >= 0.0, col_f + ring_base,
                        float(1 << 29)).astype(jnp.int32)
        folded = _densify_xla(
            pix.reshape(b, R * ppad),
            jnp.where(col_f >= 0.0, m, 0.0).reshape(b, R * ppad),
            (col_f >= 0.0).reshape(b, R * ppad),
            R * width).reshape(b, R, width)

    ring_rows = _fold_min(folded, n_folds, config.n_azimuth)

    if rows == tuple(range(config.n_elevation)):
        return ring_rows
    # static row placement: image row e ← its ring (or a zero row)
    inv = np.full(config.n_elevation, R, np.int32)
    for i, e in enumerate(rows):
        inv[e] = i
    padded = jnp.concatenate(
        [ring_rows, jnp.zeros((b, 1, config.n_azimuth), jnp.float32)],
        axis=1)
    return jnp.take(padded, jnp.asarray(inv), axis=1)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def encode_points_ring_batch(points: jnp.ndarray, alpha: jnp.ndarray,
                             config, row_of_ring: Tuple[int, ...],
                             n_folds: int = 2,
                             stage_bounds: Optional[Tuple[int, ...]] = None
                             ) -> jnp.ndarray:
    """Ring-structured variant of ``ops.spectral.encode_points_batch``:
    (B, R, P, 3|4) → (B, output_dim) descriptors, identical output for
    contract-satisfying inputs, without the general path's global sort.
    ``stage_bounds`` as in :func:`project_rings_batch` (host-certified
    via :func:`ring_stage_bounds`)."""
    from neural_spectral_codec_tpu.ops.range_image import (
        interpolate_range_image)
    from neural_spectral_codec_tpu.ops.spectral import (
        encode_range_image_batch)

    imgs = project_rings_batch(points, config.projection, row_of_ring,
                               n_folds, stage_bounds)
    use_pallas = config.use_pallas
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from neural_spectral_codec_tpu.ops.pallas_spectral import (
            encode_range_image_batch_pallas)
        return encode_range_image_batch_pallas(imgs, alpha, config)
    if config.interpolate_empty:
        imgs = jax.vmap(interpolate_range_image)(imgs)
    return encode_range_image_batch(imgs, alpha, config)


# ---------------------------------------------------------------------------
# contract checking + structured-scan synthesis (host side)
# ---------------------------------------------------------------------------

def ring_elevation_centers(config: ProjectionConfig,
                           n_rings: int) -> np.ndarray:
    """Ring elevation angles at the centers of the image's first
    ``n_rings`` elevation bins (radians, increasing)."""
    lo, hi = config.elevation_min, config.elevation_max
    step = (hi - lo) / config.n_elevation
    return lo + step * (np.arange(n_rings) + 0.5)


def _elev_gate_np(valid: np.ndarray, elev: np.ndarray,
                  config: ProjectionConfig) -> np.ndarray:
    """Host-side drop-mode elevation gate (mirrors
    range_image._valid_mask; no-op in clip mode)."""
    if config.elevation_mode == "drop":
        valid = valid & (elev >= config.elevation_min) \
            & (elev <= config.elevation_max)
    return valid


def ring_structure_report(points: np.ndarray, config: ProjectionConfig,
                          row_of_ring: Sequence[int]) -> dict:
    """Host-side contract check for (B, R, P, 3|4) input (numpy mirror of
    the device formulas). Returns a dict with ``ok`` plus the violation
    counts; callers route non-conforming streams to the general path."""
    pts = np.asarray(points)
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    finite = np.isfinite(x) & np.isfinite(y) & np.isfinite(z)
    xs = np.where(finite, x, 1.0)
    ys = np.where(finite, y, 0.0)
    zs = np.where(finite, z, 0.0)
    rng = np.sqrt(np.clip(xs * xs, 0, 1e10) + np.clip(ys * ys, 0, 1e10)
                  + np.clip(zs * zs, 0, 1e10))
    valid = finite & (rng >= config.min_range) & (rng <= config.max_range)
    az = np.mod(np.arctan2(ys, xs) + np.pi, 2 * np.pi)
    azb = np.clip(np.floor(az / (2 * np.pi) * config.n_azimuth), 0,
                  config.n_azimuth - 1).astype(np.int64)
    elev = np.arctan2(zs, np.sqrt(np.clip(xs * xs, 0, 1e10)
                                  + np.clip(ys * ys, 0, 1e10)))
    # drop mode: dropped points are holes, not contract violations
    valid = _elev_gate_np(valid, elev, config)
    span = config.elevation_max - config.elevation_min
    eb = np.clip(np.floor((elev - config.elevation_min) / span
                          * config.n_elevation), 0,
                 config.n_elevation - 1).astype(np.int64)

    rows = np.asarray(row_of_ring, np.int64)
    off_row = int((valid & (eb != rows[None, :, None])).sum())

    max_folds = 1
    b, R, P = valid.shape
    for bi in range(b):
        for r in range(R):
            seq = azb[bi, r][valid[bi, r]]
            if len(seq) < 2:
                continue
            runs = seq[np.concatenate([[True], seq[1:] != seq[:-1]])]
            noninc = int(np.sum(runs[1:] <= runs[:-1]))
            max_folds = max(max_folds, 1 + noninc)
    return {
        "ok": off_row == 0 and np.all(np.diff(rows) > 0),
        "off_row_points": off_row,
        "rows_strictly_increasing": bool(np.all(np.diff(rows) > 0)),
        "max_folds_needed": max_folds,
    }


_STAGE_LADDER = (2, 4, 6, 8)
# compaction/expansion displacement-bit ladder (their stage counts are
# bit_length(max displacement), typically 9-12 at full width)
_COMPACT_LADDER = (6, 8, 9, 10, 11)


def ring_stage_bounds(points: np.ndarray, config: ProjectionConfig,
                      ppad: Optional[int] = None,
                      n_folds: int = 2
                      ) -> Optional[Tuple[int, int, int, int]]:
    """Host-side certification of bounded doubling depths for this input:
    returns ``(fill_stages, runmin_stages, compact_stages,
    expand_stages)`` such that the bounded kernel is bit-identical to
    the fully-general one on these points, or None when no bound below
    the general depths can be certified.

    Exactness conditions (proofs at the kernel loops, pallas_ring.py):
      * jump-fill reach 2^K−1 must cover every INTERIOR invalid run — a
        maximal run of invalid lanes with a valid lane after it in the
        same ring (leading runs are never starts/noninc events; trailing
        runs, including the 128-alignment pad, only ever carry +inf);
      * the run-min window 2^J must cover, for every run (maximal
        equal-key block of the filled sequence), the distance from its
        start to its last VALID lane (holes beyond carry +inf and cannot
        change a min);
      * the LSB-first compaction needs bit_length(max disp0) stages
        where disp0 = start column − rank among flagged starts, and the
        MSB-first expansion bit_length(max d1) where d1 = folded target
        − rank — both computed EXACTLY here by replaying the kernel's
        start/fold/flag logic on the filled key sequence.
    Bounds are rounded up to small ladders so a stream compiles a
    handful of kernel variants, not one per scan.
    """
    pts = np.asarray(points)
    if pts.ndim == 3:
        pts = pts[None]
    b, R, P = pts.shape[:3]
    ppad = ppad or -(-P // 128) * 128
    full = max((ppad - 1).bit_length(), 1)

    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    finite = np.isfinite(x) & np.isfinite(y) & np.isfinite(z)
    xs = np.where(finite, x, 1.0)
    ys = np.where(finite, y, 0.0)
    zs = np.where(finite, z, 0.0)
    rng = np.sqrt(np.clip(xs * xs, 0, 1e10) + np.clip(ys * ys, 0, 1e10)
                  + np.clip(zs * zs, 0, 1e10))
    valid = finite & (rng >= config.min_range) & (rng <= config.max_range)
    elev = np.arctan2(zs, np.sqrt(np.clip(xs * xs, 0, 1e10)
                                  + np.clip(ys * ys, 0, 1e10)))
    valid = _elev_gate_np(valid, elev, config)
    az = np.mod(np.arctan2(ys, xs) + np.pi, 2 * np.pi)
    azb = np.clip(np.floor(az / (2 * np.pi) * config.n_azimuth), 0,
                  config.n_azimuth - 1).astype(np.int64)

    max_hole = 0
    max_extent = 1
    max_disp = 0
    max_d1 = 1
    n_azim = config.n_azimuth
    for bi in range(b):
        for r in range(R):
            v = valid[bi, r]
            if not v.any():
                continue
            pos = np.flatnonzero(v)
            # interior hole runs = gaps between consecutive valid lanes
            if len(pos) > 1:
                gaps = np.diff(pos) - 1
                if len(gaps):
                    max_hole = max(max_hole, int(gaps.max()))
            # filled key sequence over the valid span; block starts where
            # the key changes; extent = distance from block start to the
            # block's last valid lane
            keys = azb[bi, r]
            fill_idx = np.maximum.accumulate(
                np.where(v, np.arange(P), -1))
            span = fill_idx >= 0          # at/after first_valid
            fk = keys[np.maximum(fill_idx, 0)]
            change = np.ones(P, bool)
            change[1:] = fk[1:] != fk[:-1]
            change[pos[0]] = True        # first_valid always starts a block
            block_id = np.cumsum(change & span) - 1
            # last valid lane per block, block start per block
            starts = np.flatnonzero(change & span)
            vb = block_id[v & span]
            last_valid = np.full(len(starts), -1, np.int64)
            np.maximum.at(last_valid, vb, np.flatnonzero(v & span))
            ext = last_valid - starts + 1
            if len(ext):
                max_extent = max(max_extent, int(ext.max()))
            # replay the kernel's fold/flag/rank logic: noninc events
            # (fold increments) are starts after first_valid whose key
            # does not increase; flagged = fold index ≤ n_folds−1; rank
            # = position among flagged starts
            if len(starts):
                noninc = np.zeros(len(starts), bool)
                if len(starts) > 1:
                    noninc[1:] = fk[starts[1:]] <= fk[starts[1:] - 1]
                f = np.cumsum(noninc)
                flagged = f <= n_folds - 1
                fsp = starts[flagged]
                if len(fsp):
                    rank = np.arange(len(fsp))
                    max_disp = max(max_disp, int((fsp - rank).max()))
                    fkey = fk[fsp] + n_azim * f[flagged]
                    max_d1 = max(max_d1, int((fkey - rank).max()))

    full_e = max((n_folds * n_azim - 1).bit_length(), 1)
    fill_req = max(max_hole, 0).bit_length()          # reach 2^K−1 ≥ hole
    runmin_req = max((max_extent - 1).bit_length(), 1)  # window 2^J ≥ ext
    compact_req = max(max_disp.bit_length(), 1)       # bits of max disp0
    expand_req = max(max_d1.bit_length(), 1)          # bits of max d1
    fill_st = next((k for k in _STAGE_LADDER if k >= fill_req), full)
    runmin_st = next((k for k in _STAGE_LADDER if k >= runmin_req), full)
    compact_st = next((k for k in _COMPACT_LADDER if k >= compact_req),
                      full)
    expand_st = next((k for k in _COMPACT_LADDER if k >= expand_req),
                     full_e)
    out = (min(fill_st, full), min(runmin_st, full),
           min(compact_st, full), min(expand_st, full_e))
    if out == (full, full, full, full_e):
        return None
    return out


def points_to_rings(points: np.ndarray, ring_ids: np.ndarray,
                    n_rings: Optional[int] = None,
                    per_ring: Optional[int] = None) -> np.ndarray:
    """Bucket a flat (N, 3|4) cloud into ring-major (R, P, 4) layout,
    preserving per-ring sensor order (spinning sensors emit each ring in
    azimuth order — HeLiPR records carry the ``ring`` field directly,
    reference helipr_loader.py:133-140). Rings shorter than P are padded
    with NaN (transparent to the ring path)."""
    pts = np.asarray(points, np.float32)
    if pts.shape[1] == 3:
        pts = np.concatenate([pts, np.zeros((len(pts), 1), np.float32)], 1)
    rid = np.asarray(ring_ids).astype(np.int64)
    R = int(n_rings if n_rings is not None else rid.max() + 1)
    counts = np.bincount(rid, minlength=R)
    P = int(per_ring if per_ring is not None else counts.max())
    out = np.full((R, P, 4), np.nan, np.float32)
    # stable per-ring order == original sensor order
    order = np.argsort(rid, kind="stable")
    starts = np.zeros(R + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    for r in range(R):
        seg = order[starts[r]:starts[r + 1]][:P]
        out[r, :len(seg)] = pts[seg]
    return out


def infer_ring_ids_from_sweep(points: np.ndarray,
                              min_ring_gap_rad: float = 2e-3
                              ) -> np.ndarray:
    """Recover per-point ring ids from a RING-MAJOR flat stream that
    carries no explicit ring field (KITTI .bin order: each laser's full
    sweep stored contiguously, lasers ordered by elevation — reference
    kitti_loader.py stores the raw stream untouched).

    A ring is a fixed laser, so its elevation ANGLE is constant along
    the sweep; a new ring starts where the elevation angle jumps by more
    than ``min_ring_gap_rad`` (HDL-64E ring spacing is ~7e-3 rad, so the
    default sits well under one gap and well above fp noise). Azimuth
    wraps cannot mark boundaries — a ring that starts mid-sweep wraps
    once WITHIN the ring (exactly the fold event the ring path handles).
    Invalid points (NaN) inherit the current ring.

    The result feeds :func:`encode_structured`, whose contract checks
    fall back to the exact general path if the stream was not actually
    ring-major — so a wrong guess can never corrupt a descriptor."""
    pts = np.asarray(points)
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    finite = np.isfinite(x) & np.isfinite(y) & np.isfinite(z)
    xs = np.where(finite, x, 1.0)
    ys = np.where(finite, y, 0.0)
    zs = np.where(finite, z, 0.0)
    elev = np.arctan2(zs, np.sqrt(np.clip(xs * xs, 0, 1e10)
                                  + np.clip(ys * ys, 0, 1e10)))
    # forward-fill invalid elevations so holes never fake a boundary
    idx = np.where(finite, np.arange(len(pts)), -1)
    np.maximum.accumulate(idx, out=idx)
    filled = np.where(idx >= 0, elev[np.maximum(idx, 0)], elev)
    jump = np.abs(np.diff(filled)) > min_ring_gap_rad
    return np.concatenate([[0], np.cumsum(jump)]).astype(np.int64)


def infer_ring_ids_by_elevation(points: np.ndarray,
                                min_ring_gap_rad: float = 2e-3,
                                max_rings: int = 128
                                ) -> Optional[np.ndarray]:
    """Recover ring ids for a FIRING-INTERLEAVED stream (ring cycling
    per azimuth step — NCLT's HDL-32E order, or any VLP stream whose
    ring field was stripped), where :func:`infer_ring_ids_from_sweep`'s
    in-order jump detection sees a boundary at every point.

    A ring is a fixed laser with a (near-)constant elevation angle, so
    the SORTED elevations of a scan cluster into at most n_beams bands
    separated by the inter-beam gap (HDL-32E spacing ~23 mrad vs ~sub-
    mrad coordinate-quantization noise). Cluster = maximal run of sorted
    elevations with consecutive gaps ≤ ``min_ring_gap_rad``; ring id =
    cluster index (bottom-up). Returns None when the elevations don't
    separate into ≤ ``max_rings`` bands (dense/unstructured cloud) —
    and, as with every inference here, :func:`prepare_structured`'s
    contract check falls back to the exact general path if the guess is
    wrong, so a misassignment can never corrupt a descriptor. Invalid
    (NaN) points inherit the previous point's ring (sensor-order
    locality), becoming in-ring holes."""
    pts = np.asarray(points)
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    finite = np.isfinite(x) & np.isfinite(y) & np.isfinite(z)
    if not finite.any():
        return None
    xs = np.where(finite, x, 1.0)
    ys = np.where(finite, y, 0.0)
    zs = np.where(finite, z, 0.0)
    elev = np.arctan2(zs, np.sqrt(np.clip(xs * xs, 0, 1e10)
                                  + np.clip(ys * ys, 0, 1e10)))
    ev = np.sort(elev[finite])
    boundaries = ev[:-1][np.diff(ev) > min_ring_gap_rad]  # cluster tops
    if len(boundaries) + 1 > max_rings:
        return None
    # side="left": a point exactly AT a cluster's top elevation belongs
    # to that (lower) cluster, not the next one
    rid = np.searchsorted(boundaries, elev, side="left").astype(np.int64)
    # NaN points: inherit the previous valid point's ring
    idx = np.where(finite, np.arange(len(pts)), -1)
    np.maximum.accumulate(idx, out=idx)
    return rid[np.maximum(idx, 0)]


def infer_row_of_ring(rings: np.ndarray,
                      config: ProjectionConfig) -> np.ndarray:
    """Per-ring dominant elevation row (mode over valid points) — the
    ``row_of_ring`` assignment for sensors whose ring angles are not
    known a priori. Pair with :func:`ring_structure_report` to verify
    contract C1 holds exactly before trusting it."""
    x, y, z = rings[..., 0], rings[..., 1], rings[..., 2]
    finite = np.isfinite(x) & np.isfinite(y) & np.isfinite(z)
    xs = np.where(finite, x, 1.0)
    ys = np.where(finite, y, 0.0)
    zs = np.where(finite, z, 0.0)
    rng = np.sqrt(np.clip(xs * xs, 0, 1e10) + np.clip(ys * ys, 0, 1e10)
                  + np.clip(zs * zs, 0, 1e10))
    valid = finite & (rng >= config.min_range) & (rng <= config.max_range)
    elev = np.arctan2(zs, np.sqrt(np.clip(xs * xs, 0, 1e10)
                                  + np.clip(ys * ys, 0, 1e10)))
    # drop mode: an entirely out-of-band ring must report row -1
    # (dropped), not vote itself into a clipped boundary row
    valid = _elev_gate_np(valid, elev, config)
    span = config.elevation_max - config.elevation_min
    eb = np.clip(np.floor((elev - config.elevation_min) / span
                          * config.n_elevation), 0,
                 config.n_elevation - 1).astype(np.int64)
    rows = np.zeros(rings.shape[0], np.int64)
    for r in range(rings.shape[0]):
        v = eb[r][valid[r]]
        rows[r] = np.bincount(v, minlength=config.n_elevation).argmax() \
            if len(v) else -1
    return rows


def prepare_structured(points: np.ndarray, ring_ids: np.ndarray, config,
                       per_ring: Optional[int] = None):
    """Host-side half of :func:`encode_structured`: bucket a flat cloud
    into ring-major layout and verify the structure contract (C1-C3 plus
    the fold budget). Returns ``(rings, rows)`` — a NaN-padded
    128-aligned ``(R, Ppad, 4)`` array and the strictly-increasing row
    tuple — when the ring fast path applies, else ``None`` (callers fall
    back to the exact general sorted path). Split out so batch encoders
    can group prepared scans into fixed-shape device batches
    (pipeline.RingMajorBatchEncoder)."""
    proj = config.projection
    rings = points_to_rings(points, ring_ids, per_ring=per_ring)
    n_rings_bucketed, ring_capacity = rings.shape[0], rings.shape[1]
    rows = infer_row_of_ring(rings, proj)
    # row -1 = a ring with NO valid points (range-gated, or out of the
    # elevation band in drop mode): its points contribute nothing to the
    # image on either path, so dropping the ring whole is exact
    keep = rows >= 0
    rings, rows = rings[keep], rows[keep]
    order = np.argsort(rows, kind="stable")
    rings, rows = rings[order], rows[order]
    ok = len(rows) > 0 and np.all(np.diff(rows) > 0)
    if ok:
        rep = ring_structure_report(rings[None], proj, rows)
        ok = rep["ok"] and rep["max_folds_needed"] <= 2
        # dropping overflow points in points_to_rings would silently
        # change the image — the capacity check uses the PRE-drop shape
        # (dropped rings still held their points in the buckets)
        ok = ok and n_rings_bucketed * ring_capacity >= len(points)
        counts = np.bincount(np.asarray(ring_ids).astype(np.int64))
        ok = ok and counts.max() <= ring_capacity
    if not ok:
        return None
    pp = -(-rings.shape[1] // 128) * 128
    bounds = ring_stage_bounds(rings, proj, ppad=pp)
    if pp != rings.shape[1]:
        rings = np.pad(rings, ((0, 0), (0, pp - rings.shape[1]),
                               (0, 0)), constant_values=np.nan)
    return rings, tuple(int(r) for r in rows), bounds


def encode_structured(points: np.ndarray, ring_ids: np.ndarray, alpha,
                      config, per_ring: Optional[int] = None) -> np.ndarray:
    """Host convenience: encode ONE flat cloud through the ring fast
    path when its ring structure satisfies the contract, falling back to
    the general sorted path otherwise. Always exact — the fallback (and
    the contract checks) guarantee output equals
    ``ops.spectral.encode_points_batch`` on the flat cloud."""
    import jax.numpy as jnp

    from neural_spectral_codec_tpu.ops.range_image import pad_points
    from neural_spectral_codec_tpu.ops.spectral import encode_points_batch

    prep = prepare_structured(points, ring_ids, config, per_ring=per_ring)
    if prep is not None:
        rings, rows, bounds = prep
        return np.asarray(encode_points_ring_batch(
            jnp.asarray(rings[None]), jnp.float32(alpha), config,
            rows, 2, bounds))[0]
    return np.asarray(encode_points_batch(
        jnp.asarray(pad_points(np.asarray(points), 1 << int(np.ceil(
            np.log2(max(len(points), 64)))))[None]),
        jnp.float32(alpha), config))[0]


def make_structured_ring_scans(batch: int, n_rings: int, per_ring: int,
                               config: ProjectionConfig, seed: int = 0,
                               dropout: float = 0.08) -> np.ndarray:
    """Synthetic ring-major scans satisfying C1-C3: each ring sweeps a
    cone at its elevation-bin center with uniformly increasing azimuth
    from a random start angle, random ranges, NaN dropout. The timing
    workload of a real spinning-LiDAR stream (the hot path's roll/compare
    networks are data-oblivious), with the structure contract holding by
    construction."""
    rng = np.random.default_rng(seed)
    el = ring_elevation_centers(config, n_rings)                # (R,)
    phi0 = rng.uniform(0, 2 * np.pi, (batch, n_rings, 1))
    az = phi0 + (np.arange(per_ring) / per_ring * 2 * np.pi)[None, None, :]
    r = rng.uniform(2.0, 70.0, (batch, n_rings, per_ring))
    ce, se = np.cos(el)[None, :, None], np.sin(el)[None, :, None]
    pts = np.stack([r * ce * np.cos(az), r * ce * np.sin(az),
                    r * se * np.ones_like(az),
                    rng.uniform(0, 1, r.shape)], axis=-1).astype(np.float32)
    drop = rng.random(r.shape) < dropout
    pts[drop] = np.nan
    return pts
