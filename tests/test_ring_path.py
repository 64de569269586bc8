"""Ring-structured projection fast path: bit-equality with the general
sort-based path on contract-satisfying inputs (CPU; the TPU VMEM variant
shares the compact/expand kernels already covered by test_encoding's
device parity bars)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from neural_spectral_codec_tpu.ops.range_image import (
    ProjectionConfig, project_points_batch)
from neural_spectral_codec_tpu.ops.ring_path import (
    encode_points_ring_batch, make_structured_ring_scans,
    project_rings_batch, ring_structure_report)
from neural_spectral_codec_tpu.ops.spectral import (
    SpectralEncoderConfig, encode_points_batch)


CFG = ProjectionConfig()          # 64 x 360
ROWS = tuple(range(64))


def _flatten(pts):
    b = pts.shape[0]
    return pts.reshape(b, -1, pts.shape[-1])


def test_structured_scans_satisfy_contract():
    pts = make_structured_ring_scans(2, 64, 256, CFG, seed=0)
    rep = ring_structure_report(pts, CFG, ROWS)
    assert rep["ok"], rep
    assert rep["max_folds_needed"] <= 2


def test_ring_path_matches_general_path_bitexact():
    pts = make_structured_ring_scans(3, 64, 256, CFG, seed=1)
    img_ring = np.asarray(project_rings_batch(jnp.asarray(pts), CFG, ROWS))
    img_gen = np.asarray(project_points_batch(
        jnp.asarray(_flatten(pts)), CFG))
    np.testing.assert_array_equal(img_ring, img_gen)


def test_ring_path_dense_rings_with_collisions():
    """More points per ring than azimuth bins → every pixel contested;
    run-min must still equal the general scatter-min exactly."""
    pts = make_structured_ring_scans(2, 64, 1024, CFG, seed=2,
                                     dropout=0.15)
    img_ring = np.asarray(project_rings_batch(jnp.asarray(pts), CFG, ROWS))
    img_gen = np.asarray(project_points_batch(
        jnp.asarray(_flatten(pts)), CFG))
    np.testing.assert_array_equal(img_ring, img_gen)


def test_ring_path_partial_ring_set():
    """Fewer rings than image rows, non-contiguous row assignment: the
    unassigned rows stay empty and assigned rows match the general path."""
    rows = tuple(range(0, 64, 2))            # 32 rings on even rows
    cfg = CFG
    pts = make_structured_ring_scans(2, 64, 200, cfg, seed=3)[:, ::2]
    # rebuild elevations for even rows only
    from neural_spectral_codec_tpu.ops.ring_path import (
        ring_elevation_centers)
    el = ring_elevation_centers(cfg, 64)[::2]
    rng = np.random.default_rng(4)
    phi0 = rng.uniform(0, 2*np.pi, (2, 32, 1))
    az = phi0 + (np.arange(200)/200*2*np.pi)[None, None, :]
    r = rng.uniform(2.0, 70.0, (2, 32, 200))
    ce, se = np.cos(el)[None, :, None], np.sin(el)[None, :, None]
    pts = np.stack([r*ce*np.cos(az), r*ce*np.sin(az),
                    r*se*np.ones_like(az), np.zeros_like(r)],
                   axis=-1).astype(np.float32)
    rep = ring_structure_report(pts, cfg, rows)
    assert rep["ok"], rep
    img_ring = np.asarray(project_rings_batch(jnp.asarray(pts), cfg, rows))
    img_gen = np.asarray(project_points_batch(
        jnp.asarray(_flatten(pts)), cfg))
    np.testing.assert_array_equal(img_ring, img_gen)
    assert np.all(img_ring[:, 1::2] == 0)


def test_ring_path_all_invalid_ring_and_constant_ring():
    pts = make_structured_ring_scans(1, 64, 128, CFG, seed=5)
    pts[0, 3] = np.nan                       # one fully-dropped ring
    # one circularly-constant ring: all points in a single azimuth bin
    el = np.deg2rad(-24.8 + 26.8/64 * (10 + 0.5))
    r = np.linspace(5, 60, 128)
    pts[0, 10] = np.stack([r*np.cos(el)*np.cos(0.01), r*np.cos(el)*np.sin(0.01),
                           r*np.sin(el)*np.ones(128), np.zeros(128)],
                          axis=-1)
    img_ring = np.asarray(project_rings_batch(jnp.asarray(pts), CFG, ROWS))
    img_gen = np.asarray(project_points_batch(
        jnp.asarray(_flatten(pts)), CFG))
    np.testing.assert_array_equal(img_ring, img_gen)
    assert img_ring[0, 3].sum() == 0.0
    assert (img_ring[0, 10] > 0).sum() == 1   # the constant ring's pixel
    assert np.isclose(img_ring[0, 10].max(), 5.0, atol=1e-5)


def test_ring_encode_matches_general_encode():
    enc = SpectralEncoderConfig(use_pallas=False)
    pts = make_structured_ring_scans(2, 64, 256, enc.projection, seed=6)
    d_ring = np.asarray(encode_points_ring_batch(
        jnp.asarray(pts), jnp.float32(2.0), enc, ROWS))
    d_gen = np.asarray(encode_points_batch(
        jnp.asarray(_flatten(pts)), jnp.float32(2.0), enc))
    np.testing.assert_array_equal(d_ring, d_gen)


def test_ring_path_fold_overflow_drops_not_corrupts():
    """An input violating C2 beyond the fold budget loses the overflowing
    runs but produces a valid (subset) image, never garbage."""
    cfg = CFG
    el = np.deg2rad(-24.8 + 26.8/64 * 0.5)
    # azimuth ping-pongs across bins -> many non-increases
    az = np.tile(np.array([0.1, 2.0, 0.1, 2.0, 0.1, 2.0, 0.1, 2.0]), 16)
    r = np.full(128, 10.0, np.float32)
    ring = np.stack([r*np.cos(el)*np.cos(az), r*np.cos(el)*np.sin(az),
                     r*np.sin(el)*np.ones(128), np.zeros(128)],
                    axis=-1).astype(np.float32)
    pts = make_structured_ring_scans(1, 64, 128, cfg, seed=7)
    pts[0, 0] = ring
    rep = ring_structure_report(pts, cfg, ROWS)
    assert rep["max_folds_needed"] > 2, rep
    img = np.asarray(project_rings_batch(jnp.asarray(pts), cfg, ROWS))
    gen = np.asarray(project_points_batch(jnp.asarray(_flatten(pts)), cfg))
    # rows from conforming rings still match exactly
    np.testing.assert_array_equal(img[0, 1:], gen[0, 1:])
    # the violating row is a subset (dropped runs -> empty pixels)
    row_i, row_g = img[0, 0], gen[0, 0]
    mask = row_i > 0
    np.testing.assert_array_equal(row_i[mask], row_g[mask])


def test_pallas_ring_fold_kernel_matches_xla_chain():
    """Interpret-mode parity: the fused VMEM kernel (stage chain +
    in-VMEM per-ring compaction + expansion) reproduces the XLA chain's
    folded rows exactly, including padding transparency — both for
    rings narrower than the folded width (P < 720, in-kernel pad path)
    and wider (P > 720, in-kernel slice path)."""
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.ops.pallas_ring import ring_fold_pallas
    from neural_spectral_codec_tpu.ops.range_image import _densify_xla
    from neural_spectral_codec_tpu.ops.ring_path import (
        _ring_keys, _ring_run_starts)

    for R, P, drop in ((16, 200, 0.2), (8, 1024, 0.15)):
        pts = make_structured_ring_scans(2, R, P, CFG, seed=11,
                                         dropout=drop)
        vals, key = _ring_keys(jnp.asarray(pts), CFG)
        ppad = -(-P // 128) * 128
        key = jnp.pad(key, ((0, 0), (0, 0), (0, ppad - P)),
                      constant_values=-1.0)
        vals = jnp.pad(vals, ((0, 0), (0, 0), (0, ppad - P)),
                       constant_values=jnp.inf)
        k2 = key.reshape(2 * R, ppad)
        v2 = vals.reshape(2 * R, ppad)
        width = 2 * CFG.n_azimuth
        wpad = -(-width // 128) * 128

        got = np.asarray(ring_fold_pallas(k2, v2, CFG.n_azimuth, 2,
                                          interpret=True))
        assert got.shape == (2 * R, wpad)

        col_f, m = _ring_run_starts(k2, v2, CFG.n_azimuth, 2)
        col_f = col_f.reshape(2, R, ppad)
        m = m.reshape(2, R, ppad)
        ring_base = (jnp.arange(R, dtype=jnp.float32)
                     * float(width))[None, :, None]
        pix = jnp.where(col_f >= 0.0, col_f + ring_base,
                        float(1 << 29)).astype(jnp.int32)
        ref = np.asarray(_densify_xla(
            pix.reshape(2, R * ppad),
            jnp.where(col_f >= 0.0, m, 0.0).reshape(2, R * ppad),
            (col_f >= 0.0).reshape(2, R * ppad),
            R * width)).reshape(2 * R, width)
        np.testing.assert_array_equal(got[:, :width], ref)
        np.testing.assert_array_equal(got[:, width:], 0.0)


def test_encode_structured_from_flat_cloud_with_ring_ids():
    """HeLiPR-style input: flat cloud + per-point ring ids, rings
    interleaved in firing order. encode_structured must reconstruct the
    ring layout and match the general path exactly."""
    from neural_spectral_codec_tpu.ops.ring_path import encode_structured
    enc = SpectralEncoderConfig(use_pallas=False)
    R, P = 16, 256
    rings = make_structured_ring_scans(1, R, P, enc.projection, seed=20,
                                       dropout=0.0)[0]     # (R, P, 4)
    # interleave: sensor fires ring 0..15 at each azimuth step
    flat = rings.transpose(1, 0, 2).reshape(-1, 4)
    ring_ids = np.tile(np.arange(R), P)
    d = encode_structured(flat, ring_ids, 2.0, enc)
    d_gen = np.asarray(encode_points_batch(
        jnp.asarray(pad_like(flat))[None], jnp.float32(2.0), enc))[0]
    np.testing.assert_array_equal(d, d_gen)


def pad_like(flat):
    from neural_spectral_codec_tpu.ops.range_image import pad_points
    n = 1 << int(np.ceil(np.log2(max(len(flat), 64))))
    return pad_points(flat, n)


def test_encode_structured_falls_back_on_bad_structure():
    """Shuffled point order breaks azimuth monotonicity -> must fall
    back to the general path, still exact."""
    from neural_spectral_codec_tpu.ops.ring_path import encode_structured
    enc = SpectralEncoderConfig(use_pallas=False)
    rings = make_structured_ring_scans(1, 8, 128, enc.projection,
                                       seed=21, dropout=0.0)[0]
    flat = rings.reshape(-1, 4)
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(flat))
    flat = flat[perm]
    ring_ids = np.repeat(np.arange(8), 128)[perm]
    d = encode_structured(flat, ring_ids, 2.0, enc)
    d_gen = np.asarray(encode_points_batch(
        jnp.asarray(pad_like(flat))[None], jnp.float32(2.0), enc))[0]
    np.testing.assert_array_equal(d, d_gen)


def _leading_hole_ring(ridx, n_holes, last_bin, last_start, P, seed):
    """Contract-valid ring with LEADING holes, strictly increasing bins,
    and a final long run of ``last_bin`` starting at ``last_start``
    (chosen so a power-of-two offset from column 0 lands inside it)."""
    from neural_spectral_codec_tpu.ops.ring_path import (
        ring_elevation_centers)
    rng = np.random.default_rng(seed)
    el = ring_elevation_centers(CFG, 64)[ridx]
    bins = np.empty(P)
    bins[n_holes:last_start] = np.sort(rng.choice(
        np.arange(1, last_bin), size=last_start - n_holes, replace=True))
    bins[last_start:] = last_bin
    az = (bins + 0.5) / 360.0 * 2 * np.pi - np.pi
    r = rng.uniform(5.0, 50.0, P)
    ring = np.stack([r * np.cos(el) * np.cos(az),
                     r * np.cos(el) * np.sin(az),
                     r * np.sin(el) * np.ones(P), np.zeros(P)],
                    axis=-1).astype(np.float32)
    ring[:n_holes] = np.nan
    return ring


def test_leading_holes_no_phantom_start():
    """Regression (round-4 advisor finding): a zero-wrap ring whose first
    slots are invalid must NOT emit a phantom run start at column 0. The
    filled column-0 slot carries the circular tail key at fold 0, which
    on a no-wrap ring aliases the real final run's folded key; when a
    power-of-two offset lands inside that run, the circular run-min
    doubling hands the phantom a finite min and the duplicate target
    breaks the strictly-increasing precondition of the densify
    butterflies (observed: wrong pixels incl. unrelated columns)."""
    from neural_spectral_codec_tpu.ops.ring_path import (
        _ring_keys, _ring_run_starts)

    P = 256
    # deterministic multi-ring instance that corrupted pre-fix (1 wrong
    # pixel at seed 1 of the discovery sweep)
    rng = np.random.default_rng(1001)
    pts = make_structured_ring_scans(1, 64, P, CFG, seed=1, dropout=0.05)
    for ridx in rng.choice(64, size=8, replace=False):
        pts[0, ridx] = _leading_hole_ring(
            ridx, int(rng.integers(1, 8)), int(rng.integers(200, 359)),
            int(rng.choice([128, 130, 160, 192])), P, 100 + ridx)
    rep = ring_structure_report(pts, CFG, ROWS)
    assert rep["ok"] and rep["max_folds_needed"] <= 2, rep

    img_ring = np.asarray(project_rings_batch(jnp.asarray(pts), CFG, ROWS))
    img_gen = np.asarray(project_points_batch(
        jnp.asarray(_flatten(pts)), CFG))
    np.testing.assert_array_equal(img_ring, img_gen)

    # the precondition itself: per-ring start targets strictly increase,
    # and leading-hole columns never emit starts
    one = _leading_hole_ring(0, 4, 300, 128, P, 7)
    vals, key = _ring_keys(jnp.asarray(one[None, None]), CFG)
    col_f, _ = _ring_run_starts(key.reshape(1, P), vals.reshape(1, P),
                                CFG.n_azimuth, 2)
    col_f = np.asarray(col_f)[0]
    assert col_f[0] < 0, "phantom start at column 0"
    tg = col_f[col_f >= 0]
    assert np.all(np.diff(tg) > 0), "duplicate folded targets"

    # interpret-mode kernel parity on the same leading-hole input
    from neural_spectral_codec_tpu.ops.pallas_ring import ring_fold_pallas
    from neural_spectral_codec_tpu.ops.range_image import _densify_xla
    vals, key = _ring_keys(jnp.asarray(pts), CFG)
    k2 = key.reshape(64, P)
    v2 = vals.reshape(64, P)
    width = 2 * CFG.n_azimuth
    got = np.asarray(ring_fold_pallas(k2, v2, CFG.n_azimuth, 2,
                                      interpret=True))
    col_f, m = _ring_run_starts(k2, v2, CFG.n_azimuth, 2)
    ring_base = (jnp.arange(64, dtype=jnp.float32) * float(width))[:, None]
    pix = jnp.where(col_f >= 0.0, col_f + ring_base,
                    float(1 << 29)).astype(jnp.int32)
    ref = np.asarray(_densify_xla(
        pix.reshape(1, 64 * P),
        jnp.where(col_f >= 0.0, m, 0.0).reshape(1, 64 * P),
        (col_f >= 0.0).reshape(1, 64 * P),
        64 * width)).reshape(64, width)
    np.testing.assert_array_equal(got[:, :width], ref)


def test_ring_path_fuzz_hole_patterns():
    """Randomized stress over hole patterns the doubling networks must
    treat as transparent: leading holes, trailing holes, hole bursts,
    fully-dropped rings, and wrap-through-hole runs — every instance that
    passes the structure contract must be bit-identical to the general
    path."""
    P = 192
    for seed in range(6):
        rng = np.random.default_rng(500 + seed)
        pts = make_structured_ring_scans(1, 64, P, CFG, seed=seed,
                                         dropout=0.0)
        for ridx in range(64):
            mode = ridx % 4
            if mode == 0:                       # leading hole burst
                pts[0, ridx, :rng.integers(1, 24)] = np.nan
            elif mode == 1:                     # trailing hole burst
                pts[0, ridx, P - rng.integers(1, 24):] = np.nan
            elif mode == 2:                     # random dropout, heavy
                drop = rng.random(P) < 0.4
                pts[0, ridx, drop] = np.nan
            # mode 3: untouched clean ring
        if seed == 3:
            pts[0, 7] = np.nan                  # fully-dropped ring
        rep = ring_structure_report(pts, CFG, ROWS)
        assert rep["ok"] and rep["max_folds_needed"] <= 2, (seed, rep)
        img_ring = np.asarray(project_rings_batch(jnp.asarray(pts), CFG,
                                                  ROWS))
        img_gen = np.asarray(project_points_batch(
            jnp.asarray(_flatten(pts)), CFG))
        np.testing.assert_array_equal(img_ring, img_gen, err_msg=f"seed {seed}")


def test_bounded_stage_kernel_bitexact():
    """Host-certified bounded doubling depths (ring_stage_bounds) must be
    bit-identical to the fully-general kernel AND to the general sorted
    path, across adversarial hole patterns: interior bursts sized right
    at the certification boundary, leading/trailing runs (exempt from the
    fill bound), heavy dropout, dropped rings."""
    from neural_spectral_codec_tpu.ops.ring_path import ring_stage_bounds

    P = 192
    for seed in range(6):
        rng = np.random.default_rng(900 + seed)
        pts = make_structured_ring_scans(1, 64, P, CFG, seed=seed,
                                         dropout=0.0)
        for ridx in range(64):
            mode = ridx % 5
            if mode == 0:                       # leading hole burst
                pts[0, ridx, :rng.integers(1, 40)] = np.nan
            elif mode == 1:                     # trailing hole burst
                pts[0, ridx, P - rng.integers(1, 40):] = np.nan
            elif mode == 2:                     # random dropout, heavy
                drop = rng.random(P) < 0.3
                pts[0, ridx, drop] = np.nan
            elif mode == 3:                     # interior burst: forces a
                s = rng.integers(10, P - 40)    # larger fill bound
                pts[0, ridx, s:s + rng.integers(8, 30)] = np.nan
        if seed == 2:
            pts[0, 11] = np.nan                 # fully-dropped ring
        rep = ring_structure_report(pts, CFG, ROWS)
        assert rep["ok"] and rep["max_folds_needed"] <= 2, (seed, rep)
        bounds = ring_stage_bounds(pts, CFG)
        assert bounds is not None and bounds[0] < 8  # certified below full
        img_b = np.asarray(project_rings_batch(jnp.asarray(pts), CFG,
                                               ROWS, 2, bounds))
        img_full = np.asarray(project_rings_batch(jnp.asarray(pts), CFG,
                                                  ROWS))
        img_gen = np.asarray(project_points_batch(
            jnp.asarray(_flatten(pts)), CFG))
        np.testing.assert_array_equal(img_b, img_full,
                                      err_msg=f"seed {seed} {bounds}")
        np.testing.assert_array_equal(img_b, img_gen,
                                      err_msg=f"seed {seed} {bounds}")

    # interpret-mode Pallas kernel at bounded depths on the last instance
    from neural_spectral_codec_tpu.ops.pallas_ring import ring_fold_pallas
    from neural_spectral_codec_tpu.ops.ring_path import (
        _ring_keys, _ring_run_starts)
    ppad = -(-P // 128) * 128
    vals, key = _ring_keys(jnp.asarray(pts), CFG)
    key = jnp.pad(key, ((0, 0), (0, 0), (0, ppad - P)),
                  constant_values=-1.0).reshape(-1, ppad)
    vals = jnp.pad(vals, ((0, 0), (0, 0), (0, ppad - P)),
                   constant_values=np.inf).reshape(-1, ppad)
    b2 = ring_stage_bounds(pts, CFG, ppad=ppad)
    full = np.asarray(ring_fold_pallas(key, vals, CFG.n_azimuth, 2,
                                       True))
    got = np.asarray(ring_fold_pallas(key, vals, CFG.n_azimuth, 2, True,
                                      *b2))
    np.testing.assert_array_equal(got, full)


def test_stage_bounds_certifier_is_conservative():
    """A pathological interior hole run longer than the ladder's largest
    reach must push the certifier to the full depth for fill (never a
    silently-too-small bound)."""
    from neural_spectral_codec_tpu.ops.ring_path import ring_stage_bounds
    P = 1024
    pts = make_structured_ring_scans(1, 64, P, CFG, seed=0, dropout=0.0)
    pts[0, 3, 100:700] = np.nan       # 600-lane interior hole
    bounds = ring_stage_bounds(pts, CFG)
    # reach needed 600 > 2^8-1 -> fill falls back to full depth; with
    # both at full the certifier returns None (no bounded variant)
    assert bounds is None or (1 << bounds[0]) - 1 >= 600
    # a long single RUN (one azimuth bin repeated) must push runmin up
    pts2 = make_structured_ring_scans(1, 64, P, CFG, seed=1, dropout=0.0)
    const = pts2[0, 5, 0].copy()
    pts2[0, 5, :400] = const          # 400 identical points = 400-lane run
    b2 = ring_stage_bounds(pts2, CFG)
    assert b2 is None or (1 << b2[1]) >= 400


def test_checker_flags_off_row_points():
    pts = make_structured_ring_scans(1, 64, 128, CFG, seed=8)
    # move one ring's points to a different elevation than its row claims
    pts[0, 5, :, 2] += 5.0
    rep = ring_structure_report(pts, CFG, ROWS)
    assert not rep["ok"] and rep["off_row_points"] > 0


def test_infer_ring_ids_from_kitti_order_stream():
    """A ring-major flat stream with no ring field (KITTI .bin order)
    recovers its ring ids from elevation jumps, reaches the fast path
    through encode_structured, and matches the general path exactly;
    a shuffled stream falls back to the general path, still exact."""
    from neural_spectral_codec_tpu.ops.ring_path import (
        encode_structured, infer_ring_ids_from_sweep)
    from neural_spectral_codec_tpu.ops.range_image import pad_points

    enc = SpectralEncoderConfig(use_pallas=False)
    R, P = 32, 256
    pts = make_structured_ring_scans(1, R, P, enc.projection, seed=13,
                                     dropout=0.1)[0]
    flat = pts.reshape(-1, 4)                       # ring-major stream
    keep = ~np.all(np.isnan(flat), axis=1)          # drop NaN'd points:
    flat = flat[keep]                               # a real stream has no
                                                    # placeholder records
    rids = infer_ring_ids_from_sweep(flat)
    true_ids = np.repeat(np.arange(R), P)[keep]
    # same segmentation (labels are both 0..R-1 in stream order)
    np.testing.assert_array_equal(rids, true_ids)

    got = encode_structured(flat, rids, 2.0, enc)
    ref = np.asarray(encode_points_batch(
        jnp.asarray(pad_points(flat, 16384)[None]), jnp.float32(2.0),
        enc))[0]
    np.testing.assert_array_equal(got, ref)

    rng = np.random.default_rng(0)
    shuf = flat[rng.permutation(len(flat))]
    rids_s = infer_ring_ids_from_sweep(shuf)
    got_s = encode_structured(shuf, rids_s, 2.0, enc)
    ref_s = np.asarray(encode_points_batch(
        jnp.asarray(pad_points(shuf, 16384)[None]), jnp.float32(2.0),
        enc))[0]
    np.testing.assert_array_equal(got_s, ref_s)


def test_ring_path_three_folds_bitexact():
    """n_folds=3: rings with TWO azimuth restarts (e.g. a sensor packet
    split) still reproduce the general scatter-min exactly — the fold
    min-reduce loop and folded-key run identity are n_folds-generic."""
    cfg = CFG
    R, P = 16, 384
    rng = np.random.default_rng(31)
    from neural_spectral_codec_tpu.ops.ring_path import (
        ring_elevation_centers)
    el = ring_elevation_centers(cfg, R)
    # each ring = three monotone azimuth segments (two non-increase
    # events), each segment sweeping a random arc
    pts = np.zeros((2, R, P, 4), np.float32)
    for b in range(2):
        for r in range(R):
            segs = []
            for s in range(3):
                arc = rng.uniform(1.5, 4.0)
                # azimuth BINS live in arctan2+pi space, which wraps at
                # theta=pi — pick segments that stay within one bin-space
                # revolution so each is truly monotone in bin space
                b0 = rng.uniform(0, 2 * np.pi - arc)
                segs.append(b0 - np.pi + np.linspace(0, arc, P // 3))
            az = np.concatenate(segs)[:P]
            az = np.pad(az, (0, P - len(az)))
            rr = rng.uniform(2.0, 70.0, P)
            ce, se = np.cos(el[r]), np.sin(el[r])
            pts[b, r] = np.stack([rr * ce * np.cos(az),
                                  rr * ce * np.sin(az),
                                  rr * se * np.ones(P),
                                  np.zeros(P)], axis=-1)
    drop = rng.random(pts.shape[:3]) < 0.1
    pts[drop] = np.nan
    rep = ring_structure_report(pts, cfg, ROWS[:R])
    assert rep["max_folds_needed"] <= 3, rep
    img_ring = np.asarray(project_rings_batch(jnp.asarray(pts), cfg,
                                              ROWS[:R], n_folds=3))
    img_gen = np.asarray(project_points_batch(
        jnp.asarray(_flatten(pts)), cfg))
    np.testing.assert_array_equal(img_ring[:, :R], img_gen[:, :R])

    # interpret-mode kernel parity at n_folds=3
    from neural_spectral_codec_tpu.ops.pallas_ring import ring_fold_pallas
    from neural_spectral_codec_tpu.ops.range_image import _densify_xla
    from neural_spectral_codec_tpu.ops.ring_path import (
        _ring_keys, _ring_run_starts)
    vals, key = _ring_keys(jnp.asarray(pts), cfg)
    k2 = key.reshape(2 * R, P)
    v2 = vals.reshape(2 * R, P)
    width = 3 * cfg.n_azimuth
    got = np.asarray(ring_fold_pallas(k2, v2, cfg.n_azimuth, 3,
                                      interpret=True))
    col_f, m = _ring_run_starts(k2, v2, cfg.n_azimuth, 3)
    col_f = col_f.reshape(2, R, P)
    m = m.reshape(2, R, P)
    ring_base = (jnp.arange(R, dtype=jnp.float32)
                 * float(width))[None, :, None]
    pix = jnp.where(col_f >= 0.0, col_f + ring_base,
                    float(1 << 29)).astype(jnp.int32)
    ref = np.asarray(_densify_xla(
        pix.reshape(2, R * P),
        jnp.where(col_f >= 0.0, m, 0.0).reshape(2, R * P),
        (col_f >= 0.0).reshape(2, R * P),
        R * width)).reshape(2 * R, width)
    np.testing.assert_array_equal(got[:, :width], ref)


def test_infer_ring_ids_by_elevation_interleaved():
    """Firing-interleaved stream (ring cycling per point): sweep-order
    inference fails, elevation clustering recovers the true rings."""
    from neural_spectral_codec_tpu.ops.ring_path import (
        infer_ring_ids_by_elevation, infer_ring_ids_from_sweep,
        prepare_structured)
    from neural_spectral_codec_tpu.ops.spectral import SpectralEncoderConfig

    cfg = SpectralEncoderConfig(n_elevation=16, n_azimuth=360, n_bins=20,
                                elevation_range_deg=(-15.0, 15.0))
    rng = np.random.default_rng(9)
    R, P = 16, 200
    el = np.radians(-15.0 + (np.arange(R) + 0.5) * 30.0 / R)
    az = rng.uniform(0, 2 * np.pi) + np.arange(P) / P * 2 * np.pi
    AZ, EL = np.meshgrid(az, el, indexing="ij")      # azimuth-major order
    r = rng.uniform(2.0, 70.0, (P, R))
    pts = np.stack([r * np.cos(EL) * np.cos(AZ), r * np.cos(EL) * np.sin(AZ),
                    r * np.sin(EL), np.zeros((P, R))], -1).astype(np.float32)
    flat = pts.reshape(-1, 4)
    flat[rng.random(len(flat)) < 0.04] = np.nan      # holes inherit rings

    rid = infer_ring_ids_by_elevation(flat)
    assert rid is not None
    true_ids = np.tile(np.arange(R), P)
    valid = np.isfinite(flat).all(axis=1)
    np.testing.assert_array_equal(rid[valid], true_ids[valid])

    # sweep inference sees a boundary at every point -> contract fails
    assert prepare_structured(flat, infer_ring_ids_from_sweep(flat),
                              cfg) is None
    # clustering ids pass the contract
    assert prepare_structured(flat, rid, cfg) is not None

    # unstructured cloud: elevations don't band -> refuse
    dense = rng.normal(size=(4096, 4)).astype(np.float32)
    assert infer_ring_ids_by_elevation(dense, max_rings=64) is None
