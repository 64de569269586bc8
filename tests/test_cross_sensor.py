"""Cross-sensor descriptor comparability — the HeLiPR(VLP-16)→KITTI(HDL-64E)
capability (reference configs/training_helipr_to_kitti.yaml): the
sensor-agnostic elevation pooling + circular interpolation must make
descriptors of the SAME place from DIFFERENT beam counts closer than
descriptors of different places from the same sensor."""

import numpy as np
import jax.numpy as jnp

from neural_spectral_codec_tpu.data.synthetic import (
    SensorSimLoader, SyntheticWorld, loop_trajectory, snap_to_beams)
from neural_spectral_codec_tpu.ops.range_image import pad_points
from neural_spectral_codec_tpu.ops.spectral import (
    SpectralEncoderConfig, encode_points_batch)


def _snap_to_beams(points, n_beams, elev_range=(-24.8, 2.0)):
    return snap_to_beams(points, n_beams, elev_range)


def _encode(cfg, pts, max_pts=32768):
    return np.asarray(encode_points_batch(
        jnp.asarray(pad_points(pts, max_pts))[None], jnp.float32(2.0),
        cfg))[0]


def test_cross_sensor_retrieval():
    """64-beam queries retrieve their own place from a 16-beam database.

    Uses the reference's ACTUAL cross-sensor recipe (configs set
    n_elevation=16 for every sensor — all scans project straight into 16
    fat rows, so the closest-point-per-row operator is identical across
    beam counts). Measured: this recipe reaches ~0.67 top-1 on the
    self-similar synthetic world vs ~0.25 for 64-rows→pool-to-16; the
    remaining gap is what the HeLiPR→KITTI GNN training is for. The bar
    asserts the recipe stays well above both chance (1/24) and the
    pooled alternative."""
    from neural_spectral_codec_tpu.ops.wasserstein import wasserstein_matrix

    world = SyntheticWorld(seed=3)
    poses = loop_trajectory(24, radius=100.0, loops=1.0)
    rng = np.random.default_rng(0)
    cfg = SpectralEncoderConfig(n_elevation=16, target_elevation_bins=16)

    d64, d16 = [], []
    for pose in poses:
        dense = world.scan(pose, n_points=30000, rng=rng)
        for beams, out in ((64, d64), (16, d16)):
            s = _snap_to_beams(dense, beams)
            out.append(_encode(cfg, s))

    dmat = np.asarray(wasserstein_matrix(jnp.asarray(np.stack(d64)),
                                         jnp.asarray(np.stack(d16))))
    top1 = dmat.argmin(axis=1)
    accuracy = (top1 == np.arange(len(poses))).mean()
    assert accuracy >= 0.5, (accuracy, top1)


def test_cross_sensor_beam_count_sweep():
    """The recipe must degrade gracefully across the beam-count axis:
    32- and 128-beam queries against the same 16-beam database stay well
    above chance, and the same-place cross-sensor distance stays below
    the mean different-place distance (the margin retrieval runs on)."""
    from neural_spectral_codec_tpu.ops.wasserstein import wasserstein_matrix

    world = SyntheticWorld(seed=11)
    poses = loop_trajectory(16, radius=100.0, loops=1.0)
    rng = np.random.default_rng(1)
    cfg = SpectralEncoderConfig(n_elevation=16, target_elevation_bins=16)

    db16, q = [], {32: [], 128: []}
    for pose in poses:
        dense = world.scan(pose, n_points=24000, rng=rng)
        db16.append(_encode(cfg, _snap_to_beams(dense, 16)))
        for beams in q:
            q[beams].append(_encode(cfg, _snap_to_beams(dense, beams)))

    db = jnp.asarray(np.stack(db16))
    n = len(poses)
    for beams, descs in q.items():
        dmat = np.asarray(wasserstein_matrix(jnp.asarray(np.stack(descs)),
                                             db))
        acc = (dmat.argmin(axis=1) == np.arange(n)).mean()
        assert acc >= 0.5, (beams, acc)
        same = np.diag(dmat).mean()
        diff = (dmat.sum() - np.trace(dmat)) / (n * n - n)
        assert same < diff, (beams, same, diff)


def test_cross_sensor_elevation_range_mismatch():
    """The recipe projects EVERY sensor with the TRAIN sensor's FOV
    (reference training_helipr_to_kitti.yaml:76 keeps
    elevation_range=[-15,15] for the KITTI validation split too). A
    sensor whose native FOV is (−24.8°, 2°) then piles its below-range
    returns into row 0 (the projector clips bins) and leaves the rows
    above 2° to the empty-row fill. Two guarantees matter and are pinned
    here: (a) such descriptors stay valid (finite, sum-to-1), and
    (b) WITHIN-sensor retrieval under the mismatched config still works
    — that is what the recipe's KITTI-val recall runs on. (Full
    cross-FOV retrieval — HDL queries against a VLP database — is NOT
    promised by the recipe and measured at chance; the comparable-space
    guarantee needs matching FOVs, see test_cross_sensor_retrieval.)"""
    from neural_spectral_codec_tpu.ops.wasserstein import wasserstein_matrix

    world = SyntheticWorld(seed=13)
    poses = loop_trajectory(16, radius=100.0, loops=1.0)
    rng = np.random.default_rng(2)
    # recipe config: VLP-16 FOV, applied to an HDL-64E-FOV sensor
    cfg = SpectralEncoderConfig(n_elevation=16, target_elevation_bins=16,
                                elevation_range_deg=(-15.0, 15.0))

    db, q = [], []
    for pose in poses:
        # two independent scans of the same place (revisit pairs)
        db.append(_encode(cfg, _snap_to_beams(
            world.scan(pose, n_points=24000, rng=rng), 64, (-24.8, 2.0))))
        q.append(_encode(cfg, _snap_to_beams(
            world.scan(pose, n_points=24000, rng=rng), 64, (-24.8, 2.0))))

    q = np.stack(q)
    assert np.isfinite(q).all()
    np.testing.assert_allclose(q.sum(axis=1), 1.0, atol=1e-4)
    dmat = np.asarray(wasserstein_matrix(jnp.asarray(q),
                                         jnp.asarray(np.stack(db))))
    acc = (dmat.argmin(axis=1) == np.arange(len(poses))).mean()
    # measured 0.56 on this protocol (the FOV clipping costs real signal
    # — same-place scans see different wedges of row 0's pile-up);
    # the bar pins "well above the 1/16 chance floor", not excellence
    assert acc >= 0.4, acc


def test_cross_sensor_mixed_database():
    """A database holding BOTH sensor types (odd places scanned by the
    16-beam sensor, even by the 64-beam one): queries from the OTHER
    sensor must still rank their own place first well above chance —
    descriptors live in one comparable space, not per-sensor islands."""
    from neural_spectral_codec_tpu.ops.wasserstein import wasserstein_matrix

    world = SyntheticWorld(seed=17)
    poses = loop_trajectory(16, radius=100.0, loops=1.0)
    rng = np.random.default_rng(3)
    cfg = SpectralEncoderConfig(n_elevation=16, target_elevation_bins=16)

    db, queries = [], []
    for i, pose in enumerate(poses):
        dense = world.scan(pose, n_points=24000, rng=rng)
        db_beams, q_beams = (16, 64) if i % 2 else (64, 16)
        db.append(_encode(cfg, _snap_to_beams(dense, db_beams)))
        queries.append(_encode(cfg, _snap_to_beams(dense, q_beams)))

    dmat = np.asarray(wasserstein_matrix(jnp.asarray(np.stack(queries)),
                                         jnp.asarray(np.stack(db))))
    acc = (dmat.argmin(axis=1) == np.arange(len(poses))).mean()
    assert acc >= 0.5, acc


def test_sensor_sim_loader_contract():
    """SensorSimLoader emits the standard item dict, is deterministic per
    (seed, idx), snaps elevations onto exactly n_beams angles, and crops
    to the sensor FOV."""
    ld = SensorSimLoader(n_frames=4, seed=5, n_points=8000, n_beams=16,
                         beam_fov_deg=(-15.0, 15.0))
    item = ld[2]
    assert set(item) >= {"points", "pose", "timestamp", "idx"}
    pts = item["points"]
    again = ld[2]["points"]
    np.testing.assert_array_equal(pts, again)
    el = np.degrees(np.arctan2(pts[:, 2], np.hypot(pts[:, 0], pts[:, 1])))
    assert el.min() >= -15.0 - 1.0 and el.max() <= 15.0 + 1.0
    # snapped: elevations take at most n_beams distinct values (fp noise
    # collapses within 1e-3 deg)
    uniq = np.unique(np.round(el, 3))
    assert len(uniq) <= 16

    deg = SensorSimLoader(n_frames=4, seed=5, n_points=8000, n_beams=16,
                          wedge_deg=180.0, dropout=0.5)
    assert len(deg[2]["points"]) < len(pts)


def test_cross_fov_retrieval_with_drop_mode():
    """The NATIVE-FOV mismatch axis (VLP-16 −15..15° database, HDL-64E
    −24.8..2° queries) — a measured limitation of the reference recipe
    (top-1 ~0.10 at its clip semantics). The fix: encode BOTH sensors
    over the overlap band (−15..2°), DROP out-of-band points instead of
    clipping them into boundary rows, and size rows to the coarser
    sensor's in-band beam spacing (8 rows over 17° ≈ 2.1° ≥ VLP 2.0°).
    Measured 0.73 top-1; the bar asserts well above both chance (1/24)
    and the clip-mode 0.13."""
    from neural_spectral_codec_tpu.ops.wasserstein import wasserstein_matrix

    world = SyntheticWorld(seed=7)
    poses = loop_trajectory(24, radius=100.0, loops=1.0)
    rng = np.random.default_rng(0)
    overlap = (-15.0, 2.0)
    cfg = SpectralEncoderConfig(n_elevation=8, target_elevation_bins=8,
                                elevation_range_deg=overlap,
                                elevation_mode="drop")
    db, q = [], []
    for pose in poses:
        dense = world.scan(pose, n_points=30000, rng=rng)
        db.append(_encode(cfg, _snap_to_beams(dense, 16, (-15.0, 15.0))))
        q.append(_encode(cfg, _snap_to_beams(dense, 64, (-24.8, 2.0))))
    dmat = np.asarray(wasserstein_matrix(jnp.asarray(np.stack(q)),
                                         jnp.asarray(np.stack(db))))
    accuracy = (dmat.argmin(axis=1) == np.arange(len(poses))).mean()
    assert accuracy >= 0.5, accuracy


def test_drop_mode_equals_clip_on_prefiltered_cloud():
    """drop-mode projection is EXACTLY clip-mode projection of the
    host-filtered cloud (the defining property of the mode)."""
    from neural_spectral_codec_tpu.ops.range_image import project_points

    rng = np.random.default_rng(1)
    n = 4096
    pts = np.empty((n, 4), np.float32)
    r = rng.uniform(0.5, 100.0, n)
    az = rng.uniform(0, 2 * np.pi, n)
    el = rng.uniform(-0.6, 0.4, n)  # straddles the band on both sides
    pts[:, 0] = r * np.cos(el) * np.cos(az)
    pts[:, 1] = r * np.cos(el) * np.sin(az)
    pts[:, 2] = r * np.sin(el)
    pts[:, 3] = rng.uniform(0, 1, n)
    pts[rng.random(n) < 0.03] = np.nan

    cfg_clip = SpectralEncoderConfig(n_elevation=8, target_elevation_bins=8,
                                     elevation_range_deg=(-15.0, 2.0))
    cfg_drop = cfg_clip._replace(elevation_mode="drop")

    # host filter with the projector's own elevation formula
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    elev = np.arctan2(z, np.sqrt(np.clip(x * x, 0, 1e10)
                                 + np.clip(y * y, 0, 1e10)))
    emin, emax = np.radians(-15.0), np.radians(2.0)
    keep = np.isfinite(pts).all(axis=1) & (elev >= emin) & (elev <= emax)
    filtered = pad_points(pts[keep], n)

    a = _encode(cfg_drop, pts, max_pts=n)
    b = _encode(cfg_clip, filtered, max_pts=n)
    np.testing.assert_array_equal(a, b)


def test_ring_path_drop_mode_matches_general():
    """encode_structured under drop mode stays bit-identical to the
    general path: a fully out-of-band ring is dropped whole, and a
    band-edge-straddling ring becomes per-point holes in the kernel."""
    from neural_spectral_codec_tpu.ops.ring_path import (
        encode_structured, prepare_structured)
    from neural_spectral_codec_tpu.ops.spectral import encode_points_batch

    cfg = SpectralEncoderConfig(n_elevation=8, target_elevation_bins=8,
                                elevation_range_deg=(-15.0, 0.0),
                                elevation_mode="drop")
    rng = np.random.default_rng(4)
    P = 256
    rings, ring_ids = [], []
    # rings 0..7 at the 8 row centers; ring 7 jittered to STRADDLE the
    # upper band edge (half its points above 0 deg get dropped); ring 8
    # entirely above the band (dropped whole)
    centers = -15.0 + (np.arange(8) + 0.5) * 15.0 / 8
    for i, el_deg in enumerate(list(centers) + [3.0]):
        az = rng.uniform(0, 2 * np.pi) + np.arange(P) / P * 2 * np.pi
        el = np.full(P, np.radians(el_deg))
        if i == 7:
            el = np.radians(rng.uniform(-0.2, 0.2, P))  # straddles 0 deg
        r = rng.uniform(2.0, 70.0, P)
        rings.append(np.stack([r * np.cos(el) * np.cos(az),
                               r * np.cos(el) * np.sin(az),
                               r * np.sin(el),
                               rng.uniform(0, 1, P)], -1))
        ring_ids.append(np.full(P, i))
    flat = np.concatenate(rings).astype(np.float32)
    ring_ids = np.concatenate(ring_ids)

    prep = prepare_structured(flat, ring_ids, cfg, per_ring=P)
    assert prep is not None, "in-band rings must still satisfy the contract"
    assert prep[0].shape[0] == 8  # the out-of-band ring was dropped whole

    got = encode_structured(flat, ring_ids, 2.0, cfg, per_ring=P)
    want = np.asarray(encode_points_batch(
        jnp.asarray(pad_points(flat, 4096)[None]),
        jnp.float32(2.0), cfg))[0]
    np.testing.assert_array_equal(got, want)
