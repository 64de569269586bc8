"""Dataset reader tests against tiny fabricated on-disk fixtures matching
each format (KITTI .bin/poses.txt, NCLT 12-byte records + CSV GT,
HeLiPR 22-byte records + quaternion GT)."""

import numpy as np
import pytest

from neural_spectral_codec_tpu.data import (
    KITTILoader, NCLTLoader, HeLiPRLoader, MultiDatasetLoader,
)
from neural_spectral_codec_tpu.data.synthetic import SyntheticLoader


def _make_kitti(root, seq="00", n=4):
    d = root / "sequences" / seq / "velodyne"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        pts = rng.normal(size=(100, 4)).astype(np.float32)
        pts.tofile(d / f"{i:06d}.bin")
    rows = []
    for i in range(n):
        T = np.eye(4)
        T[0, 3] = i * 1.5
        rows.append(" ".join(str(v) for v in T[:3].reshape(-1)))
    (root / "sequences" / seq / "poses.txt").write_text("\n".join(rows))


def test_kitti_loader(tmp_path):
    _make_kitti(tmp_path)
    ld = KITTILoader(str(tmp_path), "00")
    assert len(ld) == 4
    item = ld[2]
    assert item["points"].shape == (100, 4)
    np.testing.assert_allclose(item["pose"][0, 3], 3.0)
    np.testing.assert_allclose(item["timestamp"], 0.2)
    np.testing.assert_allclose(ld.get_distance(0, 2), 3.0)
    rel = ld.get_relative_pose(0, 2)
    np.testing.assert_allclose(rel[0, 3], 3.0, atol=1e-10)
    assert ld.get_frames_in_range(0, 1.0, 2.0) == [1]


def test_kitti_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        KITTILoader(str(tmp_path), "99")


def _make_nclt(root, date="2012-01-08", n=3):
    d = root / date / "velodyne_sync"
    d.mkdir(parents=True)
    base = 1326059182636482
    dtype = np.dtype([("x", "<u2"), ("y", "<u2"), ("z", "<u2"),
                      ("i", "u1"), ("p", "u1"), ("e", "<u4")])
    for k in range(n):
        rec = np.zeros(50, dtype=dtype)
        # encode points at (k, 2, 0.5) m: raw = (m + 100) / 0.005
        rec["x"] = int((k + 100.0) / 0.005)
        rec["y"] = int((2.0 + 100.0) / 0.005)
        rec["z"] = int((0.5 + 100.0) / 0.005)
        rec["i"] = 128
        rec.tofile(d / f"{base + k * 100000}.bin")
    # GT CSV at ±50 ms around each scan
    lines = []
    for k in range(n):
        ts = base + k * 100000 + 11
        lines.append(f"{ts},{k * 2.0},{1.0},{0.0},{0.0},{0.0},{0.1 * k}")
    (root / date / f"groundtruth_{date}.csv").write_text("\n".join(lines))


def test_nclt_loader(tmp_path):
    _make_nclt(tmp_path)
    ld = NCLTLoader(str(tmp_path), "2012-01-08")
    assert len(ld) == 3
    item = ld[1]
    np.testing.assert_allclose(item["points"][0, :3], [1.0, 2.0, 0.5], atol=0.01)
    np.testing.assert_allclose(item["points"][0, 3], 128 / 255.0, atol=1e-6)
    np.testing.assert_allclose(item["pose"][0, 3], 2.0)  # matched GT pose
    assert item["dataset"] == "nclt"
    info = ld.get_sequence_info()
    assert info["rings"] == 32 and info["has_poses"]


def _make_helipr(root, n=3):
    d = root / "LiDAR" / "Velodyne"
    d.mkdir(parents=True)
    g = root / "LiDAR_GT"
    g.mkdir(parents=True)
    dtype = np.dtype([("x", np.float32), ("y", np.float32), ("z", np.float32),
                      ("i", np.float32), ("r", np.uint16), ("t", np.float32)])
    base = 1_600_000_000_000_000_000
    lines = []
    for k in range(n):
        rec = np.zeros(40, dtype=dtype)
        rec["x"], rec["y"], rec["z"], rec["i"] = k, 1.0, 0.2, 0.5
        rec["r"] = np.arange(40) % 16  # VLP-16 firing-interleaved rings
        rec.tofile(d / f"{base + k * 100_000_000}.bin")
        lines.append(f"{base + k * 100_000_000 + 1000} {k * 3.0} 0 0 0 0 0 1")
    # one scan with GT too far away (dropped)
    rec = np.zeros(10, dtype=dtype)
    rec.tofile(d / f"{base + 10_000_000_000}.bin")
    (g / "Velodyne_gt.txt").write_text("\n".join(lines))


def test_helipr_loader(tmp_path):
    _make_helipr(tmp_path)
    ld = HeLiPRLoader(str(tmp_path))
    assert len(ld) == 3  # out-of-tolerance scan dropped
    item = ld[2]
    assert item["points"].shape == (40, 4)
    np.testing.assert_allclose(item["pose"][0, 3], 6.0)
    np.testing.assert_allclose(item["points"][0], [2.0, 1.0, 0.2, 0.5])
    # the sensor's explicit ring field rides along for the ring path
    np.testing.assert_array_equal(item["ring_ids"], np.arange(40) % 16)
    eager = HeLiPRLoader(str(tmp_path), lazy_load=False)
    np.testing.assert_array_equal(eager[2]["ring_ids"], np.arange(40) % 16)


def test_multi_dataset_loader(tmp_path):
    _make_kitti(tmp_path, "00", n=4)
    _make_kitti(tmp_path, "01", n=3)
    ld = MultiDatasetLoader([
        {"type": "kitti", "root": str(tmp_path), "sequences": ["00", "01"]},
    ])
    assert len(ld) == 7
    item = ld[5]
    assert item["dataset_idx"] == 1 and item["idx"] == 1
    assert item["dataset_type"] == "kitti"
    assert ld.sequence_id_of(5) == 1
    assert ld.get_frames_by_dataset("kitti") == list(range(7))
    with pytest.raises(IndexError):
        ld[7]


def test_synthetic_loader_revisit_consistency():
    """Two laps over the same world: a revisit sees similar geometry."""
    ld = SyntheticLoader(n_frames=80, seed=3, n_points=2048, loops=2.0)
    a, b = ld[5], ld[45]  # same angle on lap 1 and lap 2
    dist = np.linalg.norm(a["pose"][:3, 3] - b["pose"][:3, 3])
    assert dist < 20.0  # actually revisiting
    assert a["points"].shape[1] == 4 and len(a["points"]) > 100
    # determinism
    a2 = ld[5]
    np.testing.assert_array_equal(a["points"], a2["points"])


def test_degraded_loader_stream_pinned():
    """DegradedSyntheticLoader's exact byte stream is pinned: the recorded
    density-defense / degraded-recall numbers (docs/density_defense.md,
    experiments/degraded_recall.py) were measured on THIS stream, so any
    refactor of the degradation path (e.g. the shared wedge_dropout_keep
    helper) must keep it bit-identical or re-measure those docs."""
    import hashlib

    from neural_spectral_codec_tpu.data.synthetic import (
        DegradedSyntheticLoader)

    ld = DegradedSyntheticLoader(n_frames=4, seed=3, n_points=4096)
    pins = {0: (1198, "4e7e9dcfc60ae406df3a600c8e5733072b30a602"),
            3: (1239, "72ad6c9e18da8b58d01b5ce2d0afc3e086c4812a")}
    for idx, (n, sha) in pins.items():
        pts = ld[idx]["points"]
        assert pts.shape == (n, 4)
        assert hashlib.sha1(pts.tobytes()).hexdigest() == sha


def test_sensor_sim_loader_stream_pinned():
    """SensorSimLoader's degraded byte stream is pinned the same way: the
    measured cross-sensor uplift (docs/cross_sensor.md) was trained and
    validated on THIS stream (dropout-first draw order). A re-rolled
    stream moved the GNN uplift +25% -> +8% relative, so draw-order
    changes are NOT neutral refactors."""
    import hashlib

    from neural_spectral_codec_tpu.data.synthetic import SensorSimLoader

    ld = SensorSimLoader(n_frames=4, seed=0, n_points=8000, n_beams=16,
                         wedge_deg=200.0, dropout=0.3)
    pins = {0: (1828, "ada8671ac3c12c2f6b7e2bb9026a8bd97f979586"),
            3: (2050, "b8afce46f53a334fb63f80058ec167fcf1fe6344")}
    for idx, (n, sha) in pins.items():
        pts = ld[idx]["points"]
        assert pts.shape == (n, 4)
        assert hashlib.sha1(pts.tobytes()).hexdigest() == sha


def test_degradation_helper_shared_semantics():
    """SensorSimLoader and DegradedSyntheticLoader drive the same
    wedge_dropout_keep helper: identical rng/params give identical keep
    masks (wedge ~ wedge_deg/360 of the azimuth circle, minus dropout)."""
    from neural_spectral_codec_tpu.data.synthetic import wedge_dropout_keep

    rng = np.random.default_rng(0)
    pts = rng.uniform(-50, 50, (20000, 4)).astype(np.float32)
    keep = wedge_dropout_keep(pts, np.random.default_rng(7),
                              wedge_deg=180.0, dropout=0.0)
    frac = keep.mean()
    assert 0.45 < frac < 0.55  # half the circle
    keep2 = wedge_dropout_keep(pts, np.random.default_rng(7),
                               wedge_deg=180.0, dropout=0.5)
    # dropout thins the same wedge: subset of keep, about half its size
    assert not np.any(keep2 & ~keep)
    assert 0.4 < keep2.sum() / keep.sum() < 0.6
    # no wedge = dropout only
    keep3 = wedge_dropout_keep(pts, np.random.default_rng(7),
                               wedge_deg=None, dropout=0.25)
    assert 0.7 < keep3.mean() < 0.8
    # dropout_first re-orders the rng draws (a different stream) but
    # keeps the same semantics
    keep4 = wedge_dropout_keep(pts, np.random.default_rng(7),
                               wedge_deg=180.0, dropout=0.5,
                               dropout_first=True)
    assert 0.2 < keep4.mean() < 0.3
    assert not np.array_equal(keep4, keep2)
