"""Native IO (native/nsc_io.cpp + data/native_io.py): decode
bit-equality against the numpy loaders, threaded prefetch ordering, and
per-file error fallback."""

import numpy as np
import pytest

from test_data_loaders import _make_helipr, _make_kitti, _make_nclt

from neural_spectral_codec_tpu.data import (
    HeLiPRLoader, KITTILoader, NCLTLoader,
)
from neural_spectral_codec_tpu.data.native_io import FramePrefetcher
from neural_spectral_codec_tpu.native import io as native_io

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native IO library unavailable")

_NCLT_DTYPE = np.dtype([("x", "<u2"), ("y", "<u2"), ("z", "<u2"),
                        ("i", "u1"), ("p", "u1"), ("e", "<u4")])
_HELIPR_DTYPE = np.dtype([("x", np.float32), ("y", np.float32),
                          ("z", np.float32), ("i", np.float32),
                          ("r", np.uint16), ("t", np.float32)])


# ---------------------------------------------------------------- decode

def test_decode_kitti_bit_identical():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(777, 4)).astype(np.float32)
    out = native_io.decode(native_io.FORMAT_KITTI, pts.tobytes())
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, pts)


def test_decode_kitti_bad_size_raises():
    with pytest.raises(ValueError):
        native_io.decode(native_io.FORMAT_KITTI, b"\x00" * 36)


def test_decode_nclt_bit_identical():
    # full u16 range: raw > 60000 decodes past the 200 m validity gate,
    # exercising the filter; random intensities exercise the /255 path
    rng = np.random.default_rng(1)
    rec = np.zeros(4096, dtype=_NCLT_DTYPE)
    for f in ("x", "y", "z"):
        rec[f] = rng.integers(0, 65536, size=len(rec), dtype=np.uint16)
    rec["i"] = rng.integers(0, 256, size=len(rec), dtype=np.uint8)
    raw = rec.tobytes() + b"\x07" * 5  # trailing partial record dropped

    # numpy oracle = the loader's own decode (nclt.py:_load_point_cloud)
    pts = np.column_stack([
        rec["x"].astype(np.float32) * 0.005 - 100.0,
        rec["y"].astype(np.float32) * 0.005 - 100.0,
        rec["z"].astype(np.float32) * 0.005 - 100.0,
        rec["i"].astype(np.float32) / 255.0,
    ])
    ok = (np.abs(pts[:, :3]) < 200.0).all(axis=1)
    want = pts[ok]
    assert 0 < len(want) < len(rec)  # the filter is live

    out = native_io.decode(native_io.FORMAT_NCLT, raw)
    np.testing.assert_array_equal(out, want)  # bit-exact


def test_decode_helipr_bit_identical():
    rng = np.random.default_rng(2)
    rec = np.zeros(512, dtype=_HELIPR_DTYPE)
    for f in ("x", "y", "z", "i", "t"):
        rec[f] = rng.normal(size=len(rec)).astype(np.float32)
    rec["r"] = rng.integers(0, 16, size=len(rec), dtype=np.uint16)
    want = np.stack([rec["x"], rec["y"], rec["z"], rec["i"]],
                    axis=-1).astype(np.float32)
    out = native_io.decode(native_io.FORMAT_HELIPR, rec.tobytes())
    np.testing.assert_array_equal(out, want)


# ------------------------------------------------------------- prefetch

def _assert_frames_equal(a: dict, b: dict):
    assert set(a) == set(b)
    np.testing.assert_array_equal(a["points"], b["points"])
    for k in a:
        if k == "points":
            continue
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


@pytest.mark.parametrize("make,cls,args", [
    (_make_kitti, KITTILoader, ("00",)),
    (_make_nclt, NCLTLoader, ("2012-01-08",)),
    (_make_helipr, HeLiPRLoader, ()),
])
def test_prefetcher_matches_loader(tmp_path, make, cls, args):
    make(tmp_path)
    loader = cls(str(tmp_path), *args)
    pf = FramePrefetcher.create(loader, n_threads=2, depth=2, mode="always")
    assert pf is not None
    with pf:
        for i in range(len(loader)):
            _assert_frames_equal(pf.get(i), loader[i])


def test_prefetcher_corrupt_file_matches_python(tmp_path):
    _make_kitti(tmp_path, n=4)
    bad = tmp_path / "sequences" / "00" / "velodyne" / "000001.bin"
    bad.write_bytes(b"\x00" * 10)  # not a multiple of 16
    loader = KITTILoader(str(tmp_path), "00")
    with FramePrefetcher.create(loader, mode="always") as pf:
        _assert_frames_equal(pf.get(0), loader[0])
        with pytest.raises(ValueError):  # same as loader[1]
            pf.get(1)
        _assert_frames_equal(pf.get(2), loader[2])
        _assert_frames_equal(pf.get(3), loader[3])


def test_prefetcher_out_of_order_raises(tmp_path):
    _make_kitti(tmp_path)
    loader = KITTILoader(str(tmp_path), "00")
    with FramePrefetcher.create(loader, mode="always") as pf:
        pf.get(0)
        with pytest.raises(RuntimeError):
            pf.get(2)
        pf.get(1)  # protocol errors don't consume items


def test_prefetcher_early_close_does_not_hang(tmp_path):
    _make_kitti(tmp_path, n=4)
    loader = KITTILoader(str(tmp_path), "00")
    pf = FramePrefetcher.create(loader, depth=1, mode="always")
    pf.get(0)
    pf.close()  # workers blocked on slot-free must shut down cleanly


def test_prefetcher_refuses_preloaded_and_unknown_loaders(tmp_path):
    _make_kitti(tmp_path)
    eager = KITTILoader(str(tmp_path), "00", lazy_load=False)
    assert FramePrefetcher.create(eager, mode="always") is None
    assert FramePrefetcher.create(object(), mode="always") is None


def test_prefetcher_create_destroy_stress(tmp_path):
    """Shutdown with workers in every state (reading, blocked on a full
    ring, done) must never deadlock: repeatedly create, consume a random
    prefix, and destroy."""
    _make_kitti(tmp_path, n=24)
    loader = KITTILoader(str(tmp_path), "00")
    rng = np.random.default_rng(0)
    for trial in range(15):
        pf = FramePrefetcher.create(loader, n_threads=3,
                                    depth=int(rng.integers(1, 4)),
                                    mode="always")
        for i in range(int(rng.integers(0, len(loader) + 1))):
            pf.get(i)
        pf.close()


def test_prefetcher_mode_selection(tmp_path):
    # "auto" skips KITTI (decode is a bare memcpy) but takes NCLT
    _make_kitti(tmp_path / "k")
    _make_nclt(tmp_path / "n")
    kitti = KITTILoader(str(tmp_path / "k"), "00")
    nclt = NCLTLoader(str(tmp_path / "n"), "2012-01-08")
    assert FramePrefetcher.create(kitti, mode="auto") is None
    pf = FramePrefetcher.create(nclt, mode="auto")
    assert pf is not None
    pf.close()
    assert FramePrefetcher.create(nclt, mode="off") is None


def test_run_online_prefetch_invariant(tmp_path):
    """Online stream replay from a disk KITTI sequence selects identical
    keyframes and descriptors with the native prefetcher on and off."""
    from test_pipeline import small_config

    from neural_spectral_codec_tpu.data.synthetic import SyntheticLoader
    from neural_spectral_codec_tpu.pipeline import (
        NeuralSpectralCodecPipeline)

    src = SyntheticLoader(n_frames=30, seed=0, n_points=4096, loops=2.0)
    seq = tmp_path / "data" / "sequences" / "00"
    (seq / "velodyne").mkdir(parents=True)
    rows = []
    for i in range(len(src)):
        item = src[i]
        item["points"].astype(np.float32).tofile(
            seq / "velodyne" / f"{i:06d}.bin")
        rows.append(" ".join(str(v) for v in item["pose"][:3].reshape(-1)))
    (seq / "poses.txt").write_text("\n".join(rows))

    results = []
    for mode in ("always", "off"):
        cfg = small_config(tmp_path / mode)
        cfg["system"]["io_prefetch"] = mode
        pipe = NeuralSpectralCodecPipeline(cfg)
        loader = KITTILoader(str(tmp_path / "data"), "00")
        pipe.run_online(loader, loop_closure_interval=10)
        results.append(list(pipe.selector.keyframes))
    on, off = results
    assert len(on) == len(off) > 0
    for a, b in zip(on, off):
        assert a.scan_id == b.scan_id
        np.testing.assert_array_equal(a.descriptor, b.descriptor)


def test_process_sequence_prefetch_invariant(tmp_path):
    """Pipeline keyframe extraction is identical with the native
    prefetcher on (system.io_prefetch default) and off."""
    from test_pipeline import small_config

    from neural_spectral_codec_tpu.pipeline import (
        NeuralSpectralCodecPipeline)

    _make_kitti(tmp_path / "data", n=6)
    results = []
    for io_prefetch in (True, False):
        cfg = small_config(tmp_path / ("on" if io_prefetch else "off"))
        cfg["system"]["io_prefetch"] = io_prefetch
        cfg["keyframe"]["distance_threshold"] = 1.0
        pipe = NeuralSpectralCodecPipeline(cfg)
        loader = KITTILoader(str(tmp_path / "data"), "00")
        results.append(pipe._process_sequence(loader))
    on, off = results
    assert len(on) == len(off) > 0
    for a, b in zip(on, off):
        assert a.scan_id == b.scan_id
        np.testing.assert_array_equal(a.points, b.points)
        np.testing.assert_array_equal(a.descriptor, b.descriptor)


def test_decode_helipr5_carries_ring():
    rng = np.random.default_rng(5)
    rec = np.zeros(256, dtype=_HELIPR_DTYPE)
    for f in ("x", "y", "z", "i", "t"):
        rec[f] = rng.normal(size=len(rec)).astype(np.float32)
    rec["r"] = rng.integers(0, 64, size=len(rec), dtype=np.uint16)
    out = native_io.decode(3, rec.tobytes())  # FORMAT_HELIPR5
    assert out.shape == (256, 5)
    np.testing.assert_array_equal(out[:, 4].astype(np.uint16), rec["r"])
    want = np.stack([rec["x"], rec["y"], rec["z"], rec["i"]],
                    axis=-1).astype(np.float32)
    np.testing.assert_array_equal(out[:, :4], want)
