"""Quantizer + 220-byte codec tests (reference quantization.py semantics)."""

import numpy as np
import jax.numpy as jnp

from neural_spectral_codec_tpu.ops.quantization import (
    quantize, dequantize, CompressedDescriptor, compress_descriptor,
    decompress_descriptor, pose_to_7dof, pose_from_7dof,
    compute_point_cloud_hash, record_size, DescriptorDatabaseFile,
)


def _hist(rng, n=50):
    h = rng.uniform(0, 1, n).astype(np.float32)
    return h / h.sum()


def test_quantize_sum_preserved(rng):
    h = _hist(rng)
    q = np.asarray(quantize(jnp.asarray(h)))
    assert q.dtype == np.uint16
    assert q.sum() == 65535  # exact-sum error redistribution


def test_quantize_roundtrip_error(rng):
    h = _hist(rng)
    d = np.asarray(dequantize(quantize(jnp.asarray(h))))
    assert np.abs(d - h).max() < 1e-3  # uint16 resolution
    np.testing.assert_allclose(d.sum(), 1.0, atol=1e-5)


def test_quantize_batched(rng):
    h = np.stack([_hist(rng) for _ in range(8)])
    q = np.asarray(quantize(jnp.asarray(h)))
    np.testing.assert_array_equal(q.sum(axis=1), 65535)


def test_dequantize_empty_uniform():
    d = np.asarray(dequantize(jnp.zeros(50, jnp.uint16)))
    np.testing.assert_allclose(d, 1 / 50, atol=1e-7)


def test_pose_7dof_roundtrip(rng):
    for _ in range(10):
        # random rotation via QR
        A = rng.normal(size=(3, 3))
        Q, _ = np.linalg.qr(A)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        T = np.eye(4)
        T[:3, :3] = Q
        T[:3, 3] = rng.normal(size=3) * 10
        T2 = pose_from_7dof(pose_to_7dof(T))
        np.testing.assert_allclose(T2, T, atol=1e-6)


def test_descriptor_codec_roundtrip(rng):
    h = _hist(rng)
    T = np.eye(4)
    T[:3, 3] = [1.0, 2.0, 3.0]
    pts = rng.normal(size=(100, 4)).astype(np.float32)
    desc = compress_descriptor(h, T, 123.456, 42, pts)
    raw = desc.to_bytes()
    assert len(raw) == record_size(50) == 220
    back = CompressedDescriptor.from_bytes(raw)
    np.testing.assert_array_equal(back.histogram, desc.histogram)
    assert back.keyframe_id == 42
    assert back.timestamp == 123.456
    assert back.point_cloud_hash == compute_point_cloud_hash(pts)
    h2, T2, ts, kid = decompress_descriptor(back)
    np.testing.assert_allclose(T2, T, atol=1e-6)
    np.testing.assert_allclose(h2, h, atol=1e-3)


def test_descriptor_codec_800d(rng):
    h = _hist(rng, 800)
    desc = compress_descriptor(h, np.eye(4), 0.0, 1, rng.normal(size=(10, 3)).astype(np.float32))
    raw = desc.to_bytes()
    assert len(raw) == record_size(800) == 1720
    back = CompressedDescriptor.from_bytes(raw)
    np.testing.assert_array_equal(back.histogram, desc.histogram)


def test_database_file_roundtrip(rng, tmp_path):
    db = DescriptorDatabaseFile(str(tmp_path / "db.bin"), n_bins=50)
    descs = []
    for i in range(5):
        d = compress_descriptor(_hist(rng), np.eye(4), float(i), i,
                                rng.normal(size=(10, 3)).astype(np.float32))
        db.append(d)
        descs.append(d)
    back = db.read_all()
    assert len(back) == 5
    for a, b in zip(descs, back):
        np.testing.assert_array_equal(a.histogram, b.histogram)
        assert a.keyframe_id == b.keyframe_id


def test_histogram_quantizer_class_matches_reference(rng):
    import pytest
    """Class-style surface (reference quantization.py:112-192): round-trip
    and bit-equality with the reference HistogramQuantizer when mounted."""
    from neural_spectral_codec_tpu.ops import HistogramQuantizer

    hq = HistogramQuantizer(n_bins=50)
    h = rng.random(50).astype(np.float32)
    h /= h.sum()
    q = hq.quantize(h)
    assert q.dtype == np.uint16 and int(q.sum()) == 65535
    back = hq.dequantize(q)
    np.testing.assert_allclose(back, h, atol=2e-4)
    with pytest.raises(ValueError):
        hq.quantize(np.ones(49, np.float32))

    import sys
    from pathlib import Path
    ref_src = Path("/root/reference/src")
    if ref_src.exists():
        sys.path.insert(0, str(ref_src))
        from encoding.quantization import HistogramQuantizer as RefHQ
        ref = RefHQ(n_bins=50)
        np.testing.assert_array_equal(q, ref.quantize(h))
        np.testing.assert_allclose(back, ref.dequantize(ref.quantize(h)),
                                   atol=1e-7)
