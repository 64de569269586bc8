"""Native C++ geometry library: parity with the numpy/JAX implementations
and integration through GeometricVerifier(backend="native")."""

import numpy as np
import pytest

from neural_spectral_codec_tpu import native
from neural_spectral_codec_tpu.retrieval.verification import (
    GeometricVerifier, voxel_downsample as np_voxel_downsample)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def _cloud(rng, n=4000, extent=25.0):
    return rng.uniform(-extent, extent, (n, 3)).astype(np.float32)


def test_voxel_downsample_bit_exact(rng):
    pts = _cloud(rng)
    pts[::97] = np.nan  # invalid rows must be ignored, like numpy path
    a = native.voxel_downsample(pts, 0.5)
    b = np_voxel_downsample(pts, 0.5)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_normals_are_unit_and_planar(rng):
    # points on the z=0 plane -> normals ±z
    pts = np.concatenate([
        rng.uniform(-10, 10, (2000, 2)).astype(np.float32),
        np.zeros((2000, 1), np.float32)], axis=1)
    nrm = native.estimate_normals(pts, k=16, grid_cell=1.0)
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-4)
    assert (np.abs(nrm[:, 2]) > 0.99).mean() > 0.95


@pytest.mark.parametrize("use_normals", [False, True])
def test_icp_recovers_known_transform(rng, use_normals):
    base = _cloud(rng, 3000)
    th = 0.04
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    t = np.array([0.4, -0.25, 0.15], np.float32)
    src = base @ R.T + t
    normals = (native.estimate_normals(base, 16, 2.0)
               if use_normals else None)
    T, fit, rmse = native.icp(src, base, normals=normals, max_iterations=30)
    T_true = np.eye(4)
    T_true[:3, :3], T_true[:3, 3] = R, t
    # T maps src -> base, i.e. T ≈ T_true^{-1}
    np.testing.assert_allclose(T @ T_true, np.eye(4), atol=5e-3)
    assert fit > 0.95 and rmse < 0.05


def test_covariances_disk_regularized(rng):
    """GICP covariances on a plane: eigenvalues {ε, 1, 1}, ε-direction ⟂
    the plane — mirrors the JAX _knn_covariances contract."""
    pts = np.concatenate([
        rng.uniform(-10, 10, (2000, 2)).astype(np.float32),
        np.zeros((2000, 1), np.float32)], axis=1)
    cov = native.estimate_covariances(pts, k=20, grid_cell=1.0, eps=1e-3)
    w, v = np.linalg.eigh(cov.astype(np.float64))
    np.testing.assert_allclose(w[:, 0], 1e-3, rtol=1e-2)
    np.testing.assert_allclose(w[:, 1:], 1.0, rtol=1e-2)
    assert (np.abs(v[:, 2, 0]) > 0.99).mean() > 0.95


def test_gicp_recovers_known_transform(rng):
    base = _cloud(rng, 3000)
    th = 0.04
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    t = np.array([0.4, -0.25, 0.15], np.float32)
    src = base @ R.T + t
    cov_s = native.estimate_covariances(src, k=20, grid_cell=2.0)
    cov_d = native.estimate_covariances(base, k=20, grid_cell=2.0)
    T, fit, rmse = native.gicp(src, base, cov_s, cov_d, max_iterations=30)
    T_true = np.eye(4)
    T_true[:3, :3], T_true[:3, 3] = R, t
    np.testing.assert_allclose(T @ T_true, np.eye(4), atol=5e-3)
    assert fit > 0.95 and rmse < 0.05


def test_gicp_native_matches_jax_kernel(rng):
    """Same inputs (points + covariances) through the native GN loop and
    the fixed-shape JAX kernel must land on the same transform."""
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.retrieval.verification import (
        _icp_kernel, _pad)
    base = _cloud(rng, 1500, extent=15.0)
    th = 0.03
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    src = base @ R.T + np.array([0.3, -0.2, 0.1], np.float32)
    cov_s = native.estimate_covariances(src, k=20, grid_cell=2.0)
    cov_d = native.estimate_covariances(base, k=20, grid_cell=2.0)
    T_nat, fit_nat, _ = native.gicp(src, base, cov_s, cov_d,
                                    max_iterations=25)
    n = len(base)
    sp, sm = _pad(src, n)
    dp, dm = _pad(base, n)
    T_jax, fit_jax, _ = _icp_kernel(
        jnp.asarray(sp), jnp.asarray(sm), jnp.asarray(dp), jnp.asarray(dm),
        jnp.zeros((n, 3)), jnp.asarray(cov_s), jnp.asarray(cov_d),
        jnp.eye(4), 25, "gicp", 1.0)
    np.testing.assert_allclose(np.asarray(T_jax), T_nat, atol=2e-3)
    assert abs(float(fit_jax) - fit_nat) < 0.02


def test_icp_rejects_unrelated_clouds(rng):
    a = _cloud(rng, 2000)
    b = _cloud(rng, 2000) + np.array([500.0, 0, 0], np.float32)
    _, fit, _ = native.icp(a, b, max_iterations=10)
    assert fit < 0.05


def test_voxel_overlap_matches_numpy(rng):
    from neural_spectral_codec_tpu.data.pose_utils import compute_overlap
    pts = _cloud(rng, 3000)
    shifted = pts + np.array([1.0, 0, 0], np.float32)
    T = np.eye(4)
    ov_native = compute_overlap(pts, shifted, T, backend="native")
    ov_numpy = compute_overlap(pts, shifted, T, backend="numpy")
    assert abs(ov_native - ov_numpy) < 0.1
    assert compute_overlap(pts, pts, T, backend="native") > 0.99


def test_verifier_native_backend_accepts_true_match(rng):
    # stay under the verifier's max_points budget: these are uniform
    # VOLUME clouds, whose nearest-neighbor spacing (hence ICP rmse)
    # inflates under subsampling in a way real surface scans don't
    base = _cloud(rng, 3500, extent=30.0)
    th = 0.03
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    src = base @ R.T + np.array([0.3, 0.1, 0.0], np.float32)
    v = GeometricVerifier(method="gicp", backend="native")
    ok, T, info = v.verify(src, base)
    assert ok and info["fitness"] > 0.9 and info["rmse"] < 0.2
    assert info["information_matrix"].shape == (6, 6)

    far = base + np.array([300.0, 0, 0], np.float32)
    ok2, T2, info2 = v.verify(far, base)
    assert not ok2 and T2 is None


def test_verifier_backends_agree_on_decision(rng):
    base = _cloud(rng, 3000)
    src = base + np.array([0.2, -0.1, 0.05], np.float32)
    for backend in ("native", "jax"):
        v = GeometricVerifier(method="icp", backend=backend,
                              max_iterations=20, max_points=2048)
        ok, _, info = v.verify(src, base)
        assert ok, f"{backend} rejected an easy match: {info}"


def test_parallel_verification_matches_serial(rng):
    """Thread-pool verification (ctypes releases the GIL) must give the
    same decisions and stats as serial, and actually run faster on
    multiple candidates."""
    import time
    from neural_spectral_codec_tpu.keyframe.selector import Keyframe
    from neural_spectral_codec_tpu.retrieval.two_stage import TwoStageRetrieval

    base = _cloud(rng, 3000)
    kfs = []
    h = rng.random((6, 20)).astype(np.float32)
    h /= h.sum(1, keepdims=True)
    for i in range(6):
        shift = np.array([0.2 * i, 0.1, 0.0], np.float32)
        kfs.append(Keyframe(keyframe_id=i, scan_id=i,
                            points=base + shift, pose=np.eye(4),
                            timestamp=float(i), descriptor=h[i]))

    def run(parallel):
        r = TwoStageRetrieval(n_bins=20, capacity=10, top_k=6,
                              spatial_filter_distance=0.0, context_window=0,
                              icp_max_iterations=15,
                              parallel_verification=parallel)
        for kf in kfs:
            r.add_keyframe(kf)
        from neural_spectral_codec_tpu.retrieval.two_stage import (
            LoopClosureCandidate)
        cands = [LoopClosureCandidate(i, 0.0) for i in range(6)]
        t0 = time.perf_counter()
        out = r._geometric_verification(base, cands)
        return out, time.perf_counter() - t0

    serial, t_ser = run(False)
    par, t_par = run(True)
    assert len(serial) == len(par)
    for a, b in zip(serial, par):
        assert a.database_idx == b.database_idx
        np.testing.assert_allclose(a.fitness, b.fitness, rtol=1e-5)
