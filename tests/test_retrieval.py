"""Retrieval-layer tests: device DB correctness, spatial filtering, ICP
registration recovery, two-stage loop closing on the synthetic world, g2o."""

import numpy as np
import pytest

from neural_spectral_codec_tpu.retrieval import (
    WassersteinRetriever, GeometricVerifier, voxel_downsample,
    TwoStageRetrieval, save_loop_closures_g2o,
)
from neural_spectral_codec_tpu.keyframe import Keyframe
from neural_spectral_codec_tpu.data.synthetic import SyntheticWorld, loop_trajectory
from oracle import oracle_wasserstein_batch


def _hists(rng, n, d=50):
    h = rng.uniform(0, 1, (n, d)).astype(np.float32)
    return h / h.sum(1, keepdims=True)


def test_retriever_matches_oracle(rng):
    db = _hists(rng, 200)
    q = _hists(rng, 1)[0]
    r = WassersteinRetriever(n_bins=50, capacity=256)
    r.add_to_database(db)
    idx, dist = r.query(q, top_k=5)
    ref = oracle_wasserstein_batch(q, db)
    order = np.argsort(ref)[:5]
    np.testing.assert_array_equal(np.sort(idx), np.sort(order))
    np.testing.assert_allclose(dist, np.sort(ref)[:5], rtol=1e-4, atol=1e-5)


def test_retriever_incremental_adds(rng):
    db = _hists(rng, 50)
    r = WassersteinRetriever(n_bins=50, capacity=64)
    for row in db:
        r.add_to_database(row[None])
    assert r.database_size == 50
    idx, dist = r.query(db[7], top_k=1)
    assert idx[0] == 7 and dist[0] < 1e-5


def test_retriever_spatial_filter(rng):
    db = _hists(rng, 20)
    pos = np.zeros((20, 3), np.float32)
    pos[:10, 0] = 10.0   # near the query
    pos[10:, 0] = 200.0  # far
    r = WassersteinRetriever(n_bins=50, capacity=32)
    r.add_to_database(db, pos)
    idx, _ = r.query(db[0], top_k=20, query_position=np.zeros(3),
                     spatial_min_distance=50.0)
    assert set(idx) == set(range(10, 20))  # near entries excluded


def test_retriever_empty_and_capacity(rng):
    r = WassersteinRetriever(n_bins=50, capacity=4)
    idx, dist = r.query(_hists(rng, 1)[0])
    assert len(idx) == 0
    r.add_to_database(_hists(rng, 4))
    with pytest.raises(ValueError):
        r.add_to_database(_hists(rng, 1))


def _cloud(rng, n=3000):
    # structured cloud: two walls + ground, so registration is constrained
    g = rng.uniform(-20, 20, (n // 3, 2))
    ground = np.column_stack([g, np.zeros(len(g))])
    w1 = np.column_stack([rng.uniform(-20, 20, n // 3),
                          np.full(n // 3, 8.0), rng.uniform(0, 5, n // 3)])
    w2 = np.column_stack([np.full(n - 2 * (n // 3), -12.0),
                          rng.uniform(-20, 20, n - 2 * (n // 3)),
                          rng.uniform(0, 5, n - 2 * (n // 3))])
    return np.vstack([ground, w1, w2]).astype(np.float32)


def _se3(yaw=0.0, t=(0, 0, 0)):
    T = np.eye(4)
    c, s = np.cos(yaw), np.sin(yaw)
    T[:2, :2] = [[c, -s], [s, c]]
    T[:3, 3] = t
    return T


@pytest.mark.parametrize("method", ["icp", "point_to_plane", "gicp"])
def test_icp_recovers_transform(rng, method):
    cloud = _cloud(rng)
    T_true = _se3(yaw=0.05, t=(0.4, -0.3, 0.1))
    # source = cloud moved by T_true⁻¹ so aligning source→target recovers T_true
    src = (cloud - T_true[:3, 3]) @ T_true[:3, :3]
    v = GeometricVerifier(method=method, voxel_downsample=0.5)
    ok, T, info = v.verify(src, cloud)
    assert ok, info
    np.testing.assert_allclose(T[:3, 3], T_true[:3, 3], atol=0.1)
    np.testing.assert_allclose(T[:3, :3], T_true[:3, :3], atol=0.05)
    assert info["fitness"] > 0.8 and info["rmse"] < 0.3
    # information matrix heuristic
    im = info["information_matrix"]
    np.testing.assert_allclose(np.diag(im)[:3], 100.0 * info["fitness"])
    np.testing.assert_allclose(np.diag(im)[3:], 1000.0 * info["fitness"])


def test_concurrent_query_and_insert(rng):
    """Background queries racing donated inserts must never dispatch
    against a deleted buffer (async loop closing runs stage-1 queries on
    a worker thread while the main thread keeps inserting; regression for
    'Array has been deleted' on the donated database buffer)."""
    import threading
    ret = WassersteinRetriever(n_bins=64, capacity=4096)
    base = np.abs(rng.random((16, 64))).astype(np.float32)
    base /= base.sum(axis=1, keepdims=True)
    ret.add_to_database(base)
    errors = []

    def worker():
        try:
            for _ in range(200):
                idx, dist = ret.query(base[3], top_k=5,
                                      as_of_size=ret.database_size)
                assert len(idx) > 0
        except Exception as e:          # pragma: no cover
            errors.append(e)

    t = threading.Thread(target=worker)
    t.start()
    for i in range(200):
        row = np.abs(rng.random((1, 64))).astype(np.float32)
        ret.add_to_database(row / row.sum())
    t.join()
    assert not errors, errors[0]


@pytest.mark.parametrize("backend", ["jax", "native"])
def test_prepared_cloud_matches_raw(rng, backend):
    """verify(prepare(a), prepare(b)) is identical to verify(a, b) —
    the per-keyframe prep cache in TwoStageRetrieval must not change
    results, only skip recomputation."""
    if backend == "native":
        from neural_spectral_codec_tpu import native
        if not native.available():
            pytest.skip("native lib unavailable")
    cloud = _cloud(rng)
    T_true = _se3(yaw=0.05, t=(0.4, -0.3, 0.1))
    src = (cloud - T_true[:3, 3]) @ T_true[:3, :3]
    for method in ("icp", "point_to_plane", "gicp"):
        v = GeometricVerifier(method=method, voxel_downsample=0.5,
                              backend=backend)
        ok1, T1, info1 = v.verify(src, cloud)
        ok2, T2, info2 = v.verify(v.prepare(src), v.prepare(cloud))
        assert ok1 == ok2
        assert info1["fitness"] == info2["fitness"]
        assert info1["rmse"] == info2["rmse"]
        if T1 is not None:
            np.testing.assert_array_equal(T1, T2)


def test_icp_rejects_unrelated(rng):
    a = _cloud(rng)
    b = rng.uniform(-20, 20, (2000, 3)).astype(np.float32) + [500, 0, 0]
    ok, T, info = GeometricVerifier(method="icp").verify(a, b)
    assert not ok and T is None


def _gicp_scene(rng):
    """Scene engineered to separate point-to-plane from generalized ICP:
    one dominant ground plane with sparse vertical posts and anisotropic
    (mostly in-plane) noise. p2l trusts only target normals; GICP's
    covariance weighting (both clouds) resolves the in-plane sliding."""
    g = rng.uniform([-12, -12, 0], [12, 12, 0], (2500, 3))
    posts = [rng.uniform([cx - .15, cy - .15, 0], [cx + .15, cy + .15, 3],
                         (150, 3))
             for cx, cy in [(-8, -8), (7, -5), (3, 9), (-4, 4)]]
    base = np.concatenate([g] + posts).astype(np.float32)
    T_true = _se3(yaw=0.08, t=(0.8, -0.5, 0.05))
    noise = rng.normal(0, 0.03, base.shape)
    noise[:, 2] *= 0.2
    src = ((base - T_true[:3, 3]) @ T_true[:3, :3]
           + noise).astype(np.float32)
    return src, base, T_true


def _gicp_objective(T, src, dst, cov_src, cov_dst, max_corr=1.0):
    """Sum of GICP Mahalanobis residuals rᵀ(C_q + R C_p Rᵀ)⁻¹r over
    inlier nearest-neighbor correspondences — the objective Open3D's
    registration_generalized_icp minimizes (Segal et al. 2009)."""
    moved = src @ T[:3, :3].T + T[:3, 3]
    d2 = ((moved[:, None, :] - dst[None, :, :]) ** 2).sum(-1)
    j = d2.argmin(1)
    r = moved - dst[j]
    w = np.sqrt(d2[np.arange(len(j)), j]) <= max_corr
    S = cov_dst[j] + np.einsum("ab,pbc,dc->pad", T[:3, :3], cov_src,
                               T[:3, :3])
    vals = np.einsum("pi,pij,pj->p", r, np.linalg.inv(S), r)
    return float(vals[w].sum())


def test_gicp_differs_from_point_to_plane_and_wins(rng):
    """True generalized ICP (reference geometric_verification.py:96-133)
    must be a distinct estimator from point-to-plane, and better at the
    GICP objective it is defined to minimize."""
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.retrieval.verification import (
        _knn_covariances, _pad)

    src, base, T_true = _gicp_scene(rng)
    Ts, errs = {}, {}
    for m in ("point_to_plane", "gicp"):
        v = GeometricVerifier(method=m, backend="jax")
        ok, T, info = v.verify(src, base)
        assert ok, (m, info)
        Ts[m] = T
        errs[m] = np.abs(T - T_true).max()

    # measurably different estimators
    assert np.abs(Ts["gicp"] - Ts["point_to_plane"]).max() > 1e-3
    # GICP resolves the in-plane sliding better
    assert errs["gicp"] < errs["point_to_plane"]
    assert errs["gicp"] < 0.02

    # GICP reaches a lower value of its own Mahalanobis objective
    s = voxel_downsample(src, 0.3)
    d = voxel_downsample(base, 0.3)
    sp, sm = _pad(s, 4096)
    dp, dm = _pad(d, 4096)
    cs = np.asarray(_knn_covariances(jnp.asarray(sp), jnp.asarray(sm)))[:len(s)]
    cd = np.asarray(_knn_covariances(jnp.asarray(dp), jnp.asarray(dm)))[:len(d)]
    obj_gicp = _gicp_objective(Ts["gicp"], s, d, cs, cd)
    obj_p2l = _gicp_objective(Ts["point_to_plane"], s, d, cs, cd)
    assert obj_gicp < obj_p2l


def test_gicp_covariances_are_disk_regularized(rng):
    """Regularized covariances must have eigenvalues {ε, 1, 1} with the ε
    direction aligned to the local surface normal."""
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.retrieval.verification import (
        _knn_covariances)
    pts = rng.uniform(-5, 5, (256, 3)).astype(np.float32)
    pts[:, 2] = 0.0  # a z=0 plane
    cov = np.asarray(_knn_covariances(jnp.asarray(pts),
                                      jnp.ones(256, bool), 20, 1e-3))
    w, v = np.linalg.eigh(cov)
    np.testing.assert_allclose(w[:, 0], 1e-3, rtol=1e-3)
    np.testing.assert_allclose(w[:, 1:], 1.0, rtol=1e-3)
    # ε-direction ⟂ plane ⇒ |z-component| ≈ 1
    np.testing.assert_allclose(np.abs(v[:, 2, 0]), 1.0, atol=1e-3)


def test_voxel_downsample(rng):
    pts = rng.uniform(0, 1, (1000, 3)).astype(np.float32)
    ds = voxel_downsample(pts, 0.5)
    assert len(ds) <= 8  # 2x2x2 voxels
    # each output is the mean of its voxel
    v0 = pts[(pts < 0.5).all(axis=1)]
    got = ds[(ds < 0.5).all(axis=1)]
    np.testing.assert_allclose(got[0], v0.mean(axis=0), atol=1e-5)


def test_two_stage_on_synthetic_world(rng):
    """End-to-end: revisit in the synthetic world must be found and verified.

    Note on the spatial filter: the reference excludes database entries
    whose POSE is within 50 m of the query (two_stage_retrieval.py:158-171)
    — meaningful only under odometry drift, where a true revisit's stored
    pose is far from the query's drifted pose. With ground-truth poses the
    filter would exclude every true match, so it's disabled here (its
    masking behavior is covered by test_retriever_spatial_filter)."""
    from neural_spectral_codec_tpu.ops import encode_points_batch, SpectralEncoderConfig
    from neural_spectral_codec_tpu.ops.range_image import pad_points
    import jax.numpy as jnp

    world = SyntheticWorld(seed=11)
    n = 40
    poses = loop_trajectory(n, radius=100.0, loops=2.0)
    cfg = SpectralEncoderConfig(n_elevation=16, elevation_range_deg=(-20.0, 15.0))
    scans = [world.scan(poses[i], n_points=4096,
                        rng=np.random.default_rng(i)) for i in range(n)]
    batch = jnp.asarray(np.stack([pad_points(s, 4096) for s in scans]))
    desc = np.asarray(encode_points_batch(batch, jnp.float32(2.0), cfg))

    ts = TwoStageRetrieval(top_k=3, spatial_filter_distance=0.0,
                           n_bins=cfg.output_dim, capacity=64,
                           verification_method="icp")
    kfs = []
    for i in range(n // 2):  # first lap into the database
        kf = Keyframe(i, i, scans[i], poses[i], i * 0.1, descriptor=desc[i])
        ts.add_keyframe(kf)
        kfs.append(kf)

    # query with a lap-2 revisit of frame 5 (n//2 frames later, same angle)
    qi = n // 2 + 5
    qkf = Keyframe(qi, qi, scans[qi], poses[qi], qi * 0.1, descriptor=desc[qi])
    lcs = ts.get_loop_closures(qkf, scans[qi])
    assert len(lcs) >= 1
    # the matched keyframe must be spatially close to the query
    matched = [lc["target_id"] for lc in lcs]
    qpos = poses[qi][:3, 3]
    dists = [np.linalg.norm(poses[m][:3, 3] - qpos) for m in matched]
    assert min(dists) < 30.0, (matched, dists)


def test_g2o_export(tmp_path, rng):
    from neural_spectral_codec_tpu.retrieval import compute_pose_graph_edge
    T = np.eye(4)
    T[:3, 3] = [1, 2, 3]
    edge = compute_pose_graph_edge(np.eye(4), T, T, np.eye(6))
    edge["source_id"], edge["target_id"] = 3, 17
    path = tmp_path / "lc.g2o"
    save_loop_closures_g2o([edge], str(path))
    line = path.read_text().strip().split()
    assert line[0] == "EDGE_SE3:QUAT"
    assert line[1] == "3" and line[2] == "17"
    np.testing.assert_allclose([float(v) for v in line[3:6]], [1, 2, 3])
    # quaternion written as qx qy qz qw for identity rotation: 0 0 0 1
    np.testing.assert_allclose([float(v) for v in line[6:10]], [0, 0, 0, 1])
    # 21 upper-triangular info entries
    assert len(line) == 10 + 21


def test_query_batch_matches_single(rng):
    from neural_spectral_codec_tpu.retrieval.retriever import WassersteinRetriever
    n, bins = 300, 50
    h = rng.random((n, bins), dtype=np.float32)
    h /= h.sum(axis=1, keepdims=True)
    pos = rng.random((n, 3)).astype(np.float32) * 500
    r = WassersteinRetriever(n_bins=bins, capacity=n)
    r.add_to_database(h, pos)
    queries = h[[3, 50, 123]]
    qpos = pos[[3, 50, 123]]
    bidx, bdist = r.query_batch(queries, top_k=5, query_positions=qpos,
                                spatial_min_distance=30.0)
    for row, qi in enumerate([3, 50, 123]):
        sidx, sdist = r.query(h[qi], top_k=5, query_position=pos[qi],
                              spatial_min_distance=30.0)
        keep = np.isfinite(bdist[row])
        np.testing.assert_allclose(np.sort(bdist[row][keep]),
                                   np.sort(sdist), rtol=1e-5, atol=1e-7)
        assert set(bidx[row][keep].tolist()) == set(sidx.tolist())


def test_query_batch_empty_database():
    from neural_spectral_codec_tpu.retrieval.retriever import WassersteinRetriever
    r = WassersteinRetriever(n_bins=10, capacity=10)
    idx, dist = r.query_batch(np.ones((2, 10), np.float32), top_k=3)
    assert idx.shape == (2, 0)


def test_query_batch_sentinel_indices(rng):
    """Masked/empty top-k slots must surface index -1 (not a clamped but
    plausible-looking row id) so consumers that forget the isfinite
    filter fail loudly."""
    from neural_spectral_codec_tpu.retrieval.retriever import WassersteinRetriever
    h = rng.random((4, 20), dtype=np.float32)
    h /= h.sum(axis=1, keepdims=True)
    r = WassersteinRetriever(n_bins=20, capacity=10)
    r.add_to_database(h)
    idx, dist = r.query_batch(h[:2], top_k=8)   # k > database size
    assert np.all(idx[~np.isfinite(dist)] == -1)
    assert np.all(idx[np.isfinite(dist)] >= 0)
    assert np.isfinite(dist).sum(axis=1).tolist() == [4, 4]


def test_warm_query_compiles_without_inserting(rng):
    """warm_query compiles the query executables against the live buffers
    without touching database contents or size."""
    from neural_spectral_codec_tpu.retrieval.retriever import WassersteinRetriever
    r = WassersteinRetriever(n_bins=20, capacity=50)
    r.warm_query(top_k=5)
    assert r.database_size == 0
    h = rng.random((3, 20), dtype=np.float32)
    h /= h.sum(axis=1, keepdims=True)
    r.add_to_database(h)
    idx, dist = r.query(h[1], top_k=1)
    assert idx[0] == 1


def test_database_save_load_roundtrip(tmp_path, rng):
    from neural_spectral_codec_tpu.keyframe.selector import Keyframe
    from neural_spectral_codec_tpu.retrieval.two_stage import TwoStageRetrieval
    n_bins = 40
    r = TwoStageRetrieval(n_bins=n_bins, capacity=50,
                          spatial_filter_distance=0.0)
    for i in range(12):
        h = rng.random(n_bins).astype(np.float32)
        h /= h.sum()
        pose = np.eye(4)
        pose[:3, 3] = rng.random(3) * 100
        r.add_keyframe(Keyframe(
            keyframe_id=i, scan_id=i,
            points=rng.random((100, 4)).astype(np.float32),
            pose=pose, timestamp=float(i), descriptor=h))
    path = tmp_path / "db.bin"
    assert r.save_database(str(path)) == 12

    r2 = TwoStageRetrieval(n_bins=n_bins, capacity=50,
                           spatial_filter_distance=0.0)
    assert r2.load_database(str(path)) == 12
    # retrieval behavior preserved up to uint16 quantization
    q = r.keyframes[5].descriptor
    i1, d1 = r.retriever.query(q, top_k=3)
    i2, d2 = r2.retriever.query(q, top_k=3)
    assert i2[0] == i1[0] == 5
    np.testing.assert_allclose(d1, d2, atol=2e-3)
    # metadata preserved
    kf = r2.keyframes[7]
    assert kf.keyframe_id == 7 and kf.timestamp == 7.0
    np.testing.assert_allclose(kf.pose, r.keyframes[7].pose, atol=1e-5)


def test_l2_metric_retriever(rng):
    from neural_spectral_codec_tpu.retrieval.retriever import WassersteinRetriever
    emb = rng.normal(0, 1, (50, 32)).astype(np.float32)  # signed vectors
    r = WassersteinRetriever(n_bins=32, capacity=50, metric="l2")
    r.add_to_database(emb)
    idx, dist = r.query(emb[13], top_k=3)
    assert idx[0] == 13 and dist[0] < 1e-5
    # brute-force L2 agreement
    d = np.linalg.norm(emb - emb[13], axis=1)
    np.testing.assert_allclose(sorted(dist), np.sort(d)[:3], atol=1e-5)


def test_update_rows_changes_results(rng):
    from neural_spectral_codec_tpu.retrieval.retriever import WassersteinRetriever
    emb = rng.normal(0, 1, (20, 16)).astype(np.float32)
    r = WassersteinRetriever(n_bins=16, capacity=20, metric="l2")
    r.add_to_database(emb)
    q = rng.normal(0, 1, 16).astype(np.float32)
    idx0, _ = r.query(q, top_k=1)
    r.update_rows([7], q[None, :])     # make row 7 the exact query
    idx1, dist1 = r.query(q, top_k=1)
    assert idx1[0] == 7 and dist1[0] < 1e-5


def test_exclude_last_temporal_window(rng):
    from neural_spectral_codec_tpu.retrieval.retriever import WassersteinRetriever
    h = rng.random((30, 20)).astype(np.float32)
    h /= h.sum(1, keepdims=True)
    r = WassersteinRetriever(n_bins=20, capacity=30)
    r.add_to_database(h)
    idx, _ = r.query(h[29], top_k=30, exclude_last=10)
    assert idx.max() < 20           # last 10 rows excluded
    assert len(idx) == 20


def test_tiled_topk_exact(rng):
    """_topk_smallest (TPU-fast two-phase tiled top-k) must be EXACT vs
    lax.top_k, including inf-masked entries, batch dims, ties, and sizes
    that don't divide the tile."""
    import jax
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.retrieval.retriever import _topk_smallest

    for n, k, batch in [(100_000, 10, None), (5000, 7, None),
                        (4097, 16, None), (100, 5, None),
                        (10_000, 10, 4)]:
        shape = (n,) if batch is None else (batch, n)
        d = rng.uniform(0, 1, shape).astype(np.float32)
        d[..., : n // 100] = np.inf          # masked entries
        d[..., n // 2] = d[..., 0]           # a tie
        got_v, got_i = _topk_smallest(jnp.asarray(d), k)
        ref_nv, ref_i = jax.lax.top_k(-jnp.asarray(d), k)
        np.testing.assert_array_equal(np.asarray(got_v), -np.asarray(ref_nv))
        # indices may differ on exact ties; values at indices must match
        np.testing.assert_array_equal(
            np.take_along_axis(d, np.asarray(got_i), -1),
            np.take_along_axis(d, np.asarray(ref_i), -1))


# ---------------------------------------------------------------- uint16


def test_quantized_storage_topk_parity(rng):
    """uint16 CDF storage must return the same ranking as fp32 storage on
    realistic descriptor sets: the quantization error bound (n_bins *
    0.5/65535 ~ 6e-3 W1 at 800 bins) is far below inter-place W1
    distances, so top-k indices agree and distances match to the bound."""
    db = _hists(rng, 400, d=800)
    q = _hists(rng, 8, d=800)
    pos = rng.random((400, 3)).astype(np.float32) * 500

    r32 = WassersteinRetriever(n_bins=800, capacity=512)
    r16 = WassersteinRetriever(n_bins=800, capacity=512, storage="uint16")
    for r in (r32, r16):
        r.add_to_database(db, pos)

    i32, d32 = r32.query_batch(q, top_k=5)
    i16, d16 = r16.query_batch(q, top_k=5)
    np.testing.assert_array_equal(i32, i16)
    bound = 800 * 0.5 / 65535.0
    assert np.max(np.abs(d32 - d16)) <= bound + 1e-6
    # single-query path too
    si32, sd32 = r32.query(q[0], top_k=5)
    si16, sd16 = r16.query(q[0], top_k=5)
    np.testing.assert_array_equal(si32, si16)
    assert np.max(np.abs(sd32 - sd16)) <= bound + 1e-6


def test_quantized_storage_memory_halved():
    r32 = WassersteinRetriever(n_bins=800, capacity=1000)
    r16 = WassersteinRetriever(n_bins=800, capacity=1000, storage="uint16")
    assert r16._db_cdf.dtype == np.uint16
    assert r16._db_cdf.nbytes * 2 == r32._db_cdf.nbytes
    r16.clear_database()
    assert r16._db_cdf.dtype == np.uint16  # dtype survives clear


def test_quantized_storage_l2_rejected():
    with pytest.raises(ValueError, match="uint16"):
        WassersteinRetriever(n_bins=64, capacity=16, metric="l2",
                             storage="uint16")
    with pytest.raises(ValueError, match="storage"):
        WassersteinRetriever(n_bins=64, capacity=16, storage="int8")


def test_quantized_storage_update_rows(rng):
    db = _hists(rng, 50, d=100)
    r = WassersteinRetriever(n_bins=100, capacity=64, storage="uint16")
    r.add_to_database(db)
    # overwrite row 7 with row 0's histogram: a query with row 0's
    # histogram must now return both at ~zero distance
    r.update_rows(np.array([7]), db[0:1])
    idx, dist = r.query(db[0], top_k=2)
    assert set(idx.tolist()) == {0, 7}
    assert np.max(dist) <= 100 * 0.5 / 65535.0 + 1e-6


def test_quantized_storage_spatial_filter_and_exclude(rng):
    """Masking semantics (spatial exclusion, exclude_last, as_of_size) are
    independent of the storage dtype."""
    db = _hists(rng, 60, d=50)
    pos = np.zeros((60, 3), np.float32)
    pos[:, 0] = np.arange(60)
    r = WassersteinRetriever(n_bins=50, capacity=64, storage="uint16")
    r.add_to_database(db, pos)
    idx, _ = r.query(db[10], top_k=3, query_position=pos[10],
                     spatial_min_distance=5.0)
    assert 10 not in idx and all(abs(i - 10) >= 5 for i in idx)
    idx2, _ = r.query(db[59], top_k=60, exclude_last=10)
    assert idx2.max() < 50


def test_capacity_degrades_gracefully(rng):
    """A full stage-1 database rejects new keyframes (returns False) but
    keeps serving queries — a long online run degrades instead of
    crashing at keyframe capacity+1. (The reference configures
    max_database_size but never enforces it; here capacity is a real
    preallocated device buffer.)"""
    from neural_spectral_codec_tpu.keyframe.selector import Keyframe

    r = TwoStageRetrieval(n_bins=30, capacity=4, spatial_filter_distance=0.0)

    def kf(i):
        h = rng.random(30).astype(np.float32)
        h /= h.sum()
        pose = np.eye(4)
        pose[:3, 3] = [i * 10.0, 0, 0]
        return Keyframe(keyframe_id=i, scan_id=i,
                        points=rng.random((50, 4)).astype(np.float32),
                        pose=pose, timestamp=float(i), descriptor=h)

    for i in range(4):
        assert r.add_keyframe(kf(i)) is True
    assert r.add_keyframe(kf(4)) is False          # full: rejected
    assert len(r.keyframes) == 4                   # not tracked either
    idx, dist = r.retriever.query(r.keyframes[2].descriptor, top_k=2)
    assert idx[0] == 2                             # queries still work
    r.clear_database()
    assert r.add_keyframe(kf(9)) is True           # capacity freed
