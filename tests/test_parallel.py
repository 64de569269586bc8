"""Multi-chip sharding paths on the virtual 8-device CPU mesh.

Each test checks the sharded path is numerically identical to the
single-device path — sharding must never change the math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_spectral_codec_tpu.keyframe.graph import build_graph
from neural_spectral_codec_tpu.models.gnn import (
    SpectralGNN, gnn_forward, init_gnn,
)
from neural_spectral_codec_tpu.ops.spectral import (
    SpectralEncoderConfig, encode_points_batch,
)
from neural_spectral_codec_tpu.ops.wasserstein import wasserstein_batch
from neural_spectral_codec_tpu.parallel import (
    ShardedWassersteinRetriever,
    create_mesh,
    make_sharded_encoder,
    make_sharded_train_step,
    pad_to_multiple,
)
from neural_spectral_codec_tpu.parallel.train import make_sharded_eval_step
from neural_spectral_codec_tpu.retrieval.retriever import WassersteinRetriever
from neural_spectral_codec_tpu.training.trainer import make_optimizer, train_step
from tests.conftest import synthetic_scan


def _tiny_graph(rng, n_nodes=16, dim=32):
    poses = np.tile(np.eye(4, dtype=np.float32), (n_nodes, 1, 1))
    poses[:, 0, 3] = np.arange(n_nodes, dtype=np.float32) * 2.0
    feats = rng.random((n_nodes, dim), dtype=np.float32)
    return build_graph(feats, poses)


def test_mesh_creation():
    mesh = create_mesh(8)
    assert mesh.shape["data"] == 8


@pytest.mark.parametrize("elevation_mode", ["clip", "drop"])
def test_sharded_encoder_matches_single_device(rng, elevation_mode):
    cfg = SpectralEncoderConfig(n_elevation=16, n_azimuth=90, n_bins=20,
                                elevation_mode=elevation_mode)
    pts = np.stack([synthetic_scan(rng, 4000) for _ in range(8)])
    pts = np.nan_to_num(pts)
    mesh = create_mesh(8)
    enc = make_sharded_encoder(cfg, mesh)
    alpha = jnp.float32(2.0)
    got = np.asarray(enc(jnp.asarray(pts), alpha))
    want = np.asarray(encode_points_batch(jnp.asarray(pts), alpha, cfg))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sharded_ring_encoder_matches_single_device():
    from neural_spectral_codec_tpu.ops.ring_path import (
        encode_points_ring_batch, make_structured_ring_scans)
    from neural_spectral_codec_tpu.parallel.encode import (
        make_sharded_ring_encoder)
    cfg = SpectralEncoderConfig(n_elevation=16, n_azimuth=90, n_bins=20)
    rows = tuple(range(16))
    pts = make_structured_ring_scans(8, 16, 128, cfg.projection, seed=3)
    mesh = create_mesh(8)
    enc = make_sharded_ring_encoder(cfg, mesh, rows)
    alpha = jnp.float32(2.0)
    got = np.asarray(enc(jnp.asarray(pts), alpha))
    want = np.asarray(encode_points_ring_batch(jnp.asarray(pts), alpha,
                                               cfg, rows))
    # fp reduction-order noise only (the partitioner re-tiles the
    # spectral matmuls); observed ~1e-9
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("shard_nodes", [False, True])
def test_sharded_grads_match_single_device(rng, shard_nodes):
    """Gradients under SPMD sharding must equal the single-device ones
    (up to fp32 reduction-order noise). Raw grads are compared — Adam
    amplifies near-zero-gradient noise by g/√v, so comparing post-update
    params is flaky by construction."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from neural_spectral_codec_tpu.training.loss import triplet_loss

    model = SpectralGNN(input_dim=32, hidden_dim=16, output_dim=32,
                        dropout=0.0)
    graph = _tiny_graph(rng, n_nodes=16, dim=32)
    params, bs = init_gnn(model, jax.random.key(0))

    n_trip = 16
    tri = rng.integers(0, 16, (n_trip, 3))
    g = (jnp.asarray(graph.features), jnp.asarray(graph.neighbors),
         jnp.asarray(graph.mask), jnp.asarray(graph.edge_feats))
    tr = (jnp.asarray(tri[:, 0]), jnp.asarray(tri[:, 1]),
          jnp.asarray(tri[:, 2]), jnp.asarray(np.ones(n_trip, bool)))

    def loss_fn(p, features, neighbors, mask, edge_feats,
                a_idx, p_idx, n_idx, tmask):
        emb, _ = model.apply(
            {"params": p, "batch_stats": bs},
            features, neighbors, mask, edge_feats, train=True,
            rngs={"dropout": jax.random.key(1)}, mutable=["batch_stats"])
        return triplet_loss(emb[a_idx], emb[p_idx], emb[n_idx],
                            margin=0.1, mask=tmask)

    ref_loss, ref_grads = jax.jit(
        jax.value_and_grad(loss_fn))(params, *g, *tr)

    mesh = create_mesh(8)
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("data"))
    nodes2 = NamedSharding(mesh, P("data", None)) if shard_nodes else repl
    nodes3 = NamedSharding(mesh, P("data", None, None)) if shard_nodes else repl
    sharded = jax.jit(jax.value_and_grad(loss_fn),
                      in_shardings=(repl, nodes2, nodes2, nodes2, nodes3,
                                    dp, dp, dp, dp))
    got_loss, got_grads = sharded(params, *g, *tr)

    np.testing.assert_allclose(float(got_loss), float(ref_loss),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(got_grads), jax.tree.leaves(ref_grads)):
        a, b = np.asarray(a), np.asarray(b)
        # reassociation noise scales with the leaf's grad magnitude; leaves
        # whose true grad is structurally zero (biases feeding BatchNorm)
        # are pure noise on both sides and covered by the atol floor
        np.testing.assert_allclose(a, b, atol=3e-5 + 1e-5 * np.abs(b).max())


@pytest.mark.parametrize("shard_nodes", [False, True])
def test_sharded_train_step_runs_and_learns(rng, shard_nodes):
    """Public sharded train-step API: loss matches the single-device step
    exactly on step 1 and stays in lockstep (to fp32 noise) over a few
    steps of real optimization."""
    model = SpectralGNN(input_dim=32, hidden_dim=16, output_dim=32,
                        dropout=0.0)
    graph = _tiny_graph(rng, n_nodes=16, dim=32)
    params, bs = init_gnn(model, jax.random.key(0))
    opt = make_optimizer()

    tri = rng.integers(0, 16, (16, 3))
    g = (jnp.asarray(graph.features), jnp.asarray(graph.neighbors),
         jnp.asarray(graph.mask), jnp.asarray(graph.edge_feats))
    tr = (jnp.asarray(tri[:, 0]), jnp.asarray(tri[:, 1]),
          jnp.asarray(tri[:, 2]), jnp.asarray(np.ones(16, bool)))

    mesh = create_mesh(8)
    step = make_sharded_train_step(model, opt, mesh, shard_nodes=shard_nodes)

    ref_state = (params, bs, opt.init(params))
    got_state = (params, bs, opt.init(params))
    for i in range(3):
        key = jax.random.key(i)
        *ref_state, ref_loss = train_step(
            model, opt, *ref_state, *g, *tr, 0.1, key)
        *got_state, got_loss = step(*got_state, *g, *tr, 0.1, key)
        np.testing.assert_allclose(float(got_loss), float(ref_loss),
                                   rtol=1e-4, atol=1e-5)


def test_sharded_eval_matches_single_device(rng):
    model = SpectralGNN(input_dim=32, hidden_dim=16, output_dim=32,
                        dropout=0.0)
    graph = _tiny_graph(rng, n_nodes=24, dim=32)
    params, bs = init_gnn(model, jax.random.key(0))
    mesh = create_mesh(8)
    ev = make_sharded_eval_step(model, mesh, shard_nodes=True)
    got = np.asarray(ev(params, bs, jnp.asarray(graph.features),
                        jnp.asarray(graph.neighbors),
                        jnp.asarray(graph.mask),
                        jnp.asarray(graph.edge_feats)))
    want = np.asarray(gnn_forward(model, params, bs, graph))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_trainer_sharded_embed_and_validate_match_single_device(rng):
    """The mesh-aware offline validation pass (trainer.embed through the
    node-sharded eval forward — with node-axis padding — plus the
    query-sharded recall chunks) equals the single-device pass."""
    from neural_spectral_codec_tpu.training.trainer import GNNTrainer
    from neural_spectral_codec_tpu.training.validation import (
        recall_loop_closure)

    # 21 nodes: NOT divisible by the 8-device mesh, so embed() must pad
    n_nodes, dim = 21, 32
    graph = _tiny_graph(rng, n_nodes=n_nodes, dim=dim)
    model_kw = dict(input_dim=dim, hidden_dim=16, output_dim=dim,
                    dropout=0.0)
    mesh = create_mesh(8)
    t_mesh = GNNTrainer(model=SpectralGNN(**model_kw), mesh=mesh,
                        shard_nodes=True, seed=0,
                        checkpoint_dir="/tmp/nsc_test_ckpt_shard")
    t_one = GNNTrainer(model=SpectralGNN(**model_kw), seed=0,
                       checkpoint_dir="/tmp/nsc_test_ckpt_one")
    emb_m = t_mesh.embed(graph)
    emb_1 = t_one.embed(graph)
    assert emb_m.shape == (n_nodes, dim)
    np.testing.assert_allclose(emb_m, emb_1, rtol=1e-4, atol=1e-5)

    # revisit-rich poses: second half re-occupies the first half
    period = 10
    poses = np.tile(np.eye(4, dtype=np.float32), (n_nodes, 1, 1))
    ang = np.arange(n_nodes) * 2 * np.pi / period
    poses[:, 0, 3] = 30.0 * np.cos(ang)
    poses[:, 1, 3] = 30.0 * np.sin(ang)
    r_m, nq_m = recall_loop_closure(emb_1, poses, k=1,
                                    distance_threshold=1.0,
                                    skip_frames=period - 1, mesh=mesh)
    r_1, nq_1 = recall_loop_closure(emb_1, poses, k=1,
                                    distance_threshold=1.0,
                                    skip_frames=period - 1)
    assert nq_m == nq_1 > 0
    assert abs(r_m - r_1) < 1e-6

    # validate() end to end through the mesh path
    m = t_mesh.validate(graph, poses, distance_threshold=1.0,
                        skip_frames=period - 1, ks=(1, 5))
    m1 = t_one.validate(graph, poses, distance_threshold=1.0,
                        skip_frames=period - 1, ks=(1, 5))
    for k in ("recall@1", "recall@5", "n_queries"):
        assert abs(m[k] - m1[k]) < 1e-6, (k, m[k], m1[k])


def test_sharded_retriever_matches_single_device(rng):
    n, bins = 64, 50
    hists = rng.random((n, bins), dtype=np.float32)
    hists /= hists.sum(axis=1, keepdims=True)
    pos = rng.random((n, 3), dtype=np.float32) * 100

    mesh = create_mesh(8)
    sharded = ShardedWassersteinRetriever(mesh, n_bins=bins, capacity=64)
    plain = WassersteinRetriever(n_bins=bins, capacity=64)
    sharded.add_to_database(hists, pos)
    plain.add_to_database(hists, pos)

    q = hists[7]
    qp = pos[7]
    i1, d1 = sharded.query(q, top_k=5, query_position=qp,
                           spatial_min_distance=20.0)
    i2, d2 = plain.query(q, top_k=5, query_position=qp,
                         spatial_min_distance=20.0)
    np.testing.assert_allclose(np.sort(d1), np.sort(d2), rtol=1e-5, atol=1e-7)
    assert set(i1.tolist()) == set(i2.tolist())


def test_sharded_retriever_partial_fill(rng):
    """Database smaller than one shard slab must still answer correctly."""
    mesh = create_mesh(8)
    r = ShardedWassersteinRetriever(mesh, n_bins=20, capacity=80)
    h = rng.random((3, 20), dtype=np.float32)
    h /= h.sum(axis=1, keepdims=True)
    r.add_to_database(h)
    idx, dist = r.query(h[1], top_k=10)
    assert len(idx) == 3
    assert idx[0] == 1 and dist[0] < 1e-6


def test_pad_to_multiple():
    a = np.arange(10)
    p, m = pad_to_multiple(a, 8)
    assert p.shape[0] == 16 and m.sum() == 10
    b, mb = pad_to_multiple(np.ones((8, 2)), 8)
    assert b.shape == (8, 2) and mb.all()


def test_trainer_with_mesh_trains(rng, tmp_path):
    """GNNTrainer(mesh=) runs SPMD training end-to-end and tracks the
    single-device trainer's loss trajectory."""
    from neural_spectral_codec_tpu.training.trainer import GNNTrainer
    from neural_spectral_codec_tpu.training.miner import create_triplet_miner

    model = SpectralGNN(input_dim=32, hidden_dim=16, output_dim=32,
                        dropout=0.0)
    graph = _tiny_graph(rng, n_nodes=40, dim=32)
    poses = np.tile(np.eye(4, dtype=np.float32), (40, 1, 1))
    poses[:, 0, 3] = np.arange(40) * 2.0
    poses[20:, 0, 3] = poses[:20, 0, 3]  # revisits so triplets exist
    def miner():  # fresh identically-seeded miner per trainer (the
        # miner's RNG key advances on every mine_triplets call)
        return create_triplet_miner(positive_temporal_min=5,
                                    negative_temporal_min=5,
                                    negative_distance_min=4.0,
                                    negative_distance_max=50.0)

    kwargs = dict(model=model, checkpoint_dir=str(tmp_path),
                  triplets_per_step=64, seed=0)
    t_single = GNNTrainer(**kwargs)
    t_mesh = GNNTrainer(mesh=create_mesh(8), **kwargs)
    l1 = t_single.train_epoch(graph, miner(), poses, graph.features)
    l2 = t_mesh.train_epoch(graph, miner(), poses, graph.features)
    assert l2 > 0
    np.testing.assert_allclose(l2, l1, rtol=1e-3)


def test_sharded_query_batch_matches_plain(rng):
    n, bins = 64, 50
    hists = rng.random((n, bins), dtype=np.float32)
    hists /= hists.sum(axis=1, keepdims=True)
    pos = rng.random((n, 3), dtype=np.float32) * 100
    mesh = create_mesh(8)
    sharded = ShardedWassersteinRetriever(mesh, n_bins=bins, capacity=64)
    plain = WassersteinRetriever(n_bins=bins, capacity=64)
    sharded.add_to_database(hists, pos)
    plain.add_to_database(hists, pos)
    qs = [3, 17, 42]
    bidx, bdist = sharded.query_batch(hists[qs], top_k=5,
                                      query_positions=pos[qs],
                                      spatial_min_distance=20.0)
    for row, qi in enumerate(qs):
        sidx, sdist = plain.query(hists[qi], top_k=5, query_position=pos[qi],
                                  spatial_min_distance=20.0)
        keep = np.isfinite(bdist[row])
        np.testing.assert_allclose(np.sort(bdist[row][keep]),
                                   np.sort(sdist), rtol=1e-5, atol=1e-7)
        assert set(bidx[row][keep].tolist()) == set(sidx.tolist())


def test_sharded_retriever_exclude_last(rng):
    mesh = create_mesh(8)
    r = ShardedWassersteinRetriever(mesh, n_bins=20, capacity=64)
    h = rng.random((40, 20), dtype=np.float32)
    h /= h.sum(axis=1, keepdims=True)
    r.add_to_database(h)
    idx, _ = r.query(h[39], top_k=40, exclude_last=10)
    assert len(idx) == 30 and idx.max() < 30


def test_sharded_retriever_l2_matches_plain(rng):
    """metric="l2" surface parity: GNN-embedding retrieval must scale
    across chips identically to the unsharded retriever."""
    n, dim = 64, 32
    vecs = rng.normal(size=(n, dim)).astype(np.float32)  # embeddings: signed
    pos = rng.random((n, 3), dtype=np.float32) * 100
    mesh = create_mesh(8)
    sharded = ShardedWassersteinRetriever(mesh, n_bins=dim, capacity=64,
                                          metric="l2")
    plain = WassersteinRetriever(n_bins=dim, capacity=64, metric="l2")
    sharded.add_to_database(vecs, pos)
    plain.add_to_database(vecs, pos)
    for qi in (0, 31, 63):
        i1, d1 = sharded.query(vecs[qi], top_k=5, query_position=pos[qi],
                               spatial_min_distance=20.0)
        i2, d2 = plain.query(vecs[qi], top_k=5, query_position=pos[qi],
                             spatial_min_distance=20.0)
        np.testing.assert_allclose(np.sort(d1), np.sort(d2),
                                   rtol=1e-5, atol=1e-6)
        assert set(i1.tolist()) == set(i2.tolist())


def test_sharded_retriever_update_rows_matches_plain(rng):
    """Row refreshes (GNN local updates) must behave identically sharded
    and unsharded, for both metrics, including rows on different shards."""
    n, bins = 64, 50
    for metric in ("wasserstein", "l2"):
        hists = rng.random((n, bins), dtype=np.float32)
        hists /= hists.sum(axis=1, keepdims=True)
        mesh = create_mesh(8)
        sharded = ShardedWassersteinRetriever(mesh, n_bins=bins,
                                              capacity=64, metric=metric)
        plain = WassersteinRetriever(n_bins=bins, capacity=64, metric=metric)
        sharded.add_to_database(hists)
        plain.add_to_database(hists)
        # refresh rows scattered across several shard slabs
        refresh_idx = np.array([0, 9, 23, 41, 63])
        fresh = rng.random((len(refresh_idx), bins), dtype=np.float32)
        fresh /= fresh.sum(axis=1, keepdims=True)
        sharded.update_rows(refresh_idx, fresh)
        plain.update_rows(refresh_idx, fresh)
        i1, d1 = sharded.query(fresh[2], top_k=5)
        i2, d2 = plain.query(fresh[2], top_k=5)
        assert i1[0] == 23 and i2[0] == 23, (metric, i1, i2)
        np.testing.assert_allclose(np.sort(d1), np.sort(d2),
                                   rtol=1e-5, atol=1e-6)
        assert set(i1.tolist()) == set(i2.tolist())


def test_plain_query_batch_exclude_last(rng):
    """query() / query_batch() parity for temporal exclusion on the
    unsharded retriever."""
    r = WassersteinRetriever(n_bins=20, capacity=64)
    h = rng.random((40, 20), dtype=np.float32)
    h /= h.sum(axis=1, keepdims=True)
    r.add_to_database(h)
    bidx, bdist = r.query_batch(h[[39, 5]], top_k=40, exclude_last=10)
    # k is clamped by capacity (one executable per top_k); excluded rows
    # carry inf — exactly 30 valid entries, none from the excluded tail
    assert bidx.shape[1] == 40
    finite = np.isfinite(bdist)
    assert finite.sum(axis=1).tolist() == [30, 30]
    assert bidx[finite].max() < 30
    sidx, sdist = r.query(h[39], top_k=40, exclude_last=10)
    keep = np.isfinite(bdist[0])
    np.testing.assert_allclose(np.sort(bdist[0][keep]), np.sort(sdist),
                               rtol=1e-6, atol=1e-7)


def test_plain_query_and_query_batch_same_normalization(rng):
    """Advisor finding: both query paths must share one CDF normalization —
    identical (even unnormalized) inputs must give identical W1 distances."""
    r = WassersteinRetriever(n_bins=20, capacity=16)
    h = rng.random((8, 20), dtype=np.float32) * 3.0  # deliberately unnormalized
    r.add_to_database(h)
    sidx, sdist = r.query(h[3], top_k=8)
    bidx, bdist = r.query_batch(h[[3]], top_k=8)
    np.testing.assert_array_equal(sidx, bidx[0])
    np.testing.assert_allclose(sdist, bdist[0], rtol=0, atol=1e-7)


def test_two_stage_sharded_retriever_matches_unsharded(rng):
    """TwoStageRetrieval(mesh=...) row-shards stage 1 with identical
    results — the pipeline's parallel.shard_retrieval_db flag must not
    change retrieval outcomes."""
    from neural_spectral_codec_tpu.keyframe.selector import Keyframe
    from neural_spectral_codec_tpu.retrieval.two_stage import (
        TwoStageRetrieval)

    mesh = create_mesh()
    opts = dict(top_k=5, spatial_filter_distance=0.0, context_window=2,
                capacity=128)
    plain = TwoStageRetrieval(**opts)
    sharded = TwoStageRetrieval(mesh=mesh, **opts)
    for i in range(40):
        d = np.abs(rng.random(800)).astype(np.float32)
        d /= d.sum()
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = rng.random(3) * 500
        kf = Keyframe(keyframe_id=i, scan_id=i, timestamp=float(i),
                      pose=pose, points=None, descriptor=d)
        plain.add_keyframe(kf)
        sharded.add_keyframe(kf)
    for q in range(5, 35, 7):
        c1 = plain._global_retrieval(plain.keyframes[q])
        c2 = sharded._global_retrieval(sharded.keyframes[q])
        assert [c.database_idx for c in c1] == [c.database_idx for c in c2]
        np.testing.assert_allclose([c.distance for c in c1],
                                   [c.distance for c in c2], atol=1e-5)
    # snapshot queries agree too
    c1 = plain._global_retrieval(plain.keyframes[10], as_of_size=20)
    c2 = sharded._global_retrieval(sharded.keyframes[10], as_of_size=20)
    assert [c.database_idx for c in c1] == [c.database_idx for c in c2]


def test_pipeline_config_shards_retrieval_db(tmp_path, rng):
    """parallel.shard_retrieval_db wires the sharded retriever into the
    pipeline (the key existed in configs; it must not be dead)."""
    from tests.test_pipeline import small_config
    from neural_spectral_codec_tpu.pipeline import NeuralSpectralCodecPipeline

    cfg = small_config(tmp_path)
    cfg.setdefault("parallel", {})["shard_retrieval_db"] = True
    pipe = NeuralSpectralCodecPipeline(cfg)
    assert isinstance(pipe.retrieval.retriever, ShardedWassersteinRetriever)


def test_sharded_retriever_quantized_matches_unsharded(rng):
    """uint16 storage in the row-sharded retriever: identical ranking and
    bit-identical distances vs the unsharded uint16 retriever (both
    dequantize the same codes), and top-k parity vs fp32 storage."""
    n, bins = 64, 50
    hists = rng.random((n, bins), dtype=np.float32)
    hists /= hists.sum(axis=1, keepdims=True)
    pos = rng.random((n, 3), dtype=np.float32) * 100

    mesh = create_mesh(8)
    sharded = ShardedWassersteinRetriever(mesh, n_bins=bins, capacity=64,
                                          storage="uint16")
    plain16 = WassersteinRetriever(n_bins=bins, capacity=64,
                                   storage="uint16")
    plain32 = WassersteinRetriever(n_bins=bins, capacity=64)
    for r in (sharded, plain16, plain32):
        r.add_to_database(hists, pos)
    assert sharded._db_cdf.dtype == np.uint16

    q, qp = hists[7], pos[7]
    i_s, d_s = sharded.query(q, top_k=5, query_position=qp,
                             spatial_min_distance=20.0)
    i_16, d_16 = plain16.query(q, top_k=5, query_position=qp,
                               spatial_min_distance=20.0)
    i_32, d_32 = plain32.query(q, top_k=5, query_position=qp,
                               spatial_min_distance=20.0)
    assert set(i_s.tolist()) == set(i_16.tolist()) == set(i_32.tolist())
    np.testing.assert_allclose(np.sort(d_s), np.sort(d_16),
                               rtol=1e-6, atol=1e-7)
    bound = bins * 0.5 / 65535.0
    assert np.max(np.abs(np.sort(d_s) - np.sort(d_32))) <= bound + 1e-6
