"""Training-layer tests: loss semantics, miner constraint satisfaction vs a
brute-force oracle, recall metric vs a Python-loop oracle, a short training
run that must reduce loss and reach high recall on separable data, and
checkpoint round-trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_spectral_codec_tpu.training import (
    triplet_loss, TripletMiner, recall_loop_closure, find_revisit_queries,
    GNNTrainer,
)
from neural_spectral_codec_tpu.models import SpectralGNN
from neural_spectral_codec_tpu.keyframe import build_graph
from neural_spectral_codec_tpu.data.synthetic import loop_trajectory
from oracle import oracle_wasserstein_batch


# ---------------- loss ----------------

def test_triplet_loss_values():
    a = jnp.zeros((2, 4))
    p = jnp.ones((2, 4)) * 0.1   # pos dist² = 0.04
    n = jnp.ones((2, 4))         # neg dist² = 4
    # relu(0.04 - 4 + 0.1) = 0
    assert float(triplet_loss(a, p, n, margin=0.1)) == 0.0
    # swap p/n: relu(4 - 0.04 + 0.1) = 4.06
    np.testing.assert_allclose(float(triplet_loss(a, n, p, margin=0.1)),
                               4.06, atol=1e-6)


def test_triplet_loss_mask():
    a = jnp.zeros((3, 2))
    p = jnp.ones((3, 2))
    n = jnp.zeros((3, 2))
    mask = jnp.array([True, True, False])
    full = float(triplet_loss(a, p, n, margin=0.1))
    masked = float(triplet_loss(a, p, n, margin=0.1, mask=mask))
    np.testing.assert_allclose(masked, full, atol=1e-6)  # same per-triplet value
    zero_mask = jnp.zeros(3, bool)
    assert float(triplet_loss(a, p, n, mask=zero_mask)) == 0.0


# ---------------- miner ----------------

def _mining_setup(rng, n=120):
    poses = loop_trajectory(n, radius=80.0, loops=2.0)
    desc = rng.uniform(0, 1, (n, 32)).astype(np.float32)
    desc /= desc.sum(1, keepdims=True)
    return poses, desc


def test_miner_constraints(rng):
    poses, desc = _mining_setup(rng)
    m = TripletMiner()
    tri = m.mine_triplets(desc, poses)
    assert len(tri) > 0
    pos = poses[:, :3, 3]
    for a, p, n in tri:
        dp = np.linalg.norm(pos[a] - pos[p])
        dn = np.linalg.norm(pos[a] - pos[n])
        assert dp < 5.0 and abs(a - p) >= 30
        assert 10.0 <= dn <= 50.0 and abs(a - n) >= 30


def test_miner_hard_negative_is_argmin_w1(rng):
    poses, desc = _mining_setup(rng)
    m = TripletMiner(mining_strategy="hard")
    tri = m.mine_triplets(desc, poses)
    pos = poses[:, :3, 3]
    n_kf = len(desc)
    for a, p, n in tri[:20]:
        d = np.linalg.norm(pos - pos[a], axis=1)
        gap = np.abs(np.arange(n_kf) - a)
        cand = np.where((d >= 10) & (d <= 50) & (gap >= 30))[0]
        w1 = oracle_wasserstein_batch(desc[a], desc[cand])
        assert n == cand[np.argmin(w1)]


def test_miner_per_sequence_isolation(rng):
    poses, desc = _mining_setup(rng)
    seq = np.zeros(len(desc), np.int64)
    seq[60:] = 1
    m = TripletMiner()
    tri = m.mine_triplets(desc, poses, sequence_ids=seq)
    for a, p, n in tri:
        assert seq[a] == seq[p] == seq[n]


def test_miner_empty_when_no_revisits(rng):
    # straight line: no positives (never revisits with ≥30-frame gap)
    n = 100
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 0, 3] = np.arange(n) * 2.0
    desc = rng.uniform(0, 1, (n, 16)).astype(np.float32)
    tri = TripletMiner().mine_triplets(desc, poses)
    assert len(tri) == 0


# ---------------- recall ----------------

def recall_oracle(emb, poses, k, thresh=5.0, skip=30):
    """Direct transcription of the reference's evaluation loops
    (trainer.py:332-387) as an oracle."""
    n = len(emb)
    pos = poses[:, :3, 3]
    pd = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
    queries = []
    for i in range(n):
        for j in range(i + skip, n):
            if pd[i, j] < thresh:
                queries.append((j, i))
                break
    if not queries:
        return 0.0, 0
    ed = np.linalg.norm(emb[:, None] - emb[None], axis=-1)
    correct = 0
    for q, _ in queries:
        cands = [(i, ed[q, i], pd[q, i]) for i in range(n) if abs(i - q) > skip]
        cands.sort(key=lambda t: t[1])
        if any(g < thresh for _, _, g in cands[:k]):
            correct += 1
    return correct / len(queries), len(queries)


def test_recall_matches_oracle(rng):
    n = 80
    poses = loop_trajectory(n, radius=60.0, loops=2.0)
    emb = rng.normal(size=(n, 16)).astype(np.float32)
    for k in (1, 5):
        got, nq = recall_loop_closure(emb, poses, k=k)
        ref, nq_ref = recall_oracle(emb, poses, k)
        assert nq == nq_ref
        np.testing.assert_allclose(got, ref, atol=1e-6)


def test_recall_perfect_embeddings():
    """Embeddings equal to positions → R@1 must be 1.0 on a loop."""
    n = 80
    poses = loop_trajectory(n, radius=60.0, loops=2.0)
    emb = poses[:, :3, 3].astype(np.float32)
    r, nq = recall_loop_closure(emb, poses, k=1)
    assert nq > 0 and r == 1.0


# ---------------- trainer ----------------

def test_training_improves_recall(rng, tmp_path):
    """Separable synthetic task: descriptors carry a noisy place signal;
    training must drive loss down and produce usable recall."""
    n, d = 120, 32
    poses = loop_trajectory(n, radius=80.0, loops=2.0)
    angle = np.arctan2(poses[:, 1, 3], poses[:, 0, 3])
    place = np.stack([np.cos(angle * f) for f in range(1, d + 1)], axis=1)
    desc = (place + rng.normal(0, 0.3, (n, d))).astype(np.float32)
    desc = np.abs(desc)
    desc /= desc.sum(1, keepdims=True)
    graph = build_graph(desc, poses, temporal_neighbors=5)

    model = SpectralGNN(input_dim=d, hidden_dim=16, output_dim=d,
                        n_layers=3, edge_dim=2, dropout=0.0)
    tr = GNNTrainer(model=model, checkpoint_dir=str(tmp_path),
                    triplets_per_step=256, learning_rate=1e-3)
    miner = TripletMiner(seed=1)
    losses = []
    for epoch in range(10):
        tr.epoch = epoch
        losses.append(tr.train_epoch(graph, miner, poses, desc))
    # mechanism checks: optimization makes progress and embeddings stay
    # place-discriminative (the untrained input-residual baseline is already
    # decent on this toy task, so we assert usable recall, not improvement)
    assert losses[-1] < 0.5 * losses[0]
    m = tr.validate(graph, poses)
    assert m["n_queries"] > 0
    assert m["recall@5"] > 0.2


def test_checkpoint_roundtrip(tmp_path, rng):
    n, d = 60, 16
    poses = loop_trajectory(n, radius=80.0, loops=2.0)
    desc = rng.uniform(0, 1, (n, d)).astype(np.float32)
    graph = build_graph(desc, poses)
    model = SpectralGNN(input_dim=d, hidden_dim=8, output_dim=d,
                        n_layers=2, edge_dim=2, dropout=0.0)
    tr = GNNTrainer(model=model, checkpoint_dir=str(tmp_path),
                    triplets_per_step=128)
    tr.train_epoch(graph, TripletMiner(), poses, desc)
    tr.best_val_metric = 0.5
    tr.global_step = 7
    tr.save_checkpoint("best_model")

    tr2 = GNNTrainer(model=model, checkpoint_dir=str(tmp_path),
                     triplets_per_step=128)
    tr2.load_checkpoint("best_model")
    assert tr2.global_step == 7
    assert tr2.best_val_metric == 0.5
    e1 = tr.embed(graph)
    e2 = tr2.embed(graph)
    np.testing.assert_allclose(e1, e2, atol=1e-6)
    with pytest.raises(FileNotFoundError):
        tr2.load_checkpoint("nope")


def test_batch_triplet_miner_hard():
    from neural_spectral_codec_tpu.training.miner import BatchTripletMiner
    emb = np.array([[0.0, 0], [0.1, 0], [5, 5], [5.1, 5], [9, 9]], np.float32)
    labels = np.array([0, 0, 1, 1, 2])
    m = BatchTripletMiner(mining_strategy="hard")
    a, p, n = m.mine_batch_triplets(emb, labels)
    # anchor 4 (label 2) has no positive -> dropped
    assert len(a) == 4
    # anchor 0: hard positive is its same-label farthest = emb[1];
    # hard negative is closest different label = emb[2]
    np.testing.assert_allclose(p[0], emb[1])
    np.testing.assert_allclose(n[0], emb[2])


def test_batch_triplet_miner_semi_hard_and_random():
    from neural_spectral_codec_tpu.training.miner import BatchTripletMiner
    rng = np.random.default_rng(0)
    emb = rng.random((20, 8)).astype(np.float32)
    labels = rng.integers(0, 4, 20)
    for strat in ("semi-hard", "random"):
        m = BatchTripletMiner(mining_strategy=strat)
        a, p, n = m.mine_batch_triplets(emb, labels)
        assert a.shape == p.shape == n.shape
        assert len(a) > 0


def test_batch_triplet_miner_no_valid():
    from neural_spectral_codec_tpu.training.miner import BatchTripletMiner
    emb = np.ones((3, 4), np.float32)
    a, p, n = BatchTripletMiner().mine_batch_triplets(emb, np.zeros(3))
    assert len(a) == 0  # all same label -> no negatives


def test_metrics_jsonl_written(tmp_path):
    import json
    import jax
    from neural_spectral_codec_tpu.keyframe.graph import build_graph
    from neural_spectral_codec_tpu.models.gnn import SpectralGNN
    from neural_spectral_codec_tpu.training.miner import create_triplet_miner
    from neural_spectral_codec_tpu.training.trainer import GNNTrainer

    rng = np.random.default_rng(0)
    n = 40
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    poses[:, 0, 3] = np.arange(n) * 2.0
    poses[20:, 0, 3] = poses[:20, 0, 3]
    feats = rng.random((n, 32), dtype=np.float32)
    graph = build_graph(feats, poses)
    t = GNNTrainer(model=SpectralGNN(input_dim=32, hidden_dim=16,
                                     output_dim=32),
                   checkpoint_dir=str(tmp_path), triplets_per_step=64)
    miner = create_triplet_miner(positive_temporal_min=5,
                                 negative_temporal_min=5,
                                 negative_distance_min=4.0)
    t.train(graph, poses, feats, val_graph=graph, val_poses=poses,
            n_epochs=2, triplet_miner=miner)
    lines = [json.loads(l) for l in
             (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert any("train_loss" in r for r in lines)
    assert any("recall@1" in r for r in lines)


def test_recall_chunked_matches_unchunked(rng):
    from neural_spectral_codec_tpu.training.validation import recall_loop_closure
    n = 120
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    poses[:, 0, 3] = np.arange(n) * 3.0
    poses[60:, 0, 3] = poses[:60, 0, 3]          # revisits
    emb = rng.random((n, 16)).astype(np.float32)
    r_big, q_big = recall_loop_closure(emb, poses, 5, query_chunk=4096)
    r_small, q_small = recall_loop_closure(emb, poses, 5, query_chunk=7)
    assert q_big == q_small > 0
    np.testing.assert_allclose(r_big, r_small, atol=1e-6)


def test_lr_step_decay(tmp_path):
    import json
    from neural_spectral_codec_tpu.keyframe.graph import build_graph
    from neural_spectral_codec_tpu.models.gnn import SpectralGNN
    from neural_spectral_codec_tpu.training.miner import create_triplet_miner
    from neural_spectral_codec_tpu.training.trainer import GNNTrainer

    rng = np.random.default_rng(0)
    n = 40
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    poses[:, 0, 3] = np.arange(n) * 2.0
    poses[20:, 0, 3] = poses[:20, 0, 3]
    feats = rng.random((n, 32), dtype=np.float32)
    graph = build_graph(feats, poses)
    t = GNNTrainer(model=SpectralGNN(input_dim=32, hidden_dim=16,
                                     output_dim=32),
                   learning_rate=1e-3, checkpoint_dir=str(tmp_path),
                   triplets_per_step=64, lr_decay_epochs=[1],
                   lr_decay_factor=0.1)
    miner = create_triplet_miner(positive_temporal_min=5,
                                 negative_temporal_min=5,
                                 negative_distance_min=4.0)
    t.train(graph, poses, feats, n_epochs=2, triplet_miner=miner)
    assert abs(t.current_lr - 1e-4) < 1e-9
    np.testing.assert_allclose(
        float(t.opt_state.hyperparams["learning_rate"]), t.current_lr,
        rtol=1e-6)
    lines = [json.loads(l) for l in
             (tmp_path / "metrics.jsonl").read_text().splitlines()]
    lrs = [r["lr"] for r in lines if "lr" in r]
    assert lrs[0] == 1e-3 and abs(lrs[-1] - 1e-4) < 1e-9


def test_normalized_triplet_loss():
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.training.loss import l2_normalize, triplet_loss
    rng = np.random.default_rng(0)
    a = rng.normal(0, 3, (8, 16)).astype(np.float32)
    p = rng.normal(0, 3, (8, 16)).astype(np.float32)
    n = rng.normal(0, 3, (8, 16)).astype(np.float32)
    got = float(triplet_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n),
                             margin=0.5, normalize=True))
    an, pn, nn_ = (np.asarray(l2_normalize(jnp.asarray(x)))
                   for x in (a, p, n))
    want = np.maximum(((an - pn) ** 2).sum(1) - ((an - nn_) ** 2).sum(1)
                      + 0.5, 0).mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # normalized squared distances are bounded by 4
    big = float(triplet_loss(jnp.asarray(a * 100), jnp.asarray(p),
                             jnp.asarray(n), margin=0.0, normalize=True))
    assert big <= 4.0


def test_find_revisit_queries_chunked_matches_direct(rng):
    """The row-chunked dot-product revisit scan must reproduce the direct
    (n, n, 3) broadcast exactly — including across chunk boundaries."""
    n = 500
    t = np.linspace(0, 4 * np.pi, n)
    pos = np.stack([50 * np.cos(t), 50 * np.sin(t),
                    rng.normal(0, 0.5, n)], axis=1).astype(np.float32)
    # direct reference formulation
    d = np.linalg.norm(pos[:, None].astype(np.float64)
                       - pos[None].astype(np.float64), axis=-1)
    j_idx = np.arange(n)
    band = (j_idx[None, :] - j_idx[:, None]) >= 30
    hit = (d < 5.0) & band
    has = hit.any(axis=1)
    want = np.stack([np.argmax(hit, axis=1)[has], np.nonzero(has)[0]], 1)

    got = find_revisit_queries(pos, 5.0, 30, row_chunk=64)
    np.testing.assert_array_equal(got, want)
    assert len(got) > 50   # the loop trajectory must actually revisit


def test_miner_chunked_crosses_boundary(rng):
    """Mining with n > chunk (2048) exercises the multi-chunk path with
    hoisted device transfers; hard negatives must still be the exact
    masked argmin-W1 for anchors in BOTH chunks (regression for the
    per-chunk re-upload fix — behavior, not timing)."""
    n = 2200
    poses = loop_trajectory(n, radius=80.0, loops=9.0)
    desc = rng.uniform(0, 1, (n, 16)).astype(np.float32)
    desc /= desc.sum(1, keepdims=True)
    m = TripletMiner(mining_strategy="hard")
    tri = m.mine_triplets(desc, poses)
    assert len(tri) > 0
    pos = poses[:, :3, 3]
    by_anchor = {int(a): (int(p), int(ng)) for a, p, ng in tri}
    # sample anchors straddling the 2048 boundary
    picks = [a for a in range(2030, 2070) if a in by_anchor][:10]
    assert picks, "no valid anchors near the chunk boundary"
    for a in picks:
        _, neg = by_anchor[a]
        d = np.linalg.norm(pos - pos[a], axis=1)
        gap = np.abs(np.arange(n) - a)
        cand = np.where((d >= 10) & (d <= 50) & (gap >= 30))[0]
        w1 = oracle_wasserstein_batch(desc[a], desc[cand])
        assert neg == cand[np.argmin(w1)]
