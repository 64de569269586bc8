#!/usr/bin/env python
"""Reference-claimed scale, demonstrated end to end: ~100k-node graph.

The reference claims 170k-keyframe batch graph builds
(graph_manager.py:499-500) and 100k-node windows / databases
(configs/default.yaml:42, inference.yaml:29) but never demonstrates a
training or retrieval run at that scale. This experiment runs one:

  * synthetic 100k-keyframe trajectory (multi-loop, revisit-rich) with
    place-coherent descriptors,
  * O(n) batch graph build (timed),
  * triplet mining over all 100k anchors (chunked device kernel, timed),
  * a full training epoch of jitted 4096-triplet steps over the
    100k-node graph (per-step time reported),
  * chunked Recall@{1,5,10} validation over all revisit queries (timed),
  * peak device memory, when the backend exposes memory_stats().

Modes:
  python experiments/scale_100k.py                 # full demo (TPU)
  python experiments/scale_100k.py --nodes 20000   # smaller
  python experiments/scale_100k.py --compare-sharded
      # single- vs 8-way node-sharded train step on the CPU mesh:
      # asserts gradients/losses match at a reduced node count (the CPU
      # host has one core; the equality is scale-independent)
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synthetic_city(n_nodes: int, dim: int = 800, seed: int = 0,
                   revisit_period: int = 2000):
    """Trajectory with dense revisits (``revisit_period``-frame loops) and
    descriptors that are a smooth place signature + noise, normalized
    like spectral histograms."""
    rng = np.random.default_rng(seed)
    t = np.arange(n_nodes)
    theta = 2 * np.pi * (t % revisit_period) / revisit_period
    lap = t // revisit_period
    # laps wander slightly so revisits are near (< 2 m), not identical
    positions = np.stack([
        300 * np.cos(theta) + 0.5 * rng.standard_normal(n_nodes),
        300 * np.sin(theta) + 0.5 * rng.standard_normal(n_nodes),
        np.zeros(n_nodes)], axis=1).astype(np.float32)
    W = rng.standard_normal((3, dim)).astype(np.float32) * 0.05
    sig = np.abs(np.sin(positions @ W + rng.standard_normal(dim) * 0.0))
    sig = sig + 0.25 * rng.random((n_nodes, dim), dtype=np.float32)
    desc = (sig / sig.sum(axis=1, keepdims=True)).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (n_nodes, 1, 1))
    poses[:, :3, 3] = positions
    return desc, poses, lap.astype(np.int64)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=100_000)
    ap.add_argument("--steps", type=int, default=None,
                    help="cap optimizer steps (default: full epoch)")
    ap.add_argument("--compare-sharded", action="store_true")
    ap.add_argument("--json", type=str, default=None,
                    help="write the measured metrics as a JSON artifact")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.compare_sharded:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from neural_spectral_codec_tpu.keyframe.graph import build_graph
    from neural_spectral_codec_tpu.models.gnn import SpectralGNN
    from neural_spectral_codec_tpu.training.miner import create_triplet_miner
    from neural_spectral_codec_tpu.training.trainer import GNNTrainer
    from neural_spectral_codec_tpu.training.validation import (
        recall_loop_closure)

    if args.compare_sharded:
        from neural_spectral_codec_tpu.parallel import create_mesh
        n = min(args.nodes, 4096)       # one CPU core behind 8 virtual devs
        desc, poses, _ = synthetic_city(n, revisit_period=max(n // 4, 10))
        g = build_graph(desc, poses, temporal_neighbors=5)
        rng = np.random.default_rng(0)
        trip = np.stack([rng.integers(0, n, 4096) for _ in range(3)], 1)
        model = SpectralGNN(input_dim=800, hidden_dim=256, output_dim=800)

        class _FixedMiner:
            def mine_triplets(self, **kw):
                return trip

        losses = {}
        for name, mesh, shard in (("single", None, False),
                                  ("sharded", create_mesh(), True)):
            tr = GNNTrainer(model=model, checkpoint_dir="/tmp/scale_ckpt",
                            triplets_per_step=4096, seed=0, mesh=mesh,
                            shard_nodes=shard)
            avg = [tr.train_epoch(g, _FixedMiner(), poses, desc)
                   for _ in range(2)]
            losses[name] = avg
        print("single :", losses["single"])
        print("sharded:", losses["sharded"])
        np.testing.assert_allclose(losses["sharded"], losses["single"],
                                   rtol=2e-5, atol=1e-6)
        print("OK: node-sharded training matches single-device numerics "
              f"({n} nodes, 8-way CPU mesh)")
        return

    n = args.nodes
    print(f"backend: {jax.default_backend()}  nodes: {n}")
    desc, poses, seq = synthetic_city(n)

    t0 = time.perf_counter()
    g = build_graph(desc, poses, temporal_neighbors=5)
    t_graph = time.perf_counter() - t0
    print(f"graph build ({n} nodes): {t_graph:.2f} s")

    cache = Path(f"/tmp/scale_{n}_triplets.npy")
    miner = create_triplet_miner(positive_distance_max=5.0,
                                 negative_distance_min=10.0,
                                 negative_distance_max=100.0)
    t_mine = None
    if cache.exists():
        triplets = np.load(cache)
        print(f"mining: {len(triplets)} triplets loaded from {cache}")
    else:
        t0 = time.perf_counter()
        triplets = miner.mine_triplets(desc, poses)
        t_mine = time.perf_counter() - t0
        print(f"mining: {len(triplets)} triplets over all {n} anchors "
              f"in {t_mine:.2f} s")
        np.save(cache, triplets)

    model = SpectralGNN(input_dim=800, hidden_dim=256, output_dim=800)
    trainer = GNNTrainer(model=model, checkpoint_dir="/tmp/scale_ckpt",
                         triplets_per_step=4096, seed=0)

    class _PreMined:
        def mine_triplets(self, **kw):
            cap = args.steps * 4096 if args.steps else len(triplets)
            return triplets[:cap]

    t0 = time.perf_counter()
    avg_loss = trainer.train_epoch(g, _PreMined(), poses, desc)
    t_epoch = time.perf_counter() - t0
    n_steps = -(-len(_PreMined().mine_triplets()) // 4096)
    # second epoch = steady state (no compile)
    t0 = time.perf_counter()
    trainer.epoch = 1
    avg_loss = trainer.train_epoch(g, _PreMined(), poses, desc)
    t_epoch2 = time.perf_counter() - t0
    print(f"epoch: {n_steps} steps x 4096 triplets on the {n}-node graph; "
          f"first epoch {t_epoch:.1f} s (incl. compile), steady epoch "
          f"{t_epoch2:.1f} s = {1e3*t_epoch2/n_steps:.1f} ms/step, "
          f"avg loss {avg_loss:.4f}")

    from neural_spectral_codec_tpu.evaluation import (
        evaluate_place_recognition)
    emb = trainer.embed(g)
    t0 = time.perf_counter()
    m = evaluate_place_recognition(np.asarray(emb), poses, (1, 5, 10),
                                   distance_threshold=5.0, skip_frames=30)
    t_val = time.perf_counter() - t0
    print("validation recall (GNN embeddings): "
          + "  ".join(f"R@{k} {m[f'recall@{k}']:.4f}" for k in (1, 5, 10))
          + f"  ({m['n_queries']} queries, {t_val:.1f} s, one pass "
          "over all revisit queries)")
    m_raw = evaluate_place_recognition(desc, poses, (1,),
                                       distance_threshold=5.0,
                                       skip_frames=30)
    print(f"raw-descriptor R@1 for reference: {m_raw['recall@1']:.4f}")

    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if stats:
        print(f"device memory: peak {stats.get('peak_bytes_in_use', 0)/2**30:.2f} GiB"
              f" / limit {stats.get('bytes_limit', 0)/2**30:.2f} GiB")

    if args.json:
        import json
        artifact = {
            "backend": jax.default_backend(),
            "nodes": n,
            "graph_build_s": round(t_graph, 3),
            "mining_s": round(t_mine, 2) if t_mine is not None else None,
            "n_triplets": int(len(triplets)),
            "epoch_steps": int(n_steps),
            "first_epoch_s": round(t_epoch, 2),
            "steady_epoch_s": round(t_epoch2, 2),
            "ms_per_step": round(1e3 * t_epoch2 / n_steps, 1),
            "avg_loss": round(float(avg_loss), 5),
            "validation_s": round(t_val, 2),
            "n_queries": int(m["n_queries"]),
            "recall": {f"@{k}": round(m[f"recall@{k}"], 4)
                       for k in (1, 5, 10)},
            "raw_descriptor_recall@1": round(m_raw["recall@1"], 4),
            "peak_device_gib": round(
                stats.get("peak_bytes_in_use", 0) / 2**30, 2) if stats
            else None,
        }
        Path(args.json).write_text(json.dumps(artifact, indent=2))
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
