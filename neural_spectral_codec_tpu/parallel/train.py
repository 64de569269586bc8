"""Sharded GNN training step.

Replaces the reference's ``nn.DataParallel`` (trainer.py:106-108 — its only
parallelism, disabled in its own main recipe) with SPMD over a
``jax.sharding.Mesh``:

  * **DP** — the triplet batch's leading axis is sharded over ``data``;
    parameters / optimizer state are replicated; the masked-mean triplet
    loss makes XLA's SPMD partitioner insert the gradient ``psum``
    automatically (no hand-written collectives, they ride ICI).
  * **Node sharding (SP analog)** — optionally the keyframe graph's node
    axis is sharded too: each chip owns a contiguous temporal slab of
    nodes. The GAT's neighbor gather (``jnp.take`` along the node axis)
    and the triplet row gathers are planned by XLA as collectives; the
    graph's ±(M//2) temporal edges only reach across slab boundaries for a
    halo of M//2 nodes, which XLA lowers to neighbor exchanges.

Shapes must divide the mesh: use ``pad_to_multiple`` on triplet batches
(mask-padded, loss unaffected) and on the node axis (isolated padding nodes
with self-loop-only attention, gradients exactly zero through the masked
loss).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from neural_spectral_codec_tpu.models.gnn import SpectralGNN
from neural_spectral_codec_tpu.training.loss import triplet_loss


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0,
                    fill=0) -> Tuple[np.ndarray, np.ndarray]:
    """Pad ``arr`` along ``axis`` to a multiple of ``multiple``. Returns
    (padded, valid_mask_along_axis)."""
    n = arr.shape[axis]
    target = -(-n // multiple) * multiple
    mask = np.zeros(target, bool)
    mask[:n] = True
    if target == n:
        return arr, mask
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, target - n)
    return np.pad(arr, widths, constant_values=fill), mask


def make_sharded_train_step(model: SpectralGNN,
                            optimizer: optax.GradientTransformation,
                            mesh: Mesh,
                            shard_nodes: bool = False,
                            normalize: bool = False) -> Callable:
    """Build a jitted SPMD train step over ``mesh``.

    Returns ``step(params, batch_stats, opt_state, features, neighbors,
    mask, edge_feats, anchor_idx, pos_idx, neg_idx, triplet_mask, margin,
    rng) -> (params, batch_stats, opt_state, loss)``.

    Triplet arrays must have leading dim divisible by the mesh size; with
    ``shard_nodes`` the node arrays must too. ``normalize`` must match the
    trainer's ``normalize_embeddings`` so the sharded and single-device
    paths optimize the same objective.
    """
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("data"))
    if shard_nodes:
        nodes1 = NamedSharding(mesh, P("data"))
        nodes2 = NamedSharding(mesh, P("data", None))
        nodes3 = NamedSharding(mesh, P("data", None, None))
    else:
        nodes1 = nodes2 = nodes3 = repl

    def _step(params, batch_stats, opt_state, features, neighbors, mask,
              edge_feats, anchor_idx, pos_idx, neg_idx, triplet_mask,
              margin, rng):
        def loss_fn(p):
            emb, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                features, neighbors, mask, edge_feats, train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            loss = triplet_loss(emb[anchor_idx], emb[pos_idx], emb[neg_idx],
                                margin=margin, mask=triplet_mask,
                                normalize=normalize)
            return loss, updates["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        upd, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, upd)
        return new_params, new_bs, new_opt_state, loss

    return jax.jit(
        _step,
        in_shardings=(repl, repl, repl,            # params/bs/opt_state
                      nodes2, nodes2, nodes2, nodes3,  # graph
                      dp, dp, dp, dp,              # triplets
                      None, None),                 # margin scalar, rng
        out_shardings=(repl, repl, repl, repl),
    )


def make_sharded_eval_step(model: SpectralGNN, mesh: Mesh,
                           shard_nodes: bool = True) -> Callable:
    """Jitted full-graph eval forward with an optionally node-sharded
    graph; embeddings come back sharded along nodes (ready for sharded
    retrieval / recall evaluation)."""
    repl = NamedSharding(mesh, P())
    if shard_nodes:
        nodes2 = NamedSharding(mesh, P("data", None))
        nodes3 = NamedSharding(mesh, P("data", None, None))
        out = nodes2
    else:
        nodes2 = nodes3 = out = repl

    @functools.partial(jax.jit,
                       in_shardings=(repl, repl, nodes2, nodes2, nodes2,
                                     nodes3),
                       out_shardings=out)
    def eval_step(params, batch_stats, features, neighbors, mask,
                  edge_feats):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           features, neighbors, mask, edge_feats,
                           train=False)

    return eval_step
