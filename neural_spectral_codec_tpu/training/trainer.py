"""GNN trainer: jitted full-graph train step with triplet loss.

Reference training loop (/root/reference/src/gnn/trainer.py:71-516):
  * per epoch: re-mine triplets, shuffle, batches of 1024 with 4-step
    gradient accumulation → one Adam step per 4096 triplets; the FULL graph
    forward runs once per 1024-batch (:194-231)
  * Adam lr 5e-4, weight_decay 1e-5 (L2-in-gradient, torch semantics)
  * validation = loop-closure Recall@{1,5,10}; best/periodic/final
    checkpoints; early stopping patience 10

TPU redesign: the 4 × (full forward + 1024-triplet loss) accumulation is
mathematically one 4096-triplet step (mean of equal-sized batch means ==
mean over the union; grads add linearly), so each optimizer step runs ONE
jitted program: full-graph forward (train mode), gather a/p/n rows, masked
triplet loss, grads, Adam update — 4× fewer graph forwards than the
reference with identical expected gradients. Padding + masks keep the
triplet batch a fixed shape across steps. BatchNorm batch statistics are
updated once per step instead of 4 times (documented divergence; the
statistics are over the same full node set either way).

Checkpointing via Orbax: params, batch_stats, optimizer state, step,
metric history.
"""

from __future__ import annotations

import functools
import logging
import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neural_spectral_codec_tpu.keyframe.graph import KeyframeGraph
from neural_spectral_codec_tpu.models.gnn import SpectralGNN, init_gnn
from neural_spectral_codec_tpu.training.loss import triplet_loss
from neural_spectral_codec_tpu.training.miner import TripletMiner, create_triplet_miner
from neural_spectral_codec_tpu.training.validation import recall_loop_closure

logger = logging.getLogger(__name__)


def make_optimizer(learning_rate: float = 5e-4, weight_decay: float = 1e-5,
                   grad_clip: Optional[float] = 1.0,
                   injectable_lr: bool = False) -> optax.GradientTransformation:
    """Adam with L2-in-gradient weight decay (torch ``Adam(weight_decay=)``
    semantics, NOT decoupled AdamW) and optional global-norm clipping
    (configs/training.yaml:28).

    ``injectable_lr`` wraps the chain in ``optax.inject_hyperparams`` so
    the learning rate lives in the optimizer STATE and can be decayed at
    epoch boundaries without recompiling the train step — the step-decay
    schedule the reference configures (training.yaml:16-19) but never
    implements."""

    def build(learning_rate):
        parts = []
        if grad_clip:
            parts.append(optax.clip_by_global_norm(grad_clip))
        parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.adam(learning_rate))
        return optax.chain(*parts)

    if injectable_lr:
        return optax.inject_hyperparams(build)(learning_rate=learning_rate)
    return build(learning_rate)


@functools.partial(jax.jit,
                   static_argnames=("model", "optimizer", "normalize"))
def train_step(model: SpectralGNN, optimizer, params, batch_stats, opt_state,
               features, neighbors, mask, edge_feats,
               anchor_idx, pos_idx, neg_idx, triplet_mask, margin, rng,
               normalize: bool = False):
    """One optimizer step: full-graph forward + masked triplet loss."""

    def loss_fn(p):
        emb, updates = model.apply(
            {"params": p, "batch_stats": batch_stats},
            features, neighbors, mask, edge_feats, train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        loss = triplet_loss(emb[anchor_idx], emb[pos_idx], emb[neg_idx],
                            margin=margin, mask=triplet_mask,
                            normalize=normalize)
        return loss, updates["batch_stats"]

    (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    upd, new_opt_state = optimizer.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, upd)
    return new_params, new_bs, new_opt_state, loss


class GNNTrainer:
    def __init__(self, model: Optional[SpectralGNN] = None,
                 learning_rate: float = 5e-4, weight_decay: float = 1e-5,
                 margin: float = 0.1, grad_clip: Optional[float] = 1.0,
                 checkpoint_dir: str = "checkpoints", log_interval: int = 10,
                 patience: int = 10, triplets_per_step: int = 4096,
                 seed: int = 0, mesh=None, shard_nodes: bool = False,
                 lr_decay_epochs: Optional[List[int]] = None,
                 lr_decay_factor: float = 0.1, min_lr: float = 1e-6,
                 normalize_embeddings: bool = False):
        """``mesh``: a ``jax.sharding.Mesh`` enables SPMD training — the
        triplet batch is sharded over the mesh's ``data`` axis (gradient
        psum inserted by the partitioner) and, with ``shard_nodes``, the
        keyframe-graph node axis too. Replaces the reference's
        ``nn.DataParallel`` (trainer.py:106-108).

        ``lr_decay_epochs``: epochs at which lr ×= ``lr_decay_factor``
        (floored at ``min_lr``) — the step schedule of
        configs/training.yaml, which the reference declared but never
        wired up."""
        self.model = model or SpectralGNN()
        self.margin = margin
        # L2-normalized metric learning (off by default: reference parity)
        self.normalize_embeddings = normalize_embeddings
        self.lr_decay_epochs = set(lr_decay_epochs or [])
        self.lr_decay_factor = lr_decay_factor
        self.min_lr = min_lr
        self.current_lr = learning_rate
        self.optimizer = make_optimizer(
            learning_rate, weight_decay, grad_clip,
            injectable_lr=bool(self.lr_decay_epochs))
        self._rng = jax.random.key(seed)
        self.params, self.batch_stats = init_gnn(self.model, self._next_rng())
        self.opt_state = self.optimizer.init(self.params)
        self.mesh = mesh
        self._divisor = 1
        if mesh is not None:
            from neural_spectral_codec_tpu.parallel.train import (
                make_sharded_eval_step, make_sharded_train_step)
            self._sharded_step = make_sharded_train_step(
                self.model, self.optimizer, mesh, shard_nodes=shard_nodes,
                normalize=self.normalize_embeddings)
            # mesh-aware offline validation/embedding pass (VERDICT r4
            # #8): node-sharded full-graph eval forward; recall chunks
            # shard their query axis in validate()
            self._sharded_eval = make_sharded_eval_step(
                self.model, mesh, shard_nodes=shard_nodes)
            self._divisor = int(np.prod(list(mesh.shape.values())))
            if shard_nodes:
                logger.info("SPMD training over %d devices (nodes sharded)",
                            self._divisor)
            else:
                logger.info("SPMD data-parallel training over %d devices",
                            self._divisor)

        self.checkpoint_dir = Path(checkpoint_dir)
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
        self.log_interval = log_interval
        self.patience = patience
        self.triplets_per_step = triplets_per_step

        self.epoch = 0
        self.global_step = 0
        self.best_val_metric = 0.0
        self.epochs_without_improvement = 0
        self.train_losses: List[float] = []
        self.val_metrics: List[Dict] = []
        # machine-readable per-epoch metrics stream (the reference carried
        # wandb config keys but no logging implementation — SURVEY §5.5)
        self.metrics_path = self.checkpoint_dir / "metrics.jsonl"

    def _log_metrics(self, record: Dict) -> None:
        import json
        record = {"epoch": self.epoch, "global_step": self.global_step,
                  "time": time.time(), **record}
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    # ------------------------------------------------------------------

    def _graph_device(self, graph: KeyframeGraph):
        return (jnp.asarray(graph.features), jnp.asarray(graph.neighbors),
                jnp.asarray(graph.mask), jnp.asarray(graph.edge_feats))

    def train_epoch(self, graph: KeyframeGraph, triplet_miner: TripletMiner,
                    poses: np.ndarray, descriptors: np.ndarray,
                    sequence_ids: Optional[np.ndarray] = None,
                    n_triplets_per_anchor: int = 1) -> float:
        t0 = time.perf_counter()
        triplets = triplet_miner.mine_triplets(
            descriptors=descriptors, poses=poses,
            n_triplets_per_anchor=n_triplets_per_anchor,
            sequence_ids=sequence_ids)
        if len(triplets) == 0:
            logger.warning("No valid triplets mined!")
            # record the epoch anyway: checkpoints serialize the loss
            # history and orbax rejects zero-size arrays
            self.train_losses.append(0.0)
            return 0.0
        logger.info("Mined %d triplets in %.2fs", len(triplets),
                    time.perf_counter() - t0)

        perm = np.random.default_rng(self.epoch).permutation(len(triplets))
        triplets = triplets[perm]

        dev_graph = self._graph_device(graph)
        # batch size padded so every step (and every device shard) is full
        B = -(-self.triplets_per_step // self._divisor) * self._divisor
        n_steps = -(-len(triplets) // B)
        pad = n_steps * B - len(triplets)
        tmask = np.ones(len(triplets), bool)
        if pad:
            triplets = np.concatenate([triplets, np.zeros((pad, 3), np.int64)])
            tmask = np.concatenate([tmask, np.zeros(pad, bool)])

        if self.mesh is not None:
            step_fn = self._sharded_step
        else:
            step_fn = functools.partial(train_step, self.model,
                                        self.optimizer,
                                        normalize=self.normalize_embeddings)
        losses = []
        for s in range(n_steps):
            sl = slice(s * B, (s + 1) * B)
            batch = triplets[sl]
            self.params, self.batch_stats, self.opt_state, loss = step_fn(
                self.params, self.batch_stats,
                self.opt_state, *dev_graph,
                jnp.asarray(batch[:, 0]), jnp.asarray(batch[:, 1]),
                jnp.asarray(batch[:, 2]), jnp.asarray(tmask[sl]),
                self.margin, self._next_rng())
            self.global_step += 1
            losses.append(loss)
            if self.global_step % self.log_interval == 0:
                logger.info("Epoch %d | Step %d/%d | Loss: %.4f",
                            self.epoch + 1, s + 1, n_steps, float(loss))
        avg = float(np.mean([float(l) for l in losses]))
        self.train_losses.append(avg)
        return avg

    # ------------------------------------------------------------------

    def embed(self, graph: KeyframeGraph) -> np.ndarray:
        if self.mesh is not None:
            # node-sharded eval forward: pad the node axis to the mesh
            # size with isolated nodes (self-loop-only attention, exact
            # for real nodes in eval mode), run the SPMD executable,
            # slice the padding back off
            from neural_spectral_codec_tpu.keyframe.graph import pad_graph
            import jax.numpy as jnp
            n = graph.n_nodes
            target = -(-n // self._divisor) * self._divisor
            g = pad_graph(graph, target)
            emb = np.asarray(self._sharded_eval(
                self.params, self.batch_stats,
                jnp.asarray(g.features), jnp.asarray(g.neighbors),
                jnp.asarray(g.mask), jnp.asarray(g.edge_feats)))[:n]
        else:
            from neural_spectral_codec_tpu.models.gnn import gnn_forward
            emb = np.asarray(gnn_forward(self.model, self.params,
                                         self.batch_stats, graph))
        if self.normalize_embeddings:
            emb = emb / np.maximum(
                np.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        return emb

    def validate(self, val_graph: KeyframeGraph, val_poses: np.ndarray,
                 distance_threshold: float = 5.0,
                 skip_frames: int = 30,
                 ks=(1, 5, 10)) -> Dict[str, float]:
        emb = self.embed(val_graph)
        metrics = {}
        ks = tuple(ks)
        if 1 not in ks:           # R@1 drives best-checkpoint/early-stop
            ks = (1,) + ks
        for k in sorted(ks):
            r, nq = recall_loop_closure(emb, val_poses, k,
                                        distance_threshold, skip_frames,
                                        mesh=self.mesh)
            metrics[f"recall@{k}"] = r
            metrics["n_queries"] = nq
        logger.info("Validation | %s | Q=%d",
                    " | ".join(f"R@{k} {metrics[f'recall@{k}']:.4f}"
                               for k in sorted(ks)),
                    metrics["n_queries"])
        return metrics

    # ------------------------------------------------------------------

    def train(self, train_graph: KeyframeGraph, train_poses: np.ndarray,
              train_descriptors: np.ndarray,
              train_sequence_ids: Optional[np.ndarray] = None,
              val_graph: Optional[KeyframeGraph] = None,
              val_poses: Optional[np.ndarray] = None,
              n_epochs: int = 50,
              triplet_miner: Optional[TripletMiner] = None,
              early_stopping: bool = True,
              n_triplets_per_anchor: int = 1,
              recall_ks=(1, 5, 10),
              save_best: bool = True, save_last: bool = True,
              save_every_epochs: int = 10) -> None:
        """Config-surface knobs (training.yaml): ``early_stopping``
        toggles the patience-based stop; ``n_triplets_per_anchor`` is the
        triplet block's n_negatives_per_anchor; ``recall_ks`` the
        validation block's recall_k_values; save_* the checkpoint
        block."""
        if triplet_miner is None:
            triplet_miner = create_triplet_miner()
        logger.info("Training for %d epochs on %d-node graph",
                    n_epochs, train_graph.n_nodes)
        t_start = time.perf_counter()
        for epoch in range(n_epochs):
            self.epoch = epoch
            if epoch in self.lr_decay_epochs:
                self.current_lr = max(self.current_lr * self.lr_decay_factor,
                                      self.min_lr)
                self.opt_state.hyperparams["learning_rate"] = jnp.asarray(
                    self.current_lr, jnp.float32)
                logger.info("Epoch %d: learning rate -> %.2e", epoch + 1,
                            self.current_lr)
            t0 = time.perf_counter()
            avg_loss = self.train_epoch(
                train_graph, triplet_miner, train_poses, train_descriptors,
                sequence_ids=train_sequence_ids,
                n_triplets_per_anchor=n_triplets_per_anchor)
            self._log_metrics({"train_loss": avg_loss, "lr": self.current_lr,
                               "epoch_seconds": time.perf_counter() - t0})
            if val_graph is not None and val_poses is not None:
                metrics = self.validate(val_graph, val_poses, ks=recall_ks)
                self.val_metrics.append(metrics)
                self._log_metrics(dict(metrics))
                logger.info("Epoch %d/%d | Loss %.4f | R@1 %.4f | %.1fs",
                            epoch + 1, n_epochs, avg_loss,
                            metrics["recall@1"], time.perf_counter() - t0)
                if metrics["recall@1"] > self.best_val_metric:
                    self.best_val_metric = metrics["recall@1"]
                    if save_best:
                        self.save_checkpoint("best_model")
                    self.epochs_without_improvement = 0
                else:
                    self.epochs_without_improvement += 1
                if early_stopping and \
                        self.epochs_without_improvement >= self.patience:
                    logger.info("Early stopping after %d stale epochs "
                                "(best R@1 %.4f)", self.patience,
                                self.best_val_metric)
                    break
            else:
                logger.info("Epoch %d/%d | Loss %.4f | %.1fs",
                            epoch + 1, n_epochs, avg_loss,
                            time.perf_counter() - t0)
            if save_every_epochs and (epoch + 1) % save_every_epochs == 0:
                self.save_checkpoint(f"checkpoint_epoch_{epoch + 1}")
        if save_last:
            self.save_checkpoint("final_model")
        logger.info("Training complete in %.1fs | best R@1 %.4f",
                    time.perf_counter() - t_start, self.best_val_metric)

    # ------------------------------------------------------------------

    def save_checkpoint(self, name: str) -> None:
        import orbax.checkpoint as ocp
        path = (self.checkpoint_dir / name).absolute()
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "opt_state": self.opt_state,
            "meta": {
                "epoch": self.epoch,
                "global_step": self.global_step,
                "best_val_metric": self.best_val_metric,
                "epochs_without_improvement": self.epochs_without_improvement,
                "train_losses": np.asarray(self.train_losses, np.float32),
            },
        }, force=True)
        logger.info("Saved checkpoint: %s", path)

    def load_checkpoint(self, name: str) -> None:
        import orbax.checkpoint as ocp
        path = (self.checkpoint_dir / name).absolute()
        if not path.exists():
            raise FileNotFoundError(f"Checkpoint not found: {path}")
        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(path, item={
            "params": self.params,
            "batch_stats": self.batch_stats,
            "opt_state": self.opt_state,
            "meta": {
                "epoch": 0, "global_step": 0, "best_val_metric": 0.0,
                "epochs_without_improvement": 0,
                "train_losses": np.zeros(0, np.float32),
            },
        })
        self.params = restored["params"]
        self.batch_stats = restored["batch_stats"]
        self.opt_state = restored["opt_state"]
        meta = restored["meta"]
        self.epoch = int(meta["epoch"])
        self.global_step = int(meta["global_step"])
        self.best_val_metric = float(meta["best_val_metric"])
        self.epochs_without_improvement = int(meta["epochs_without_improvement"])
        self.train_losses = list(np.asarray(meta["train_losses"]))
        logger.info("Loaded checkpoint: %s (epoch %d, best R@1 %.4f)",
                    path, self.epoch, self.best_val_metric)


def create_trainer(model: Optional[SpectralGNN] = None, **kwargs) -> GNNTrainer:
    """Factory (reference trainer.py:519-538)."""
    return GNNTrainer(model=model, **kwargs)
