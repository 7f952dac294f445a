"""Training loop pieces: optimizer/schedule builders + jitted train step.

Mirrors the reference builders (reference: utils/build_util.py ->
build_optim / build_lr_scheduler; main.py -> train()) with optax, and keeps
BatchNorm running statistics in a ``batch_stats`` collection alongside the
optax state.  Multi-chip data parallelism shards the batch axis via pjit —
the step function itself contains no collectives (MaskedBatchNorm takes
``axis_name`` when used under shard_map; under pjit, XLA inserts the psums).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mmmot_tpu.config import TrainConfig
from mmmot_tpu.models.tracking_net import TrackingNet
from mmmot_tpu.train.losses import tracking_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, opt_state = self.tx.update(grads, self.opt_state,
                                            self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=params,
                            batch_stats=new_batch_stats,
                            opt_state=opt_state)


def build_schedule(cfg: TrainConfig, steps_per_epoch: int):
    """LR schedule: step decay / cosine / constant, with linear warmup."""
    base = cfg.lr
    total = max(cfg.epochs * steps_per_epoch, 1)
    if cfg.lr_schedule == "step":
        boundaries = {e * steps_per_epoch: cfg.lr_decay_rate
                      for e in cfg.lr_decay_epochs}
        sched = optax.piecewise_constant_schedule(base, boundaries)
    elif cfg.lr_schedule == "cosine":
        sched = optax.cosine_decay_schedule(base, total)
    elif cfg.lr_schedule == "constant":
        sched = optax.constant_schedule(base)
    else:
        raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")
    if cfg.warmup_steps > 0:
        warm = optax.linear_schedule(0.0, base, cfg.warmup_steps)
        sched = optax.join_schedules([warm, sched], [cfg.warmup_steps])
    return sched


def build_optimizer(cfg: TrainConfig, steps_per_epoch: int = 1000
                    ) -> optax.GradientTransformation:
    sched = build_schedule(cfg, steps_per_epoch)
    if cfg.optimizer == "adam":
        opt = optax.adamw(sched, weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "sgd":
        opt = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(sched, momentum=cfg.momentum),
        )
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    if cfg.grad_clip > 0:
        opt = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), opt)
    return opt


def create_train_state(net: TrackingNet, cfg: TrainConfig, rng,
                       sample_batch: Dict[str, jnp.ndarray],
                       steps_per_epoch: int = 1000) -> TrainState:
    variables = net.init({"params": rng}, sample_batch, train=False)
    tx = build_optimizer(cfg, steps_per_epoch)
    return TrainState(
        step=jnp.int32(0),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )


def train_step(net: TrackingNet, state: TrainState,
               batch: Dict[str, jnp.ndarray], dropout_rng,
               loss_weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0),
               compact_capacity: int = 0
               ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimization step (jit/pjit this).  Returns (state', metrics).

    ``compact_capacity`` > 0 enables compact-first feature extraction in
    the forward (conv FLOPs only on valid detections — KITTI batches are
    ~75% padding); dropped overflow detections are masked out of the loss.
    """

    def loss_fn(params):
        outputs, mutated = net.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch, train=True, mutable=["batch_stats"],
            rngs={"dropout": dropout_rng},
            compact_capacity=compact_capacity)
        loss, metrics = tracking_loss(outputs, batch, loss_weights)
        return loss, (metrics, mutated["batch_stats"])

    (loss, (metrics, new_bs)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    metrics["grad_norm"] = optax.global_norm(grads)
    return state.apply_gradients(grads, new_bs), metrics


def eval_forward(net: TrackingNet, state: TrainState,
                 batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    return net.apply({"params": state.params,
                      "batch_stats": state.batch_stats},
                     batch, train=False)
