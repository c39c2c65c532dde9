"""Train state, EMA, optimizer, and the jitted/shardable train step.

Reproduces the reference recipe exactly
(reference: scripts/train_dsec.py:42-75,146-155):
AdamW(lr = l_r * sqrt(batch/64), wd), elementwise grad clip at
``clip``, NaN-gradient scrub, YOLOX LR schedule, and a float-state EMA
with ramped decay (reference: src/dagr/model/networks/ema.py:25-51 —
note the reference EMAs the full float state_dict, i.e. parameters AND
batch-norm running stats, so we do too).

Data parallelism is new capability (the reference is single-GPU,
SURVEY.md §2.3): the same step function jits over a ``Mesh('dp')`` with
the batch sharded and state replicated; XLA inserts the gradient
all-reduce over ICI.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from dagr_tpu.config import DagrConfig
from dagr_tpu.models.dagr import DAGR, detection_loss
from dagr_tpu.train.lr_schedule import yolox_schedule


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    ema_stats: Any
    ema_updates: jnp.ndarray


def scrub_nan() -> optax.GradientTransformation:
    """nan -> 0 in gradients (reference: train_dsec.py:36-39,
    fix_gradients)."""

    def update_fn(updates, state, params=None):
        return jax.tree.map(
            lambda g: jnp.nan_to_num(g, nan=0.0), updates
        ), state

    return optax.GradientTransformation(lambda _: optax.EmptyState(), update_fn)


def make_optimizer(cfg: DagrConfig, num_iters_per_epoch: int,
                   frozen_paths: Tuple[str, ...] = ()):
    """AdamW with sqrt batch-size LR scaling and YOLOX schedule
    (reference: train_dsec.py:146-155).

    ``frozen_paths``: top-level param subtrees to freeze (zero
    updates) — the functional equivalent of init_subnetwork's
    requires_grad=False (reference: model/utils.py:9-23; the reference
    freezes the pretrained image trunk, dagr.py:32-35)."""
    lr = cfg.l_r * math.sqrt(cfg.batch_size / 64.0)
    sched = yolox_schedule(lr, num_iters_per_epoch, cfg.tot_num_epochs)
    tx = optax.chain(
        scrub_nan(),
        optax.clip(cfg.clip),           # elementwise, like clip_grad_value_
        optax.adamw(sched, weight_decay=cfg.weight_decay),
    )
    if frozen_paths:
        def label(params):
            return {
                k: ("frozen" if k in frozen_paths else "train")
                for k in params
            }

        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label)
    return tx, sched


def ema_decay(updates, base: float = 0.9999):
    """Ramped decay d = base * (1 - exp(-n / 2000))
    (reference: ema.py:36)."""
    return base * (1.0 - jnp.exp(-updates / 2000.0))


def ema_update(ema_tree, new_tree, d):
    return jax.tree.map(lambda e, p: e * d + (1.0 - d) * p, ema_tree, new_tree)


def init_state(
    model: DAGR, cfg: DagrConfig, tx, rng, sample_events,
    sample_image=None,
) -> TrainState:
    variables = model.init(rng, sample_events, image=sample_image,
                           train=False)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=bstats,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params),
        ema_stats=jax.tree.map(jnp.copy, bstats),
        ema_updates=jnp.zeros((), jnp.float32),
    )


def make_train_step(
    model: DAGR, cfg: DagrConfig, tx, height: int
) -> Callable[[TrainState, Any, jnp.ndarray], Tuple[TrainState, Dict]]:
    """One optimization step (reference: train_dsec.py:42-75)."""

    def step(state: TrainState, events, targets):
        def loss_fn(p):
            raw, new_vars = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                events, train=True, mutable=["batch_stats"],
            )
            losses = detection_loss(raw, targets, cfg, height)
            return losses["total_loss"], (losses, new_vars["batch_stats"])

        grads, (losses, bstats) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        n = state.ema_updates + 1.0
        d = ema_decay(n)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=bstats,
            opt_state=opt_state,
            ema_params=ema_update(state.ema_params, params, d),
            ema_stats=ema_update(state.ema_stats, bstats, d),
            ema_updates=n,
        )
        return new_state, losses

    return step


def make_train_step_fusion(
    model: DAGR, cfg: DagrConfig, tx, height: int,
    pretrain_cnn: bool = False,
):
    """Train step for event+image fusion: dual loss on (targets0,
    targets) (reference: train path dagr.py:74-88 with use_image)."""
    from dagr_tpu.models.dagr import detection_loss_fusion

    def step(state: TrainState, events, images, targets, targets0):
        def loss_fn(p):
            (raw, raw_img), new_vars = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                events, image=images, train=True, mutable=["batch_stats"],
            )
            losses = detection_loss_fusion(
                raw, raw_img, targets, targets0, cfg, height,
                pretrain_cnn=pretrain_cnn,
            )
            return losses["total_loss"], (losses, new_vars["batch_stats"])

        grads, (losses, bstats) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        n = state.ema_updates + 1.0
        d = ema_decay(n)
        new_state = state.replace(
            step=state.step + 1, params=params, batch_stats=bstats,
            opt_state=opt_state,
            ema_params=ema_update(state.ema_params, params, d),
            ema_stats=ema_update(state.ema_stats, bstats, d),
            ema_updates=n,
        )
        return new_state, losses

    return step


def make_eval_forward(model: DAGR, use_ema: bool = True):
    """Eval-mode forward on EMA weights (reference eval scripts load
    the 'ema' entry of the checkpoint, run_test.py:57-58)."""

    def forward(state: TrainState, events):
        params = state.ema_params if use_ema else state.params
        stats = state.ema_stats if use_ema else state.batch_stats
        return model.apply(
            {"params": params, "batch_stats": stats}, events, train=False
        )

    return forward
