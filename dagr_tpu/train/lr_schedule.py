"""YOLOX-style LR schedule: quadratic warmup + cosine + step reductions.

Jittable reimplementation of the reference schedule
(reference: src/dagr/utils/learning_rate_scheduler.py:27-47), usable as
an optax schedule.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def yolox_schedule(
    base_lr: float,
    num_iters_per_epoch: int,
    tot_num_epochs: int,
    warmup_epochs: float = 0.3,
    min_lr_ratio: float = 0.05,
    warmup_lr_start: float = 0.0,
    steps_at_iteration: Sequence[int] = (50_000,),
    reduction_at_step: float = 0.5,
):
    warmup_iters = num_iters_per_epoch * warmup_epochs
    total_iters = tot_num_epochs * num_iters_per_epoch

    def schedule(it):
        it = jnp.asarray(it, jnp.float32)
        warm = (1.0 - warmup_lr_start) * (
            it / jnp.maximum(warmup_iters, 1e-9)
        ) ** 2 + warmup_lr_start
        cos = min_lr_ratio + 0.5 * (1.0 - min_lr_ratio) * (
            1.0 + jnp.cos(
                jnp.pi * (it - warmup_iters)
                / max(total_iters - warmup_iters, 1e-9)
            )
        )
        lr = jnp.where(it < warmup_iters, warm, cos)
        for s in steps_at_iteration:
            lr = lr * jnp.where(it >= s, reduction_at_step, 1.0)
        return base_lr * lr

    return schedule
