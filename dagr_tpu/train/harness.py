"""Shared train/eval harness used by the CLI scripts.

Mirrors the reference's script-level loops
(reference: scripts/train_dsec.py:42-100, utils/testing.py:16-55).
"""
from __future__ import annotations

import time
from typing import Optional

import jax
import numpy as np

from dagr_tpu.config import DagrConfig
from dagr_tpu.eval.buffers import DetectionBuffer, detections_to_list, targets_to_list
from dagr_tpu.models.dagr import DAGR, detect
from dagr_tpu.train.state import TrainState, make_eval_forward
from dagr_tpu.utils.logging import MetricLogger


def run_test(
    loader,
    model: DAGR,
    state: TrainState,
    cfg: DagrConfig,
    height: int,
    width: int,
    classes,
    dry_run_steps: int = -1,
    use_ema: bool = True,
    compile_detections: bool = False,
):
    """Sync evaluation pass -> DetectionBuffer (reference:
    train_dsec.py:77-100 run_test).  Returns (buffer, detections list)."""
    fwd = jax.jit(make_eval_forward(model, use_ema=use_ema))
    buf = DetectionBuffer(height=height, width=width, classes=classes)
    compiled = []
    for i, batch in enumerate(loader):
        events, targets = batch[0], batch[1]
        images = batch[2] if len(batch) > 2 else None
        if cfg.use_image and images is not None:
            params = state.ema_params if use_ema else state.params
            stats = state.ema_stats if use_ema else state.batch_stats
            raw = model.apply(
                {"params": params, "batch_stats": stats},
                events, image=images, train=False,
            )
            raw = raw[0] if isinstance(raw, tuple) else raw
        else:
            raw = fwd(state, events)
        dets = detect(raw, cfg, height, width)
        det_list = detections_to_list({k: np.asarray(v) for k, v in dets.items()})
        tgt_list = targets_to_list(np.asarray(targets))
        buf.update(det_list, tgt_list)
        if compile_detections:
            compiled.extend(det_list)
        if 0 < dry_run_steps <= i:
            break
    return buf, compiled


def train_epoch(
    loader,
    state: TrainState,
    step_fn,
    logger: Optional[MetricLogger] = None,
    use_image: bool = False,
    log_every: int = 10,
):
    """One training epoch (reference: train_dsec.py:42-75)."""
    losses = None
    for i, batch in enumerate(loader):
        if use_image:
            events, targets, images, targets0 = batch
            state, losses = step_fn(state, events, images, targets, targets0)
        else:
            events, targets = batch[0], batch[1]
            state, losses = step_fn(state, events, targets)
        if logger is not None and i % log_every == 0:
            logger.log(
                {f"training/loss/{k}": float(v) for k, v in losses.items()},
                step=int(state.step),
            )
    return state, losses
