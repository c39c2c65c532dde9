"""Synthetic event/detection data for tests and benchmarks.

No reference counterpart (the reference has no test suite, SURVEY.md §4);
this fabricates structured event clouds + boxes so the full pipeline can
be exercised and overfit without DSEC/NCaltech data on disk.
"""
from __future__ import annotations

import numpy as np

from dagr_tpu.core.types import EventBatch


def random_events(
    rng: np.random.Generator,
    batch_size: int,
    num_nodes: int,
    width: int = 320,
    height: int = 240,
    time_window: int = 1_000_000,
    n_valid=None,
    clusters: int = 6,
) -> EventBatch:
    """Events drawn around a few spatial clusters (so graphs have real
    neighborhood structure), time-sorted, polarity in {0, 1}."""
    import jax.numpy as jnp

    pos = np.zeros((batch_size, num_nodes, 3), np.float32)
    feat = np.zeros((batch_size, num_nodes, 1), np.float32)
    mask = np.zeros((batch_size, num_nodes), bool)
    for b in range(batch_size):
        nv = n_valid if n_valid is not None else rng.integers(
            num_nodes // 2, num_nodes + 1
        )
        centers = rng.random((clusters, 2)) * [width * 0.8, height * 0.8] + [
            width * 0.1, height * 0.1]
        which = rng.integers(0, clusters, nv)
        xy = centers[which] + rng.normal(0, min(width, height) * 0.05, (nv, 2))
        x = np.clip(xy[:, 0], 0, width - 1).astype(int)
        y = np.clip(xy[:, 1], 0, height - 1).astype(int)
        t = np.sort(rng.integers(0, time_window, nv))
        pos[b, :nv, 0] = x / width
        pos[b, :nv, 1] = y / height
        pos[b, :nv, 2] = t / time_window
        feat[b, :nv, 0] = rng.integers(0, 2, nv)
        mask[b, :nv] = True
    return EventBatch(
        pos=jnp.asarray(pos), feat=jnp.asarray(feat), mask=jnp.asarray(mask),
        width=width, height=height, time_window=time_window,
    )


def random_targets(
    rng: np.random.Generator,
    batch_size: int,
    max_gt: int = 100,
    num_classes: int = 2,
    width: int = 320,
    height: int = 240,
    n_boxes: int = 3,
) -> np.ndarray:
    """[B, max_gt, 5] (class, cx, cy, w, h) pixel targets, zero-padded
    (format of convert_to_training_format, reference:
    src/dagr/model/utils.py:46-59)."""
    t = np.zeros((batch_size, max_gt, 5), np.float32)
    for b in range(batch_size):
        n = rng.integers(1, n_boxes + 1)
        for i in range(n):
            w = rng.uniform(0.1, 0.3) * width
            h = rng.uniform(0.1, 0.3) * height
            cx = rng.uniform(w / 2, width - w / 2)
            cy = rng.uniform(h / 2, height - h / 2)
            t[b, i] = [rng.integers(0, num_classes), cx, cy, w, h]
    return t
