"""Device-mesh data parallelism.

New, idiomatic TPU capability — the reference is strictly single-GPU
(SURVEY.md §2.3: no DDP/NCCL/MPI anywhere).  Training shards the batch
over a 1-D ``dp`` mesh; parameters and optimizer state are replicated
and XLA inserts the gradient all-reduce over ICI.  Streaming inference
is embarrassingly parallel per chip (each chip owns an event stream),
so it needs no collectives at all.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    return Mesh(np.asarray(devices[:n]), ("dp",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over dp; applied to every leaf of a batch
    pytree (EventBatch / target arrays)."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_train_step(step_fn, mesh: Mesh):
    """jit the train step with batch sharded, state replicated."""
    rep, bsh = replicated(mesh), batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, bsh, bsh),
        out_shardings=(rep, rep),
    )


def shard_eval_forward(fwd_fn, mesh: Mesh):
    rep, bsh = replicated(mesh), batch_sharding(mesh)
    return jax.jit(fwd_fn, in_shardings=(rep, bsh), out_shardings=bsh)


def put_batch(tree, mesh: Mesh):
    return jax.device_put(tree, batch_sharding(mesh))


def put_replicated(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))
