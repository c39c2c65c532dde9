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


def serve_state_spec(state) -> "jax.tree_util.PyTreeDef":
    """PartitionSpec tree for a stream-major ServeState: every array
    shards its leading (stream-major) axis over dp; scalars (num,
    coverage_ok) stay replicated."""
    return jax.tree.map(
        lambda a: P("dp") if getattr(a, "ndim", 0) >= 1 else P(), state)


def shard_serve_step(srv_local, mesh: Mesh):
    """SPMD multi-stream serving over the mesh (SURVEY §2.3: N streams
    x N chips, no collectives on the data path).

    ``srv_local`` is a MultiStreamServer built with the PER-DEVICE
    stream count; every ServeState table is stream-major by design, so
    the state of a GLOBAL ``MultiStreamServer(S_global)`` shards on
    axis 0 into exactly the local servers' layouts — the same fold that
    batches streams on one chip distributes them across chips.  The
    per-step exactness certificate is all-reduced so the carried
    ``coverage_ok`` stays replicated (the only cross-chip exchange, one
    bit per step).

    Returns ``step(params, batch_stats, state, pos_px, feat, valid) ->
    (state, raw, coverage_ok)`` jitted over the mesh.
    """
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map

    def local_step(params, batch_stats, state, pos_px, feat, valid):
        st, raw, info = srv_local.step(params, batch_stats, state,
                                       pos_px, feat, valid)
        bad = jax.lax.psum(
            (~st.coverage_ok).astype(jnp.int32), "dp")
        ok = bad == 0
        st = st.replace(coverage_ok=ok)
        return st, raw, ok

    def wrap(params, batch_stats, state, pos_px, feat, valid):
        spec = serve_state_spec(state)
        fn = shard_map(
            local_step, mesh=mesh,
            in_specs=(P(), P(), spec, P("dp"), P("dp"), P("dp")),
            out_specs=(spec, P("dp"), P()),
        )
        return fn(params, batch_stats, state, pos_px, feat, valid)

    return jax.jit(wrap)
