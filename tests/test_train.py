"""Training-step tests: recipe components + data-parallel sharding on
the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from dagr_tpu.config import DagrConfig
from dagr_tpu.data.synthetic import random_events, random_targets
from dagr_tpu.models.dagr import DAGR
from dagr_tpu.parallel.mesh import (
    make_mesh, put_batch, put_replicated, shard_eval_forward,
    shard_train_step,
)
from dagr_tpu.train.lr_schedule import yolox_schedule
from dagr_tpu.train.state import init_state, make_optimizer, make_train_step

W, H = 64, 48
CFG = DagrConfig(
    n_nodes=128, max_neighbors=8, batch_size=8, node_chunk=256, radius=0.05,
)


def test_lr_schedule_matches_reference_shape():
    # reference: learning_rate_scheduler.py:27-47
    s = yolox_schedule(1.0, num_iters_per_epoch=100, tot_num_epochs=10,
                       warmup_epochs=0.3, steps_at_iteration=())
    assert float(s(0)) == 0.0
    # quadratic warmup: half way -> 0.25
    np.testing.assert_allclose(float(s(15)), 0.25, rtol=1e-6)
    np.testing.assert_allclose(float(s(30)), 1.0, rtol=1e-5)
    # cosine end -> min_lr_ratio
    np.testing.assert_allclose(float(s(1000)), 0.05, rtol=1e-4)


def test_train_step_runs_and_ema_moves():
    model = DAGR(CFG, height=H, width=W)
    rng = np.random.default_rng(0)
    ev = random_events(rng, CFG.batch_size, CFG.n_nodes, width=W, height=H)
    tgt = jnp.asarray(random_targets(rng, CFG.batch_size, width=W, height=H))
    tx, _ = make_optimizer(CFG, num_iters_per_epoch=10)
    state = init_state(model, CFG, tx, jax.random.key(0), ev)
    step = jax.jit(make_train_step(model, CFG, tx, H))

    p0 = jax.tree.leaves(state.params)[0].copy()
    state, losses = step(state, ev, tgt)   # lr(0) = 0 (quadratic warmup)
    assert bool(jnp.isfinite(losses["total_loss"]))
    assert int(state.step) == 1
    state, losses = step(state, ev, tgt)   # lr(1) > 0 -> params move
    assert not np.allclose(np.asarray(jax.tree.leaves(state.params)[0]), np.asarray(p0))
    # EMA follows the params with d = 0.9999*(1-exp(-n/2000)) ~ tiny -> ema ~ params
    diff = jax.tree.map(
        lambda e, p: float(jnp.abs(e - p).max()),
        state.ema_params, state.params,
    )
    assert max(jax.tree.leaves(diff)) < 1e-2


def test_frozen_subtree_gets_zero_updates():
    """frozen_paths freezes a top-level param subtree (the reference's
    init_subnetwork freeze, model/utils.py:9-23)."""
    import optax

    from dagr_tpu.train.state import make_optimizer

    params = {"backbone": {"w": jnp.ones(3)}, "cnn": {"w": jnp.ones(3)}}
    grads = jax.tree.map(jnp.ones_like, params)
    tx, _ = make_optimizer(CFG, 10, frozen_paths=("cnn",))
    st = tx.init(params)
    updates, _ = tx.update(grads, st, params)
    assert float(jnp.abs(updates["cnn"]["w"]).max()) == 0.0
    # other subtree still gets (possibly zero-lr at step 0) adam state;
    # second step has lr > 0
    updates, st2 = tx.update(grads, tx.init(params), params)
    p2 = optax.apply_updates(params, updates)
    updates2, _ = tx.update(grads, st2, p2)
    assert float(jnp.abs(updates2["backbone"]["w"]).max()) > 0.0
    assert float(jnp.abs(updates2["cnn"]["w"]).max()) == 0.0


def test_dp_sharded_eval_forward_matches_single_device():
    """Batch-sharded eval/serving forward (shard_eval_forward) must
    equal the single-device forward — multi-chip inference is a pure
    batch re-layout (SURVEY.md §2.3: per-chip streaming,
    data-parallel eval)."""
    model = DAGR(CFG, height=H, width=W)
    rng = np.random.default_rng(2)
    ev = random_events(rng, 8, CFG.n_nodes, width=W, height=H, n_valid=100)
    variables = model.init(jax.random.key(0), ev, train=False)

    def fwd(variables, events):
        return model.apply(variables, events, train=False)

    raw1 = jax.jit(fwd)(variables, ev)

    mesh = make_mesh(8)
    sharded = shard_eval_forward(fwd, mesh)
    raw2 = sharded(put_replicated(variables, mesh), put_batch(ev, mesh))
    np.testing.assert_allclose(np.asarray(raw1), np.asarray(raw2), atol=1e-5)


def test_dp_sharded_step_matches_single_device():
    """The dp=8 sharded step must produce the same loss and params as
    the unsharded step (collectives are a pure re-layout)."""
    model = DAGR(CFG, height=H, width=W)
    rng = np.random.default_rng(1)
    ev = random_events(rng, 8, CFG.n_nodes, width=W, height=H, n_valid=100)
    tgt = jnp.asarray(random_targets(rng, 8, width=W, height=H))
    tx, _ = make_optimizer(CFG, num_iters_per_epoch=10)
    state = init_state(model, CFG, tx, jax.random.key(0), ev)
    step = make_train_step(model, CFG, tx, H)

    s1, l1 = jax.jit(step)(state, ev, tgt)

    mesh = make_mesh(8)
    sharded = shard_train_step(step, mesh)
    s2, l2 = sharded(
        put_replicated(state, mesh), put_batch(ev, mesh), put_batch(tgt, mesh)
    )
    np.testing.assert_allclose(
        float(l1["total_loss"]), float(l2["total_loss"]), rtol=1e-4
    )
    a, b = jax.tree.leaves(s1.params)[0], jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
