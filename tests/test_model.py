"""End-to-end model tests: shapes, loss sanity, NMS, tiny overfit."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dagr_tpu.config import DagrConfig
from dagr_tpu.data.synthetic import random_events, random_targets
from dagr_tpu.models.dagr import DAGR, detect, detection_loss
from dagr_tpu.ops.nms import iou_xyxy, nms_mask

W, H = 64, 48
CFG = DagrConfig(
    n_nodes=256, max_neighbors=8, batch_size=2, node_chunk=512,
    radius=0.05,
)


def make_model(cfg=CFG):
    model = DAGR(cfg, height=H, width=W)
    rng = np.random.default_rng(0)
    ev = random_events(rng, 2, cfg.n_nodes, width=W, height=H)
    variables = model.init(jax.random.key(0), ev, train=False)
    return model, variables, ev


def test_forward_shapes():
    model, variables, ev = make_model()
    raw = model.apply(variables, ev, train=False)
    hw = CFG.grid_shapes()[-2:]
    A = sum(ny * nx for ny, nx in hw)
    assert raw.shape == (2, A, 5 + CFG.num_classes)
    assert bool(jnp.isfinite(raw).all())


def test_single_scale():
    cfg = CFG.replace(num_scales=1)
    model, variables, ev = make_model(cfg)
    raw = model.apply(variables, ev, train=False)
    ny, nx = cfg.grid_shapes()[-1]
    assert raw.shape == (2, ny * nx, 5 + cfg.num_classes)


def test_loss_finite_and_assigns():
    model, variables, ev = make_model()
    rng = np.random.default_rng(1)
    targets = jnp.asarray(random_targets(rng, 2, width=W, height=H))
    raw = model.apply(variables, ev, train=True,
                      mutable=["batch_stats"])[0]
    losses = detection_loss(raw, targets, CFG, H)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v).all()), k
    assert float(losses["num_fg"]) > 0  # SimOTA matched something
    assert float(losses["total_loss"]) > 0


def test_detect_output_contract():
    model, variables, ev = make_model()
    raw = model.apply(variables, ev, train=False)
    det = detect(raw, CFG, H, W)
    K = det["boxes"].shape[1]
    assert det["scores"].shape == (2, K)
    assert det["labels"].shape == (2, K)
    # scores sorted descending
    s = np.asarray(det["scores"])
    assert (np.diff(s, axis=1) <= 1e-6).all()


def test_nms_suppresses_duplicates():
    boxes = jnp.asarray([
        [0, 0, 10, 10],
        [1, 1, 11, 11],     # heavy overlap with 0
        [50, 50, 60, 60],   # separate
    ], dtype=jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = nms_mask(boxes, scores, jnp.ones(3, bool), 0.5)
    np.testing.assert_array_equal(np.asarray(keep), [True, False, True])
    iou = np.asarray(iou_xyxy(boxes, boxes))
    assert iou[0, 1] > 0.5 and iou[0, 2] == 0


def test_overfit_tiny():
    """Gradient steps on one batch must reduce the loss (learning works
    through graph build, convs, pooling, head, and SimOTA)."""
    import optax

    model, variables, ev = make_model()
    rng = np.random.default_rng(2)
    targets = jnp.asarray(random_targets(rng, 2, width=W, height=H))
    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, bstats, opt_state):
        def loss_fn(p):
            raw, new_vars = model.apply(
                {"params": p, "batch_stats": bstats}, ev, train=True,
                mutable=["batch_stats"],
            )
            l = detection_loss(raw, targets, CFG, H)
            return l["total_loss"], new_vars["batch_stats"]

        (loss, new_bstats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, new_bstats, opt_state, loss

    losses = []
    for _ in range(20):
        params, bstats, opt_state, loss = step(params, bstats, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses
