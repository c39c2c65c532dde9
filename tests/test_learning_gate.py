"""End-to-end learning gate: overfitting a fixed 2-box synthetic batch
must drive train-set COCO mAP to ~1 through the FULL loop — graph
build, backbone, SimOTA loss, decode, NMS, COCO matching.  The
reference's equivalent quality evidence is its released trained
checkpoint (reference: readme.md:66-76); this is the offline
substitute, and it catches any loss->decode->NMS inconsistency that a
mere loss-decrease test (test_model.test_overfit_tiny) cannot."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dagr_tpu.config import DagrConfig
from dagr_tpu.core.types import EventBatch
from dagr_tpu.eval.buffers import detections_to_list, targets_to_list
from dagr_tpu.eval.coco import coco_map
from dagr_tpu.models.dagr import DAGR, detect, detection_loss

W, H = 64, 48
CFG = DagrConfig(
    n_nodes=256, max_neighbors=8, batch_size=2, node_chunk=512, radius=0.05,
)

# (class, cx, cy, w, h) pixel boxes; events are generated inside them so
# the graph carries a localizable signal
BOXES = [
    [(0, 16.0, 12.0, 16.0, 12.0), (1, 44.0, 34.0, 18.0, 14.0)],
    [(1, 20.0, 30.0, 14.0, 12.0), (0, 48.0, 14.0, 16.0, 10.0)],
]


def boxed_events(rng, batch, n_nodes):
    pos = np.zeros((batch, n_nodes, 3), np.float32)
    feat = np.zeros((batch, n_nodes, 1), np.float32)
    mask = np.ones((batch, n_nodes), bool)
    for b in range(batch):
        bs = BOXES[b]
        n_per = n_nodes // len(bs)
        i0 = 0
        for (cls, cx, cy, w, h) in bs:
            n = min(n_per, n_nodes - i0)
            pos[b, i0:i0 + n, 0] = rng.uniform(cx - w / 2, cx + w / 2, n) / W
            pos[b, i0:i0 + n, 1] = rng.uniform(cy - h / 2, cy + h / 2, n) / H
            pos[b, i0:i0 + n, 2] = np.sort(rng.uniform(0.2, 0.9, n))
            feat[b, i0:i0 + n, 0] = 1.0 if cls == 0 else -1.0
            i0 += n
        o = np.argsort(pos[b, :, 2], kind="stable")
        pos[b], feat[b] = pos[b][o], feat[b][o]
    return EventBatch(pos=jnp.asarray(pos), feat=jnp.asarray(feat),
                      mask=jnp.asarray(mask))


def test_overfit_reaches_map():
    rng = np.random.default_rng(0)
    ev = boxed_events(rng, 2, CFG.n_nodes)
    tgt = np.zeros((2, 100, 5), np.float32)
    for b, bs in enumerate(BOXES):
        for i, bx in enumerate(bs):
            tgt[b, i] = bx
    targets = jnp.asarray(tgt)

    model = DAGR(CFG, height=H, width=W)
    variables = model.init(jax.random.key(0), ev, train=False)
    params, bstats = variables["params"], variables["batch_stats"]
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)

    def step(carry, _):
        params, bstats, opt_state = carry

        def loss_fn(p):
            raw, new_vars = model.apply(
                {"params": p, "batch_stats": bstats}, ev, train=True,
                mutable=["batch_stats"])
            l = detection_loss(raw, targets, CFG, H)
            return l["total_loss"], new_vars["batch_stats"]
        (loss, bstats2), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        upd, opt_state2 = tx.update(grads, opt_state)
        return (optax.apply_updates(params, upd), bstats2, opt_state2), loss

    @jax.jit
    def train(params, bstats, opt_state):
        return jax.lax.scan(step, (params, bstats, opt_state), None,
                            length=400)

    (params, bstats, _), losses = train(params, bstats, opt_state)
    assert np.isfinite(np.asarray(losses)).all()

    raw = model.apply({"params": params, "batch_stats": bstats}, ev,
                      train=False)
    det = detect(raw, CFG, H, W)
    m = coco_map(targets_to_list(targets), detections_to_list(det),
                 CFG.num_classes)
    # train-set AP ~= 1: the model actually LOCALIZES, not merely
    # reduces loss (prototype run: AP 0.938, AP_50 1.0)
    assert m["AP_50"] >= 0.9, m
    assert m["AP"] >= 0.5, m
