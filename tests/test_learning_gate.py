"""End-to-end learning gate: overfitting a fixed 2-box synthetic batch
must drive train-set COCO mAP to ~1 through the FULL loop — graph
build, backbone, SimOTA loss, decode, NMS, COCO matching.  The
reference's equivalent quality evidence is its released trained
checkpoint (reference: readme.md:66-76); this is the offline
substitute, and it catches any loss->decode->NMS inconsistency that a
mere loss-decrease test (test_model.test_overfit_tiny) cannot.

The gate runs in a FRESH single-device CPU subprocess: under
conftest's 8-virtual-device mesh the 400-step compile+run is ~10x
slower for no extra coverage (nothing here is sharded)."""
import json
import os
import subprocess
import sys

W, H = 64, 48

# (class, cx, cy, w, h) pixel boxes; events are generated inside them so
# the graph carries a localizable signal
BOXES = [
    [(0, 16.0, 12.0, 16.0, 12.0), (1, 44.0, 34.0, 18.0, 14.0)],
    [(1, 20.0, 30.0, 14.0, 12.0), (0, 48.0, 14.0, 16.0, 10.0)],
]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from dagr_tpu.config import DagrConfig
    from dagr_tpu.core.types import EventBatch
    from dagr_tpu.eval.buffers import detections_to_list, targets_to_list
    from dagr_tpu.eval.coco import coco_map
    from dagr_tpu.models.dagr import DAGR, detect, detection_loss

    cfg = DagrConfig(n_nodes=256, max_neighbors=8, batch_size=2,
                     node_chunk=512, radius=0.05)
    rng = np.random.default_rng(0)
    n_nodes = cfg.n_nodes
    pos = np.zeros((2, n_nodes, 3), np.float32)
    feat = np.zeros((2, n_nodes, 1), np.float32)
    for b in range(2):
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
    ev = EventBatch(pos=jnp.asarray(pos), feat=jnp.asarray(feat),
                    mask=jnp.ones((2, n_nodes), bool))

    tgt = np.zeros((2, 100, 5), np.float32)
    for b, bs in enumerate(BOXES):
        for i, bx in enumerate(bs):
            tgt[b, i] = bx
    targets = jnp.asarray(tgt)

    model = DAGR(cfg, height=H, width=W)
    variables = model.init(jax.random.key(0), ev, train=False)
    params, bstats = variables["params"], variables["batch_stats"]
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, bstats, opt_state):
        def loss_fn(p):
            raw, new_vars = model.apply(
                {"params": p, "batch_stats": bstats}, ev, train=True,
                mutable=["batch_stats"])
            l = detection_loss(raw, targets, cfg, H)
            return l["total_loss"], new_vars["batch_stats"]
        (loss, bstats2), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        upd, opt_state2 = tx.update(grads, opt_state)
        return optax.apply_updates(params, upd), bstats2, opt_state2, loss

    for _ in range(400):
        params, bstats, opt_state, loss = step(params, bstats, opt_state)
    assert np.isfinite(float(loss)), loss

    raw = model.apply({"params": params, "batch_stats": bstats}, ev,
                      train=False)
    det = detect(raw, cfg, H, W)
    m = coco_map(targets_to_list(targets), detections_to_list(det),
                 cfg.num_classes)
    print("LEARNING_GATE " + json.dumps(m))


def test_overfit_reaches_map():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        capture_output=True, text=True, timeout=1500, env=env, cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines()
            if l.startswith("LEARNING_GATE ")]
    assert line, out.stdout
    m = json.loads(line[0].split(" ", 1)[1])
    # train-set AP ~= 1: the model actually LOCALIZES, not merely
    # reduces loss (prototype run: AP 0.938, AP_50 1.0)
    assert m["AP_50"] >= 0.9, m
    assert m["AP"] >= 0.5, m


if __name__ == "__main__":
    main()
