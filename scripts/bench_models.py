"""Tracked-config forwards with no perf numbers yet (round-2 verdict,
missing item 2): DAGR-S + image fusion (the reference checkpoint's
config, batch 8 eval protocol) and the model ladder (DAGR-M/L
events-only).  Chains T distinct batches inside one jit and subtracts
tunnel overhead, same protocol as bench.py.

Run: python scripts/bench_models.py fusion|dagr-l|dagr-m [B]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

T = 3


def main():
    import jax
    import jax.numpy as jnp

    from dagr_tpu.config import DagrConfig
    from dagr_tpu.data.synthetic import random_events
    from dagr_tpu.models.dagr import DAGR, detect

    which = sys.argv[1] if len(sys.argv) > 1 else "fusion"
    Bw = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    if which == "fusion":
        # reference dagr_s_50.pth config: DAGR-S + ResNet-50 fusion,
        # eval batch 8 (reference readme.md:66-76)
        cfg = DagrConfig(batch_size=Bw, use_image=True, img_net="resnet50")
    elif which == "dagr-l":
        cfg = DagrConfig(batch_size=Bw, net_stem_width=1.0,
                         yolo_stem_width=1.0, after_pool_width=1.0)
    elif which == "dagr-m":
        cfg = DagrConfig(batch_size=Bw, net_stem_width=0.75,
                         yolo_stem_width=0.75, after_pool_width=1.0)
    else:
        raise SystemExit(f"unknown model {which}")
    H, W = 240, 320
    NV = 45_000
    model = DAGR(cfg, height=H, width=W)
    rng = np.random.default_rng(0)
    evs = [random_events(rng, Bw, cfg.n_nodes, width=W, height=H,
                         n_valid=NV) for _ in range(T)]
    stack = jax.tree.map(lambda *a: jnp.stack(a), *evs)
    if cfg.use_image:
        imgs = jnp.asarray(rng.random((T, Bw, H, W, 3), np.float32))
        variables = model.init(jax.random.key(0), evs[0], imgs[0],
                               train=False)
    else:
        imgs = None
        variables = model.init(jax.random.key(0), evs[0], train=False)

    def run(variables, stack, imgs, bump):
        def step(c, x):
            if imgs is not None:
                ev, im = x
            else:
                ev, im = x, None
            ev = ev.replace(feat=jnp.where(c < -1e9, 0.0, ev.feat))
            raw = model.apply(variables, ev, im, train=False)
            if isinstance(raw, tuple):
                raw = raw[0]                      # hybrid output
            det = detect(raw, cfg, H, W)
            return c + det["scores"][0, 0], det["scores"].sum()
        xs = (stack, imgs) if imgs is not None else stack
        return jax.lax.scan(step, bump, xs)

    f = jax.jit(run)
    probe = jax.jit(lambda x: x + 1)
    _ = np.asarray(probe(jnp.zeros((), jnp.float32)))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(probe(jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    ovh = min(ts)

    t0 = time.perf_counter()
    out = f(variables, stack, imgs, jnp.float32(0))
    _ = np.asarray(out[0])
    print(f"{which} B={Bw}: compile+first {time.perf_counter()-t0:.1f} s",
          flush=True)
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        out = f(variables, stack, imgs, jnp.float32(i + 7))
        _ = np.asarray(out[0])
        ts.append(time.perf_counter() - t0)
    per = (min(ts) - ovh) / T
    print(f"{which} B={Bw}: {per*1e3:.1f} ms/batch, "
          f"{per/Bw*1e3:.2f} ms/window, "
          f"{Bw*NV/per/1e6:.3f} Mev/s", flush=True)


if __name__ == "__main__":
    main()
