"""Ad-hoc perf breakdown on the real chip: graph build vs backbone vs
head vs NMS, on the flagship bench geometry (45k events, 320x240).

Not part of the test suite; run manually: python scripts/profile_breakdown.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, args, n=8, warm=2):
    import jax
    for _ in range(warm):
        out = fn(*args)
    out = jax.tree.leaves(out)[0]
    _ = np.asarray(out).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from dagr_tpu.config import DagrConfig
    from dagr_tpu.data.synthetic import random_events
    from dagr_tpu.graph.build import build_graph
    from dagr_tpu.models.dagr import DAGR, detect

    cfg = DagrConfig()
    H, W = 240, 320
    NV = 45_000
    model = DAGR(cfg, height=H, width=W)
    rng = np.random.default_rng(0)
    evs = [
        jax.device_put(random_events(rng, 1, cfg.n_nodes, width=W, height=H,
                                     n_valid=NV))
        for _ in range(4)
    ]
    variables = jax.device_put(model.init(jax.random.key(0), evs[0], train=False))

    gb_kw = dict(width=W, height=H, radius=cfg.radius_px(W),
                 delta_t_us=cfg.delta_t_us(),
                 max_neighbors=cfg.max_neighbors)
    print(f"radius_px={gb_kw['radius']}  S={(2 * gb_kw['radius'] + 1) ** 2}")

    import itertools
    cyc = itertools.cycle(evs)

    def gb(ev):
        return build_graph(ev.pos_px(), ev.mask, **gb_kw)

    @jax.jit
    def full(variables, ev):
        return model.apply(variables, ev, train=False)

    @jax.jit
    def full_det(variables, ev):
        raw = model.apply(variables, ev, train=False)
        return detect(raw, cfg, H, W)

    t_gb = timed(lambda: None or gb(next(cyc)), (), n=8)
    t_full = timed(lambda: full(variables, next(cyc)), (), n=8)
    t_det = timed(lambda: full_det(variables, next(cyc)), (), n=8)
    print(f"graph build alone : {t_gb:8.2f} ms")
    print(f"fwd (build+net)   : {t_full:8.2f} ms")
    print(f"fwd + detect/NMS  : {t_det:8.2f} ms")
    print(f"  => net w/o build ~ {t_full - t_gb:.2f} ms, det ~ {t_det - t_full:.2f} ms")


if __name__ == "__main__":
    main()
