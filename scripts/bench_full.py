"""Honest full-pipeline timing (build + backbone + head + decode/NMS)
on the real chip: T distinct windows chained inside one jit.

Run: python scripts/bench_full.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

T = 6


def main():
    import jax
    import jax.numpy as jnp

    from dagr_tpu.config import DagrConfig
    from dagr_tpu.data.synthetic import random_events
    from dagr_tpu.models.dagr import DAGR, detect

    cfg = DagrConfig()
    H, W = 240, 320
    NV = 45_000
    model = DAGR(cfg, height=H, width=W)
    rng = np.random.default_rng(0)
    evs = [random_events(rng, 1, cfg.n_nodes, width=W, height=H, n_valid=NV)
           for _ in range(T)]
    ev0 = evs[0]
    stack = jax.tree.map(lambda *a: jnp.stack(a), *evs)
    variables = model.init(jax.random.key(0), ev0, train=False)

    def run(variables, stack, bump):
        def step(c, ev):
            ev = ev.replace(feat=jnp.where(c < -1e9, 0.0, ev.feat))
            raw = model.apply(variables, ev, train=False)
            det = detect(raw, cfg, H, W)
            return c + det["scores"][0, 0], det["scores"].sum()
        c, s = jax.lax.scan(step, bump, stack)
        return c, s

    f = jax.jit(run)
    probe = jax.jit(lambda x: x + 1)
    _ = np.asarray(probe(jnp.zeros((), jnp.float32)))
    t0 = time.perf_counter()
    _ = np.asarray(probe(jnp.ones((), jnp.float32)))
    ovh = time.perf_counter() - t0

    for i in range(2):
        out = f(variables, stack, jnp.float32(i))
        _ = np.asarray(out[0])
    ts = []
    for i in range(4):
        t0 = time.perf_counter()
        out = f(variables, stack, jnp.float32(i + 7))
        _ = np.asarray(out[0])
        ts.append(time.perf_counter() - t0)
    per = (min(ts) - ovh) / T * 1e3
    print(f"overhead {ovh*1e3:.1f} ms; full pipeline {per:.2f} ms/window "
          f"({NV/per/1e3:.3f} Mev/s/chip)")


if __name__ == "__main__":
    main()
