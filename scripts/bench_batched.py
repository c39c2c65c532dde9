"""Batched sync eval throughput: B windows per forward (the reference
eval protocol runs batch 8, readme.md:66-76 / run_test.py).  Fixed
per-op costs amortize across the batch.  Run: python scripts/bench_batched.py [B]
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

    Bw = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cfg = DagrConfig(batch_size=Bw)
    H, W = 240, 320
    NV = 45_000
    model = DAGR(cfg, height=H, width=W)
    rng = np.random.default_rng(0)
    evs = [random_events(rng, Bw, cfg.n_nodes, width=W, height=H,
                         n_valid=NV) for _ in range(T)]
    stack = jax.tree.map(lambda *a: jnp.stack(a), *evs)
    variables = model.init(jax.random.key(0), evs[0], train=False)

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
    for i in range(3):
        t0 = time.perf_counter()
        out = f(variables, stack, jnp.float32(i + 7))
        _ = np.asarray(out[0])
        ts.append(time.perf_counter() - t0)
    per = (min(ts) - ovh) / T
    mev = Bw * NV / per / 1e6
    print(f"B={Bw}: {per*1e3:.1f} ms/step ({per*1e3/Bw:.1f} ms/window, "
          f"{mev:.3f} Mev/s/chip)")


if __name__ == "__main__":
    main()
