"""Honest graph-build timing on the real chip: T iterations inside one
jit over distinct event windows (defeats tunnel overhead + memoization).

Run: python scripts/bench_build.py [fast_path] [chunk]
  fast_path: "sort" (default, one-shot lex merge join) or "slab"
             (round-5 chunked FIFO fast path, graph/slab.py)
  chunk:     slab-path chunk size (default 8192)
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
    from dagr_tpu.graph.build import build_graph

    cfg = DagrConfig()
    H, W = 240, 320
    NV = 45_000
    rng = np.random.default_rng(0)
    evs = [random_events(rng, 1, cfg.n_nodes, width=W, height=H, n_valid=NV)
           for _ in range(T)]
    pos = jnp.stack([e.pos_px() for e in evs])    # [T, 1, N, 3]
    msk = jnp.stack([e.mask for e in evs])

    fast_path = sys.argv[1] if len(sys.argv) > 1 else "sort"
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    kw = dict(width=W, height=H, radius=cfg.radius_px(W),
              delta_t_us=cfg.delta_t_us(), max_neighbors=cfg.max_neighbors,
              queue_size=cfg.max_queue_size, fast_path=fast_path,
              chunk=chunk)

    def run(pos, msk, bump):
        def step(c, pm):
            p, m = pm
            # real but semantics-free perturbation: shifting all
            # timestamps by the per-call bump changes every sort key
            # while leaving the edge set identical (dt is relative)
            p = p.at[..., 2].add(c)
            g = build_graph(p, m, **kw)
            return c + g.nbr[0, 0, 0], g.nbr_mask.sum()
        c, sums = jax.lax.scan(step, bump, (pos, msk))
        return c, sums

    f = jax.jit(run)
    overhead_probe = jax.jit(lambda x: x + 1)
    _ = np.asarray(overhead_probe(jnp.zeros((), jnp.int32)))
    t0 = time.perf_counter()
    _ = np.asarray(overhead_probe(jnp.ones((), jnp.int32)))
    ovh = time.perf_counter() - t0

    for i in range(2):
        out = f(pos, msk, jnp.int32(i))
        _ = np.asarray(out[0])
    ts = []
    for i in range(4):
        t0 = time.perf_counter()
        out = f(pos, msk, jnp.int32(i + 7))
        _ = np.asarray(out[0])
        ts.append(time.perf_counter() - t0)
    per = (min(ts) - ovh) / T * 1e3
    print(f"fast_path={fast_path} chunk={chunk}")
    print(f"overhead {ovh*1e3:.1f} ms; build_graph {per:.2f} ms/window "
          f"({NV/per/1e3:.2f} Mev/s), edges/window ~{int(np.asarray(out[1])[0])}")


if __name__ == "__main__":
    main()
