"""Streaming-engine step timing on the real chip: full step vs
front-end only (graph search + event-level convs + aggregates), chained
inside one jit.  Run: python scripts/bench_stream.py [chunk] [grow|ring]

ring mode exercises the sliding-window store (eviction + live-store
aggregate recompute, reference delete_nodes path); its steps cost more
than grow-mode steps by design.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

T = 16


def main():
    import jax
    import jax.numpy as jnp

    from dagr_tpu.config import DagrConfig
    from dagr_tpu.data.synthetic import random_events
    from dagr_tpu.models.dagr import DAGR
    from dagr_tpu.streaming.engine import StreamingDetector, chunk_events

    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    mode = sys.argv[2] if len(sys.argv) > 2 else "grow"
    cfg = DagrConfig()
    H, W = 240, 320
    NV = 45_000
    model = DAGR(cfg, height=H, width=W)
    rng = np.random.default_rng(0)
    ev = random_events(rng, 1, cfg.n_nodes, width=W, height=H, n_valid=NV)
    variables = model.init(jax.random.key(0), ev, train=False)
    params, stats = variables["params"], variables["batch_stats"]

    eng = StreamingDetector(cfg, H, W, chunk=chunk, count_flops=False,
                            window_mode=mode)
    st = eng.init_state()
    pos_px = np.asarray(ev.pos_px()[0])
    feat = np.asarray(ev.feat[0])
    chunks = chunk_events(pos_px[:NV], feat[:NV], chunk)

    probe = jax.jit(lambda x: x + 1)
    _ = np.asarray(probe(jnp.zeros((), jnp.float32)))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(probe(jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    ovh = min(ts)
    print(f"overhead {ovh*1e3:.1f} ms, chunk={chunk}")

    # warm fill so the store is realistically loaded
    step1 = eng.make_step(params, stats)
    n_fill = min(100, len(chunks) - 2 * T - 1)
    for c in chunks[:n_fill]:
        st, raw, _ = step1(st, *c)
    _ = np.asarray(raw[0, 0, 0])

    def stack(sel):
        return (jnp.stack([c[0] for c in sel]),
                jnp.stack([c[1] for c in sel]),
                jnp.stack([c[2] for c in sel]))

    # full step, T chained
    def chain_full(st, ps, fs, vs):
        def body(s, pfv):
            s, raw, _ = eng.step(params, stats, s, *pfv)
            return s, raw[0, 0, 0]
        return jax.lax.scan(body, st, (ps, fs, vs))

    # front-end only: monkeypatch the dense tail away
    orig_tail = eng._dense_tail

    def chain_front(st, ps, fs, vs):
        eng._dense_tail = lambda *a, **k: (
            jnp.zeros((1, 1, 7), jnp.float32), {})
        try:
            def body(s, pfv):
                s, raw, _ = eng.step(params, stats, s, *pfv)
                return s, raw[0, 0, 0]
            return jax.lax.scan(body, st, (ps, fs, vs))
        finally:
            eng._dense_tail = orig_tail

    for name, fn in [("full", chain_full), ("front-end", chain_front)]:
        f = jax.jit(fn)
        s = st
        sel0 = chunks[n_fill:n_fill + T]
        # compile + warm on distinct chunk batches
        s, _ = f(s, *stack(sel0))
        _ = np.asarray(jax.tree.leaves(s)[0]).ravel()[:1]
        ts = []
        for i in range(3):
            sel = chunks[n_fill + (i % 2) * T:n_fill + (i % 2) * T + T]
            t0 = time.perf_counter()
            s, raws = f(s, *stack(sel))
            _ = np.asarray(raws)
            ts.append(time.perf_counter() - t0)
        per = (min(ts) - ovh) / T * 1e3
        print(f"{name:10s} {per:7.2f} ms/chunk "
              f"({chunk/per/1e3:.3f} Mev/s)", flush=True)


if __name__ == "__main__":
    main()
