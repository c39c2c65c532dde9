"""Sliding-window (ring) serving latency on the real chip.

The infinite-stream mode: the store is FULL and every chunk evicts the
oldest events (reference delete_nodes semantics, ev_graph.py:121-136).
MultiStreamServer window_mode='ring' is the round-4 rebuild on the
serve-engine economics; engine.py's ring stays the oracle
(tests/test_serve.py::test_ring_window_matches_engine_ring).

Run: python scripts/bench_ring.py [mode] [chunk] [T] [reps]
mode in sort|slabv|slabvp4|slabvp8 (slabvpN = slab search, vid-only
i32 payload, N x-adjacent pixels packed per slab row; the v16 rebased
payload cannot cover an unbounded ring, so ring mode uses 'v').
Reports per-chunk p50/min/max after the ring has wrapped.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from dagr_tpu.config import DagrConfig
    from dagr_tpu.data.synthetic import random_events
    from dagr_tpu.models.dagr import DAGR
    from dagr_tpu.streaming.serve import MultiStreamServer
    from dagr_tpu.streaming.engine import chunk_events

    mode = sys.argv[1] if len(sys.argv) > 1 else "sort"
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 16

    cfg = DagrConfig()
    H, W = 240, 320
    NV = 45_000
    model = DAGR(cfg, height=H, width=W)
    rng = np.random.default_rng(0)
    ev = random_events(rng, 1, cfg.n_nodes, width=W, height=H, n_valid=NV)
    variables = model.init(jax.random.key(0), ev, train=False)

    pack = 1
    base = mode
    if mode.startswith("slabvp"):
        pack = int(mode[len("slabvp"):])
        base = "slabv"
    kw = dict(search_mode="slab" if base == "slabv" else base,
              queue_payload="v" if base == "slabv" else "vt",
              slab_pack=pack)

    NRING = ((cfg.n_nodes + chunk - 1) // chunk) * chunk
    srv = MultiStreamServer(cfg, H, W, n_streams=1, chunk=chunk,
                            window_mode="ring", ring=NRING, **kw)
    chain = srv.make_chain(variables["params"], variables["batch_stats"], T)
    st = srv.init_state()

    # one long monotone stream: enough windows to wrap the ring during
    # fill AND feed (reps+1) DISTINCT timed groups (the runtime
    # memoizes identical executions)
    n_fill = NRING // chunk + T
    need = (n_fill + (reps + 1) * T) * chunk
    n_win = -(-need // NV)
    pos_w, feat_w = [], []
    for w in range(n_win):
        e = random_events(rng, 1, cfg.n_nodes, width=W, height=H,
                          n_valid=NV)
        p = np.asarray(e.pos_px()[0])[:NV].copy()
        p[:, 2] += np.int32(w * cfg.time_window_us)
        pos_w.append(p)
        feat_w.append(np.asarray(e.feat[0])[:NV])
    pos = np.concatenate(pos_w)
    feat = np.concatenate(feat_w)
    chunks = [(p[None], f[None], v[None])
              for (p, f, v) in chunk_events(pos, feat, chunk)]

    def stack(sel):
        return tuple(jax.device_put(np.stack([c[j] for c in sel]))
                     for j in range(3))

    probe = jax.jit(lambda x: x + 1)
    _ = np.asarray(probe(jnp.zeros((), jnp.float32)))

    t0 = time.perf_counter()
    for g in range(0, n_fill, T):
        st, raw, cover = chain(st, *stack(chunks[g:g + T]))
    _ = np.asarray(raw)
    print(f"mode={mode} chunk={chunk} NRING={NRING} fill+compile "
          f"{time.perf_counter() - t0:.1f} s coverage_ok={bool(cover)}",
          flush=True)

    groups = [stack(chunks[n_fill + r * T:n_fill + (r + 1) * T])
              for r in range(reps)]
    force = jax.jit(lambda a: sum(x.sum().astype(jnp.float32) for x in a))
    for gg in groups:
        _ = np.asarray(force(gg))

    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(probe(jnp.float32(100 + i)))
        ts.append(time.perf_counter() - t0)
    ovh = min(ts)
    print(f"overhead {ovh*1e3:.1f} ms", flush=True)

    lats = []
    for rep in range(reps):
        t0 = time.perf_counter()
        st, raw, cover = chain(st, *groups[rep])
        _ = np.asarray(raw)
        lats.append((time.perf_counter() - t0 - ovh) / T)
    lats.sort()
    p50 = lats[len(lats) // 2] * 1e3
    print(f"[ring/{mode}] p50 {p50:.2f} ms (min {lats[0]*1e3:.2f} "
          f"max {lats[-1]*1e3:.2f}) per {chunk}-ev chunk, "
          f"coverage_ok={bool(cover)}, reps={reps}", flush=True)


if __name__ == "__main__":
    main()
