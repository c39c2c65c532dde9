"""Multi-stream serving throughput on the real chip (queue-based
engine, streaming/serve.py).  Chains T lockstep steps inside one jit;
reports aggregate Mevents/s and per-stream step cost so the S-scaling
curve (S=8/16/32) can be recorded.

Run: python scripts/bench_serve.py [S] [chunk] [T] [stage] [mode] [Q] [TE]
stage in insert|gather|search|select|conv|agg|tail1..tail5|full
(default full) early-exits the step after that phase for per-stage
cost attribution; "sweep"/"tailsweep" run a whole stage ladder; mode
in sort|queue|slab|slabv (default sort; slabv = vid-only FIFO payload;
"-split"/"-csplit" suffixes = per-stream slab/conv-ring gathers);
Q = queue depth for queue/slab; TE = tail_every detection cadence
(the pooled pyramid + head run every TE-th chunk).
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
    from dagr_tpu.streaming.serve import MultiStreamServer, chunk_streams

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    stage = sys.argv[4] if len(sys.argv) > 4 else "full"
    mode = sys.argv[5] if len(sys.argv) > 5 else "sort"
    qdepth = int(sys.argv[6]) if len(sys.argv) > 6 else 16
    tail_every = int(sys.argv[7]) if len(sys.argv) > 7 else 1
    cfg = DagrConfig()
    H, W = 240, 320
    NV = 45_000
    model = DAGR(cfg, height=H, width=W)
    rng = np.random.default_rng(0)
    ev = random_events(rng, 1, cfg.n_nodes, width=W, height=H, n_valid=NV)
    variables = model.init(jax.random.key(0), ev, train=False)

    # Enough DISTINCT windows that no timed rep reuses inputs (the
    # runtime memoizes identical executions and sub-caches ops whose
    # operands repeat); times continue monotonically across windows so
    # the whole run is one genuine long stream — no state resets.
    if stage == "sweep":
        # insert/gather early-exits only exist in the slab search
        stages = (["insert", "gather", "search", "select", "conv", "agg",
                   "full"] if mode.startswith("slab")
                  else ["search", "select", "conv", "agg", "full"])
    elif stage == "tailsweep":
        # dense-tail attribution: exit after level-1 nodeset (tail1),
        # after each layer+pool (tail2-5); head cost = full - tail5
        stages = ["agg", "tail1", "tail2", "tail3", "tail4", "tail5",
                  "full"]
    else:
        stages = [stage]
    REPS = 3 if stage == "sweep" else 6
    need = len(stages) * (REPS + 1) * T * chunk
    n_win = -(-need // NV)
    pos_w, feat_w = [], []
    for w in range(n_win):
        evs = [random_events(rng, 1, cfg.n_nodes, width=W, height=H,
                             n_valid=NV) for _ in range(S)]
        p = np.stack([np.asarray(e.pos_px()[0])[:NV] for e in evs]).copy()
        p[..., 2] += np.int32(w * cfg.time_window_us)
        pos_w.append(p)
        feat_w.append(np.stack([np.asarray(e.feat[0])[:NV] for e in evs]))
    pos = np.concatenate(pos_w, axis=1)
    feat = np.concatenate(feat_w, axis=1)
    chunks = chunk_streams(pos, feat, chunk)

    base = mode.split("-")[0]
    # "slabv" = slab search with vid-only FIFO payload (half the table
    # + slice traffic; dt test via the t-ring vmin join); "slabv16" =
    # the same with uint16 REBASED vids (half again); "slabv16pN" =
    # v16 with N x-adjacent pixels packed per slab row (the slice
    # gather costs per ROW — scripts/microbench9.py)
    pack = 1
    if base.startswith("slabv16p"):
        pack = int(base[len("slabv16p"):])
        base = "slabv16"
    elif base.startswith("slabvp"):
        # packed rows over the i32 'v' payload (no u16 rebase-range
        # limit — required at chunks >= 16384, where 2*P >= 2^16)
        pack = int(base[len("slabvp"):])
        base = "slabv"
    payload = {"slabv": "v", "slabv16": "v16"}.get(base, "vt")
    srv = MultiStreamServer(cfg, H, W, n_streams=S, chunk=chunk,
                            search_mode=("slab" if base.startswith("slabv")
                                         else base),
                            queue_depth=qdepth, tail_every=tail_every,
                            queue_payload=payload, slab_pack=pack,
                            # "-nopol": disable the polarity-in-payload
                            # algebraic conv1 (round-5 A/B)
                            pol_payload=False if "-nopol" in mode else None)
    print(f"pol_payload={srv.pol_payload}", flush=True)
    if "-split" in mode:
        srv.split_gather = True
    if "-csplit" in mode:
        srv.split_conv_gather = True
    # "-det": chain the full decode+NMS path on fresh steps (event ->
    # DETECTION throughput, protocol parity with the sync bench)
    decode = "-det" in mode

    probe = jax.jit(lambda x: x + 1)
    _ = np.asarray(probe(jnp.zeros((), jnp.float32)))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(probe(jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    ovh = min(ts)
    print(f"S={S} chunk={chunk} T={T} mode={mode} Q={qdepth} "
          f"TE={tail_every} overhead {ovh*1e3:.1f} ms", flush=True)

    # Pre-stage EVERY rep's inputs on the device before timing: a
    # host->device put inside the timed region costs a full ~30 ms
    # tunnel dispatch each (3 per rep == ~12 ms/step of phantom cost at
    # T=8 — this was most of the round-3 "in-step overhead").  Each
    # stage of a sweep gets its OWN untouched chunk groups so op
    # sub-caching can't flatter later stages.
    groups = []
    for r in range(len(stages) * (REPS + 1)):
        sel = chunks[r * T:(r + 1) * T]
        groups.append(tuple(
            jax.device_put(np.stack([c[j] for c in sel]))
            for j in range(3)))
    force = jax.jit(lambda a: sum(x.sum().astype(jnp.float32) for x in a))
    for g in groups:
        _ = np.asarray(force(g))

    for si, stg in enumerate(stages):
        srv.bench_stage = stg
        chain = srv.make_chain(
            variables["params"], variables["batch_stats"], T, decode=decode)
        g0 = si * (REPS + 1)
        st = srv.init_state()
        t0 = time.perf_counter()
        st, raw, cover = chain(st, *groups[g0])
        _ = jax.tree.map(np.asarray, raw)
        print(f"[{stg}] compile+first {time.perf_counter() - t0:.1f} s "
              f"coverage_ok={bool(cover)}", flush=True)
        # re-probe the tunnel overhead per stage: it drifts with host
        # load / session age, and a stale value corrupts short stages
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(probe(jnp.float32(100 + si * 10 + i)))
            ts.append(time.perf_counter() - t0)
        ovh = min(ts)
        print(f"[{stg}] overhead {ovh*1e3:.1f} ms", flush=True)

        lats = []
        for rep in range(REPS):
            t0 = time.perf_counter()
            st, raw, cover = chain(st, *groups[g0 + rep + 1])
            _ = jax.tree.map(np.asarray, raw)
            lats.append((time.perf_counter() - t0 - ovh) / T)
        lats.sort()
        step_ms = lats[len(lats) // 2] * 1e3
        agg = S * chunk / (step_ms / 1e3) / 1e6
        print(f"[{stg}] step p50 {step_ms:.2f} ms (min {lats[0]*1e3:.2f} "
              f"max {lats[-1]*1e3:.2f}), per-stream {step_ms / S:.3f} ms, "
              f"aggregate {agg:.3f} Mev/s, coverage_ok={bool(cover)}",
              flush=True)


if __name__ == "__main__":
    main()
