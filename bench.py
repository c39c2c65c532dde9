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
import time

import numpy as np

N_WINDOWS = 12


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
    for i in range(3):
        t0 = time.perf_counter()
        out = pipeline(variables, stack, jnp.float32(i + 5))
        _ = jax.tree.map(np.asarray, out)            # materialize everything
        ts.append(time.perf_counter() - t0)
    dt = (min(ts) - ovh) / N_WINDOWS
    mev_s = NV / dt / 1e6

    # ---- streaming engine: per-chunk event->detection latency --------
    # The streaming/multistream sections are BEST-EFFORT: compile times
    # on this backend can degrade to >10 min per program, and the
    # headline JSON line must print regardless, so each detail section
    # runs under a SIGALRM budget and reports null on timeout.
    import signal

    class _SectionTimeout(Exception):
        pass

    def _section(budget_s, fn):
        def onalarm(signum, frame):
            raise _SectionTimeout()
        old = signal.signal(signal.SIGALRM, onalarm)
        signal.alarm(budget_s)
        try:
            return fn()
        except _SectionTimeout:
            return None
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)

    from dagr_tpu.streaming.engine import StreamingDetector, chunk_events

    chunk = 256
    pos_px = np.asarray(evs[0].pos_px()[0])
    feat = np.asarray(evs[0].feat[0])
    chunks = chunk_events(pos_px[:NV], feat[:NV], chunk)

    def measure_p50():
        eng = StreamingDetector(cfg, H, W, chunk=chunk, count_flops=False)
        st = eng.init_state()

        # chain chunk steps inside one jit so the tunnel overhead
        # amortizes; p50 is per-chunk device latency
        def chain(st, ps, fs, vs):
            def body(s, pfv):
                s, raw, _ = eng.step(variables["params"],
                                     variables["batch_stats"], s, *pfv)
                return s, raw
            st, raws = jax.lax.scan(body, st, (ps, fs, vs))
            return st, raws

        def stack(sel):
            return (jnp.stack([c[0] for c in sel]),
                    jnp.stack([c[1] for c in sel]),
                    jnp.stack([c[2] for c in sel]))

        chain_j = jax.jit(chain)
        for g in range(5):                           # compile + warm fill
            st, raws = chain_j(st, *stack(chunks[8 * g:8 * g + 8]))
        _ = np.asarray(raws)
        lat = []
        for rep in range(4):
            sel = chunks[40 + 8 * (rep % 2):48 + 8 * (rep % 2)]
            t0 = time.perf_counter()
            st, raws = chain_j(st, *stack(sel))
            _ = np.asarray(raws)
            lat.append((time.perf_counter() - t0 - ovh) / 8)
        return sorted(lat)[len(lat) // 2] * 1e3

    p50 = _section(1500, measure_p50)

    # ---- multi-stream serving: 8 vmapped streams per chip -------------
    # throughput-oriented: 1024-event chunks (the fixed dense-tail cost
    # dominates tiny chunks; single-stream LATENCY is the p50 above),
    # chained inside one jit so the number is device time
    S, mchunk = 8, 1024

    def measure_multistream():
        engm = StreamingDetector(cfg, H, W, chunk=mchunk, count_flops=False)
        mchunks = chunk_events(pos_px[:NV], feat[:NV], mchunk)

        def one(state, p, f_, v):
            s, raw, _ = engm.step(variables["params"],
                                  variables["batch_stats"], state, p, f_, v)
            return s, raw

        def chain_m(sts, ps, fs, vs):
            def body(s, pfv):
                s, raw = jax.vmap(one)(s, *pfv)
                return s, raw[:, 0, 0, 0]
            return jax.lax.scan(body, sts, (ps, fs, vs))

        chain_mj = jax.jit(chain_m)
        sts = engm.init_states(S)
        mch = [tuple(np.stack([c[j]] * S) for j in range(3))
               for c in mchunks[:32]]

        def stack_m(sel):
            return tuple(jnp.stack([c[j] for c in sel]) for j in range(3))

        sts, _ = chain_mj(sts, *stack_m(mch[:8]))      # compile + fill
        sts, _ = chain_mj(sts, *stack_m(mch[8:16]))
        _ = np.asarray(jax.tree.leaves(sts)[0]).ravel()[:1]
        lat_m = []
        for rep in range(2):
            sel = mch[16 + 8 * rep:24 + 8 * rep]
            t0 = time.perf_counter()
            sts, raws = chain_mj(sts, *stack_m(sel))
            _ = np.asarray(raws)
            lat_m.append((time.perf_counter() - t0 - ovh) / 8)
        return S * mchunk / min(lat_m) / 1e6

    ms_mev = _section(1500, measure_multistream)

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
                round(p50, 2) if p50 is not None else None),
            "multistream_8x_c1024_mevents_s": (
                round(ms_mev, 3) if ms_mev is not None else None),
            "model": "dagr-s events-only, 320x240, incl. graph build + NMS",
        },
    }))


if __name__ == "__main__":
    main()
