"""Headline benchmark: sync event->detection inference throughput on
one chip (flagship DAGR-S geometry, 45k valid events per window).

Prints ONE JSON line. vs_baseline is relative to the 10 Mevents/s/chip
north-star target (BASELINE.json); >1.0 beats it.

Protocol mirrors the reference's sync eval path
(reference: scripts/run_test.py — forward on a full event window, then
decode + NMS), graph build included.  Measurement notes: the axon
runtime memoizes repeated identical executions, so the loop feeds a
DIFFERENT event window each iteration and chains a data dependency
between steps — timings are true steady-state device time.
"""
import json
import time

import numpy as np


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
    windows = [
        jax.device_put(random_events(rng, 1, cfg.n_nodes, width=W, height=H,
                                     n_valid=NV))
        for _ in range(8)
    ]
    variables = jax.device_put(
        model.init(jax.random.key(0), windows[0], train=False))

    @jax.jit
    def pipeline(variables, events):
        raw = model.apply(variables, events, train=False)
        return detect(raw, cfg, H, W)

    # warmup / compile (np.asarray forces real execution: on the axon
    # backend block_until_ready does not reliably block)
    _ = np.asarray(pipeline(variables, windows[0])["scores"])

    iters = 12
    t0 = time.perf_counter()
    for i in range(iters):
        w = windows[1 + i % (len(windows) - 1)]
        out = pipeline(variables, w)
        _ = np.asarray(out["scores"][0, 0])      # materialize every step
    dt = (time.perf_counter() - t0) / iters

    mev_s = NV / dt / 1e6

    # streaming engine: per-chunk event->detection latency
    from dagr_tpu.streaming.engine import StreamingDetector, chunk_events

    chunk = 256
    eng = StreamingDetector(cfg, H, W, chunk=chunk, count_flops=False)
    step = eng.make_step(variables["params"], variables["batch_stats"])
    st = eng.init_state()
    pos_px = np.asarray(windows[0].pos_px()[0])
    feat = np.asarray(windows[0].feat[0])
    chunks = chunk_events(pos_px[:NV], feat[:NV], chunk)
    for c in chunks[:40]:                        # warm fill + compile
        st, raw, _ = step(st, *c)
    _ = np.asarray(raw[0, 0, 0])
    lat = []
    for c in chunks[40:48]:
        t0 = time.perf_counter()
        st, raw, _ = step(st, *c)
        _ = np.asarray(raw[0, 0, 0])
        lat.append(time.perf_counter() - t0)
    p50 = sorted(lat)[len(lat) // 2] * 1e3

    print(json.dumps({
        "metric": "sync_inference_throughput",
        "value": round(mev_s, 3),
        "unit": "Mevents/s/chip",
        "vs_baseline": round(mev_s / 10.0, 3),
        "detail": {
            "window_events": NV,
            "steady_ms_per_window": round(dt * 1e3, 2),
            "streaming_p50_latency_ms_per_256ev_chunk": round(p50, 2),
            "model": "dagr-s events-only, 320x240, incl. graph build + NMS",
        },
    }))


if __name__ == "__main__":
    main()
