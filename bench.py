"""Headline benchmark: sync event->detection inference throughput on
one chip (flagship DAGR-S geometry, 45k valid events per window).

Prints ONE JSON line. vs_baseline is relative to the 10 Mevents/s/chip
north-star target (BASELINE.json); >1.0 beats it.

Protocol mirrors the reference's sync eval path
(reference: scripts/run_test.py — forward on a full event window, then
decode + NMS), with the graph build included in the timed region since
the reference's CUDA graph build also runs per window.
"""
import json
import time

import numpy as np


def main():
    import jax

    from dagr_tpu.config import DagrConfig
    from dagr_tpu.data.synthetic import random_events
    from dagr_tpu.models.dagr import DAGR, detect

    cfg = DagrConfig()
    H, W = 240, 320
    NV = 45_000
    model = DAGR(cfg, height=H, width=W)
    rng = np.random.default_rng(0)
    ev = random_events(rng, 1, cfg.n_nodes, width=W, height=H, n_valid=NV)
    variables = model.init(jax.random.key(0), ev, train=False)

    @jax.jit
    def pipeline(variables, events):
        raw = model.apply(variables, events, train=False)
        return detect(raw, cfg, H, W)

    ev = jax.device_put(ev)
    variables = jax.device_put(variables)

    # warmup / compile
    jax.block_until_ready(pipeline(variables, ev))

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipeline(variables, ev)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    mev_s = NV / dt / 1e6
    print(json.dumps({
        "metric": "sync_inference_throughput",
        "value": round(mev_s, 2),
        "unit": "Mevents/s/chip",
        "vs_baseline": round(mev_s / 10.0, 2),
        "detail": {
            "window_events": NV,
            "steady_ms_per_window": round(dt * 1e3, 3),
            "model": "dagr-s events-only, 320x240, incl. graph build + NMS",
        },
    }))


if __name__ == "__main__":
    main()
