"""Diagnose which serving coverage-certificate part fires on the
bench_serve long multi-window stream (cover[0] = bounded-state cert,
cover[1] = feature-ring staleness cert).

Run: python scripts/diag_serve_cover.py [S] [chunk] [mode] [Q]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    from dagr_tpu.config import DagrConfig
    from dagr_tpu.data.synthetic import random_events
    from dagr_tpu.models.dagr import DAGR
    from dagr_tpu.streaming.serve import MultiStreamServer, chunk_streams

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    mode = sys.argv[3] if len(sys.argv) > 3 else "slab"
    qdepth = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    cfg = DagrConfig()
    H, W = 240, 320
    NV = 45_000
    model = DAGR(cfg, height=H, width=W)
    rng = np.random.default_rng(0)
    ev = random_events(rng, 1, cfg.n_nodes, width=W, height=H, n_valid=NV)
    variables = model.init(jax.random.key(0), ev, train=False)

    n_win = 7 * 8 * chunk // NV + 1       # same horizon as bench_serve T=8
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
    srv = MultiStreamServer(cfg, H, W, n_streams=S, chunk=chunk,
                            search_mode="slab" if base == "slabv" else base,
                            queue_depth=qdepth,
                            queue_payload="v" if base == "slabv" else "vt")
    step = srv.make_step(variables["params"], variables["batch_stats"])
    st = srv.init_state()
    for i, c in enumerate(chunks):
        st, raw, info = step(st, *map(np.asarray, c))
        parts = np.asarray(info["cover_parts"])
        if not parts.all():
            print(f"step {i}: cover_parts={parts.tolist()}", flush=True)
    print(f"final coverage_ok={bool(np.asarray(st.coverage_ok))}",
          flush=True)


if __name__ == "__main__":
    main()
