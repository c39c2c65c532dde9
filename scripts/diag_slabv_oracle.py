"""Pinpoint the slabv bounded-state certificate firing: simulate the
FIFO + vmin semantics in numpy on the bench_serve stream and compare
against the real (eager CPU) serve step at the failing chunks.

Run: python scripts/diag_slabv_oracle.py [S] [chunk] [Q] [n_steps]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["JAX_PLATFORMS"] = "cpu"


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from dagr_tpu.config import DagrConfig
    from dagr_tpu.data.synthetic import random_events
    from dagr_tpu.graph.reference import spiral_offsets
    from dagr_tpu.streaming.serve import MultiStreamServer, chunk_streams

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    Q = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_steps = int(sys.argv[4]) if len(sys.argv) > 4 else 34
    cfg = DagrConfig()
    H, W = 240, 320
    NV = 45_000
    rng = np.random.default_rng(0)
    _ = random_events(rng, 1, cfg.n_nodes, width=W, height=H, n_valid=NV)

    n_win = 7 * 8 * chunk // NV + 1        # same stream as diag_serve_cover
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
    chunks = chunk_streams(pos, feat, chunk)[:n_steps]

    dt = cfg.delta_t_us()
    R = int(cfg.radius * W + 1)
    offs = np.array(spiral_offsets(R), np.int32)

    # numpy FIFO oracle: per (stream, pixel) list of vids, newest first
    fifos = [dict() for _ in range(S)]
    t_all = [list() for _ in range(S)]     # global per-stream times

    for step, (p, f, v) in enumerate(chunks):
        C = p.shape[1]
        # insert whole chunk first (insert-then-search)
        for s in range(S):
            for c in range(C):
                # vid numbers ALL chunk slots (the engine does too), so
                # t_all must stay aligned even on padded chunks: invalid
                # slots forward-fill the last real time, mirroring the
                # engine's cummax fill of t_ring (round-3 advisor, low)
                if not v[s, c]:
                    t_all[s].append(t_all[s][-1] if t_all[s]
                                    else -(2 ** 30))
                    continue
                x, y, t = int(p[s, c, 0]), int(p[s, c, 1]), int(p[s, c, 2])
                vid = step * C + c
                row = fifos[s].setdefault((x, y), [])
                row.insert(0, vid)
                del row[Q:]
                t_all[s].append(t)
        # search: deepest-slot-in-dt test per event neighborhood
        ta = [np.asarray(t_all[s]) for s in range(S)]
        fired = []
        for s in range(S):
            for c in range(C):
                if not v[s, c]:
                    continue
                x, y, t = int(p[s, c, 0]), int(p[s, c, 1]), int(p[s, c, 2])
                thr = t - dt
                vmin = int(np.searchsorted(ta[s], thr, side="left"))
                for dx, dy in offs:
                    xx, yy = x + dx, y + dy
                    if not (0 <= xx < W and 0 <= yy < H):
                        continue
                    row = fifos[s].get((xx, yy))
                    if row is not None and len(row) == Q and row[Q - 1] >= vmin:
                        fired.append((s, c, x, y, t, xx, yy, vmin,
                                      list(row)))
        if fired:
            s, c, x, y, t, xx, yy, vmin, row = fired[0]
            print(f"step {step}: ORACLE deep-miss x{len(fired)}; first: "
                  f"stream {s} ev {c} @({x},{y}) t={t} nbr ({xx},{yy}) "
                  f"vmin={vmin} row={row}", flush=True)
            ts = [t_all[s][vid] for vid in row]
            print(f"  row times: {ts} (thr={t - dt})", flush=True)
    print("oracle done", flush=True)

    # real engine pass on the same chunks (eager CPU), certificate parts
    from dagr_tpu.models.dagr import DAGR
    from dagr_tpu.data.synthetic import random_events as _re
    rng2 = np.random.default_rng(0)
    ev0 = _re(rng2, 1, cfg.n_nodes, width=W, height=H, n_valid=NV)
    model = DAGR(cfg, height=H, width=W)
    variables = model.init(jax.random.key(0), ev0, train=False)
    srv = MultiStreamServer(cfg, H, W, n_streams=S, chunk=chunk,
                            search_mode="slab", queue_depth=Q,
                            queue_payload="v")
    step_j = srv.make_step(variables["params"], variables["batch_stats"])
    st = srv.init_state()
    for i, ch in enumerate(chunks):
        st, raw, info = step_j(st, *map(np.asarray, ch))
        parts = np.asarray(info["cover_parts"])
        if not parts.all():
            print(f"step {i}: ENGINE cover_parts={parts.tolist()}",
                  flush=True)
    print(f"engine final coverage_ok={bool(np.asarray(st.coverage_ok))}",
          flush=True)


if __name__ == "__main__":
    main()
