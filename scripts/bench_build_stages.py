"""Sub-stage timing inside build_graph (scratch profiler — mirrors
graph/build.py's body; keep in sync when the builder changes).
Run: python scripts/bench_build_stages.py [stage...]
stages: prep sort prefix unsort select full
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

T = 8


def main():
    import jax
    import jax.numpy as jnp

    from dagr_tpu.config import DagrConfig
    from dagr_tpu.data.synthetic import random_events
    from dagr_tpu.graph.reference import spiral_offsets

    cfg = DagrConfig()
    H, W = 240, 320
    NV = 45_000
    rng = np.random.default_rng(0)
    evs = [random_events(rng, 1, cfg.n_nodes, width=W, height=H, n_valid=NV)
           for _ in range(T)]
    pos = jnp.stack([e.pos_px() for e in evs])
    msk = jnp.stack([e.mask for e in evs])

    radius = cfg.radius_px(W)
    dt = cfg.delta_t_us()
    K = cfg.max_neighbors
    offs = np.array(spiral_offsets(radius), dtype=np.int32)
    S = offs.shape[0]
    B, N = 1, cfg.n_nodes
    HW = H * W
    PAD = np.int32(B * HW)
    M = B * N

    def upto(stage):
        def body(pos_px, mask):
            x = pos_px[..., 0].astype(jnp.int32)
            y = pos_px[..., 1].astype(jnp.int32)
            t = pos_px[..., 2].astype(jnp.int32)
            b_ids = jnp.arange(B, dtype=jnp.int32)[:, None]
            lin = jnp.where(mask, b_ids * HW + y * W + x, PAD)
            lin_f = lin.reshape(M)
            order = jnp.argsort(lin_f, stable=True).astype(jnp.int32)
            hist = jnp.zeros(B * HW + 1, jnp.int32).at[lin_f].add(
                mask.reshape(M).astype(jnp.int32))
            xn = x.reshape(M)[:, None] + offs[None, :, 0]
            yn = y.reshape(M)[:, None] + offs[None, :, 1]
            inb = ((xn >= 0) & (xn < W) & (yn >= 0) & (yn < H)
                   & mask.reshape(M)[:, None])
            bq = jnp.repeat(jnp.arange(B, dtype=jnp.int32), N)[:, None]
            qpix = jnp.where(inb, bq * HW + yn * W + xn, PAD)
            e_flat = jnp.arange(M, dtype=jnp.int32)
            pix_all = jnp.concatenate([lin_f, lin_f, qpix.reshape(-1)])
            t_all = jnp.concatenate(
                [t.reshape(M), t.reshape(M) + dt, jnp.repeat(t.reshape(M), S)])
            tie_all = jnp.concatenate([
                e_flat * 2 + 1, e_flat + np.int32(2 * M),
                jnp.repeat(e_flat, S) * 2])
            if stage == "prep":
                # sums force full materialization (element [0] alone
                # would let XLA dead-code-eliminate the bulk)
                return (order.sum() + pix_all.sum() + t_all.sum()
                        + tie_all.sum() + hist.sum())
            payload = jnp.arange(pix_all.shape[0], dtype=jnp.int32)
            _, _, tie_s, pay_s = jax.lax.sort(
                (pix_all, t_all, tie_all, payload), num_keys=3)
            if stage == "sort":
                return tie_s.sum() + pay_s.sum() + order.sum()
            is_exp = (tie_s >= np.int32(2 * M)).astype(jnp.int32)
            is_ins = (tie_s & 1) * (1 - is_exp)
            pref_ins = jnp.cumsum(is_ins, dtype=jnp.int32) - is_ins
            pref_exp = jnp.cumsum(is_exp, dtype=jnp.int32) - is_exp
            if stage == "prefix":
                return pref_ins.sum() + pref_exp.sum() + order.sum()
            packed = (pref_ins.astype(jnp.uint32) << 16) \
                | pref_exp.astype(jnp.uint32)
            _, packed_u = jax.lax.sort((pay_s, packed), num_keys=1)
            pq = packed_u[2 * M:]
            cnt_hi = (pq >> 16).astype(jnp.int32).reshape(M, S)
            cnt_t = (pq & 0xFFFF).astype(jnp.int32).reshape(M, S)
            if stage == "unsort":
                return cnt_hi.sum() + cnt_t.sum() + order.sum()
            lo = jnp.maximum(jnp.zeros_like(cnt_t), cnt_t)
            cnt = jnp.where(inb, jnp.maximum(cnt_hi - lo, 0), 0)
            cum = jnp.cumsum(cnt, axis=-1)
            slots = jnp.arange(K - 1, dtype=jnp.int32)
            le = cum[:, :, None] <= slots[None, None, :]
            cum_prev = jnp.sum(cnt[:, :, None] * le, axis=1)
            at_sel = jnp.logical_not(le) & ((cum - cnt)[:, :, None] <= slots)
            hi_sel = jnp.sum(cnt_hi[:, :, None] * at_sel, axis=1)
            any_hit = cum[:, -1:] > slots[None]
            within = slots[None] - cum_prev
            sorted_pos = jnp.clip(hi_sel - 1 - within, 0, M - 1)
            src = jnp.take_along_axis(
                order.reshape(1, -1), sorted_pos.reshape(1, -1), axis=1)
            return src.sum() + any_hit.sum()

        def run(pos, msk, bump):
            def step(c, pm):
                p, m = pm
                p = p.at[..., 2].add(c)
                return c + body(p, m).astype(jnp.int32), ()
            c, _ = jax.lax.scan(step, bump, (pos, msk))
            return c
        return jax.jit(run)

    probe = jax.jit(lambda x: x + 1)
    _ = np.asarray(probe(jnp.zeros((), jnp.int32)))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(probe(jnp.int32(i)))
        ts.append(time.perf_counter() - t0)
    ovh = min(ts)

    for st in (sys.argv[1:] or ["prep", "sort", "prefix", "unsort",
                                "select"]):
        f = upto(st)
        for i in range(2):
            _ = np.asarray(f(pos, msk, jnp.int32(i)))
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(f(pos, msk, jnp.int32(100 + i)))
            ts.append(time.perf_counter() - t0)
        print(f"{st:8s} cum {(min(ts)-ovh)/T*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
