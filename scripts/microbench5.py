"""Round-3c microbench: the slab-mode FIFO *insert* primitives at
serving scale (streaming/serve.py _search_slab).  The insert stage
measured ~28 ms/step at S=8 c4096 (bench_serve.py stage=insert) while
its parts were expected to sum to ~4 ms — this pins which primitive is
pathological: the 4-op chunk sort, the old-row gather from the 82 MB
queue table, the minor-axis FIFO shift, or the 32k-row scatter back.

Honest-timing recipe (CLAUDE.md): T distinct iterations chained in one
jit, np.asarray materialization, empty-call overhead subtracted.

Run: python scripts/microbench5.py
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
    from jax import lax

    probe = jax.jit(lambda x: x + 1)
    _ = np.asarray(probe(jnp.zeros((), jnp.float32)))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(probe(jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    ovh = min(ts)
    print(f"overhead {ovh*1e3:.1f} ms", flush=True)
    rng = np.random.default_rng(0)

    def timeit(name, fn, *args, n_units=1.0):
        f = jax.jit(fn)
        out = f(jnp.int32(0), *args)
        _ = np.asarray(out)
        best = np.inf
        for i in range(3):
            t0 = time.perf_counter()
            out = f(jnp.int32(i + 1), *args)
            _ = np.asarray(out)
            best = min(best, time.perf_counter() - t0 - ovh)
        per = best / T
        print(f"{name}: {per*1e3:.3f} ms  ({per/n_units*1e9:.2f} ns/unit)",
              flush=True)

    S, C, Q = 8, 4096, 16
    E = S * C
    H, W, R = 240, 320, 4
    Hp, Wp = H + 2 * R, W + 2 * R
    NROW = S * Hp * Wp                      # 641,472 rows x 32 = 82 MB

    spix = jnp.asarray(rng.integers(0, NROW, (E,), np.int32))
    vidf = jnp.asarray(np.arange(E, dtype=np.int32))
    tf = jnp.asarray(rng.integers(0, 1 << 20, (E,), np.int32))
    tab = jnp.asarray(rng.integers(0, 100, (NROW + 1, 2 * Q), np.int32))
    rows = jnp.asarray(rng.integers(0, 100, (E, 2 * Q), np.int32))

    # 1. the 4-operand 2-key chunk sort
    def sort4(bump, spix, vidf, tf):
        def body(c, i):
            a, b, d, e = lax.sort(
                (spix + c + i, jnp.arange(E, dtype=jnp.int32), vidf, tf),
                num_keys=2)
            return c + a[0] % 3, a[-1] + b[-1] + d[-1] + e[-1]
        c, s = jax.lax.scan(body, bump, jnp.arange(T, dtype=jnp.int32))
        return s
    timeit(f"sort4op2key E={E}", sort4, spix, vidf, tf, n_units=E)

    # 2. old-row gather: E rows of width 32 from the 82 MB table
    def rowgather(bump, tab, spix):
        def body(c, i):
            idx = (spix + c + i) % NROW
            got = jnp.take_along_axis(tab, idx[:, None], axis=0)
            return c + got[0, 0] % 3, got.sum()
        c, s = jax.lax.scan(body, bump, jnp.arange(T, dtype=jnp.int32))
        return s
    timeit(f"rowgather E={E} from [{NROW},{2*Q}] (82MB)", rowgather, tab,
           spix, n_units=E)

    # 2b. same gather but per-stream slabs (optimization_barrier), the
    # microbench3 knee fix: 8 x 10.3 MB tables
    tab4 = jnp.asarray(
        rng.integers(0, 100, (S, Hp * Wp, 2 * Q), np.int32))
    spix_s = jnp.asarray(rng.integers(0, Hp * Wp, (S, C), np.int32))

    def rowgather_slab(bump, tab4, spix_s):
        def body(c, i):
            tot = jnp.zeros((), jnp.int32)
            for s in range(S):
                slab = lax.optimization_barrier(tab4[s])
                idx = (spix_s[s] + c + i) % (Hp * Wp)
                got = jnp.take_along_axis(slab, idx[:, None], axis=0)
                tot = tot + got.sum()
            return c + tot % 3, tot
        c, s = jax.lax.scan(body, bump, jnp.arange(T, dtype=jnp.int32))
        return s
    timeit(f"rowgather-slab {S}x{C} from {S}x[{Hp*Wp},{2*Q}] (10MB each)",
           rowgather_slab, tab4, spix_s, n_units=E)

    # 3. minor-axis FIFO shift: take [E,Q] at per-row offsets from [E,Q]
    sh = jnp.asarray(rng.integers(0, Q, (E, 1), np.int32))

    def minorshift(bump, rows, sh):
        qs = jnp.arange(Q, dtype=jnp.int32)
        def body(c, i):
            off = jnp.clip(qs[None, :] - (sh + c % 2 + i % 2), 0, Q - 1)
            a = jnp.take_along_axis(rows[:, :Q], off, axis=1)
            b = jnp.take_along_axis(rows[:, Q:], off, axis=1)
            return c + a[0, 0] % 3, a.sum() + b.sum()
        c, s = jax.lax.scan(body, bump, jnp.arange(T, dtype=jnp.int32))
        return s
    timeit(f"minor-shift 2x[E,{Q}]", minorshift, rows, sh, n_units=E)

    # 3b. shift via one-hot matmul instead of take_along_axis
    def minorshift_oh(bump, rows, sh):
        qs = jnp.arange(Q, dtype=jnp.int32)
        def body(c, i):
            off = jnp.clip(qs[None, :] - (sh + c % 2 + i % 2), 0, Q - 1)
            oh = (off[:, :, None] == qs[None, None, :]).astype(jnp.float32)
            r2 = rows.astype(jnp.float32).reshape(E, 2, Q)
            picked = lax.dot_general(
                oh, r2, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            return c + picked[0, 0, 0].astype(jnp.int32) % 3, picked.sum()
        c, s = jax.lax.scan(body, bump, jnp.arange(T, dtype=jnp.int32))
        return s
    timeit(f"minor-shift-onehot [E,{Q},{Q}]x[E,{Q},2Q]", minorshift_oh,
           rows, sh, n_units=E)

    # 4. scatter E rows into the 82 MB table (mode=drop, donated carry)
    def scatter(bump, tab, spix, rows):
        def body(t, i):
            idx = (spix + i) % NROW
            t = t.at[idx].set(rows + i, mode="drop")
            return t, t[0, 0]
        t, s = jax.lax.scan(body, tab, jnp.arange(T, dtype=jnp.int32))
        return s.sum() + t.sum()
    timeit(f"rowscatter E={E} into [{NROW},{2*Q}] (82MB)", scatter, tab,
           spix, rows, n_units=E)

    # 4b. per-stream slab scatter (8 x 10.3 MB)
    rows_s = jnp.asarray(rng.integers(0, 100, (S, C, 2 * Q), np.int32))

    def scatter_slab(bump, tab4, spix_s, rows_s):
        def body(t, i):
            outs = []
            tot = jnp.zeros((), jnp.int32)
            for s in range(S):
                slab = lax.optimization_barrier(t[s])
                idx = (spix_s[s] + i) % (Hp * Wp)
                slab = slab.at[idx].set(rows_s[s] + i, mode="drop")
                outs.append(slab)
                tot = tot + slab[0, 0]
            return jnp.stack(outs), tot
        t, s = jax.lax.scan(body, tab4, jnp.arange(T, dtype=jnp.int32))
        return s.sum() + t.sum()
    timeit(f"rowscatter-slab {S}x{C} into {S}x[{Hp*Wp},{2*Q}]",
           scatter_slab, tab4, spix_s, rows_s, n_units=E)

    # 5. combined gather+shift+scatter (the real insert inner loop)
    def insert_all(bump, tab, spix, vidf, tf):
        qs = jnp.arange(Q, dtype=jnp.int32)
        def body(t, i):
            sp, _, v_s, t_s = lax.sort(
                (spix + i, jnp.arange(E, dtype=jnp.int32), vidf, tf),
                num_keys=2)
            sp = sp % NROW
            first = jnp.concatenate(
                [jnp.ones((1,), bool), sp[1:] != sp[:-1]])
            idx_e = jnp.arange(E, dtype=jnp.int32)
            run_start = jax.lax.associative_scan(
                jnp.maximum, jnp.where(first, idx_e, 0))
            ecnt = jnp.minimum(idx_e - run_start + 1, Q)
            take_new = qs[None, :] < ecnt[:, None]
            src_i = jnp.clip(idx_e[:, None] - qs[None, :], 0, E - 1)
            vt = jnp.stack([v_s, t_s], axis=1)
            got = jnp.take_along_axis(
                vt, src_i.reshape(-1)[:, None], axis=0).reshape(E, Q, 2)
            orow = jnp.take_along_axis(t, sp[:, None], axis=0)
            osh = jnp.clip(qs[None, :] - ecnt[:, None], 0, Q - 1)
            old_v = jnp.take_along_axis(orow[:, :Q], osh, axis=1)
            old_t = jnp.take_along_axis(orow[:, Q:], osh, axis=1)
            new_row = jnp.concatenate([
                jnp.where(take_new, got[..., 0], old_v),
                jnp.where(take_new, got[..., 1], old_t)], axis=1)
            is_last = jnp.concatenate(
                [sp[1:] != sp[:-1], jnp.ones((1,), bool)])
            tgt = jnp.where(is_last, sp, NROW + 1)
            t = t.at[tgt].set(new_row, mode="drop")
            return t, t[0, 0]
        t, s = jax.lax.scan(body, tab, jnp.arange(T, dtype=jnp.int32))
        return s.sum() + t.sum()
    timeit(f"insert-all E={E} [{NROW},{2*Q}]", insert_all, tab, spix,
           vidf, tf, n_units=E)

    # 5b. insert with the one-hot FIFO shift (streaming/serve.py
    # _fifo_shift) — the production formulation after microbench5
    def insert_oh(bump, tab, spix, vidf, tf):
        qs = jnp.arange(Q, dtype=jnp.int32)
        def body(t, i):
            sp, _, v_s, t_s = lax.sort(
                (spix + i, jnp.arange(E, dtype=jnp.int32), vidf, tf),
                num_keys=2)
            sp = sp % NROW
            first = jnp.concatenate(
                [jnp.ones((1,), bool), sp[1:] != sp[:-1]])
            idx_e = jnp.arange(E, dtype=jnp.int32)
            run_start = jax.lax.associative_scan(
                jnp.maximum, jnp.where(first, idx_e, 0))
            ecnt = jnp.minimum(idx_e - run_start + 1, Q)
            take_new = qs[None, :] < ecnt[:, None]
            src_i = jnp.clip(idx_e[:, None] - qs[None, :], 0, E - 1)
            vt = jnp.stack([v_s, t_s], axis=1)
            got = jnp.take_along_axis(
                vt, src_i.reshape(-1)[:, None], axis=0).reshape(E, Q, 2)
            orow = jnp.take_along_axis(t, sp[:, None], axis=0)
            osh = jnp.clip(qs[None, :] - ecnt[:, None], 0, Q - 1)
            oh = (osh[:, :, None] == qs[None, None, :]).astype(jnp.float32)
            r = orow.reshape(E, 2, Q)
            hi = lax.shift_right_arithmetic(r, 16).astype(jnp.float32)
            lo = (r & 0xFFFF).astype(jnp.float32)
            parts = jnp.concatenate([hi, lo], axis=1)
            picked = lax.dot_general(
                oh, parts, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            merged = (picked[..., :2] << 16) | picked[..., 2:]
            old_v, old_t = merged[..., 0], merged[..., 1]
            new_row = jnp.concatenate([
                jnp.where(take_new, got[..., 0], old_v),
                jnp.where(take_new, got[..., 1], old_t)], axis=1)
            is_last = jnp.concatenate(
                [sp[1:] != sp[:-1], jnp.ones((1,), bool)])
            tgt = jnp.where(is_last, sp, NROW + 1)
            t = t.at[tgt].set(new_row, mode="drop")
            return t, t[0, 0]
        t, s = jax.lax.scan(body, tab, jnp.arange(T, dtype=jnp.int32))
        return s.sum() + t.sum()
    timeit(f"insert-oh E={E} [{NROW},{2*Q}]", insert_oh, tab, spix,
           vidf, tf, n_units=E)

    # 5c. same but the scan ALSO carries untouched ServeState-sized
    # arrays (xin, x1, cell tables) — does a dead carry cost per step?
    NRr, C1, G1 = 8192, 64, 2400
    dead = (jnp.zeros((S, NRr, 3), jnp.float32),
            jnp.zeros((S, NRr, C1), jnp.float32),
            jnp.zeros((S, G1, C1), jnp.float32),
            jnp.zeros((S, G1, 3), jnp.float32),
            jnp.zeros((S, G1, 9), bool))

    def insert_oh_carry(bump, tab, spix, vidf, tf, dead):
        qs = jnp.arange(Q, dtype=jnp.int32)
        def body2(carry, i):
            t, d = carry
            sp, _, v_s, t_s = lax.sort(
                (spix + i, jnp.arange(E, dtype=jnp.int32), vidf, tf),
                num_keys=2)
            sp = sp % NROW
            first = jnp.concatenate(
                [jnp.ones((1,), bool), sp[1:] != sp[:-1]])
            idx_e = jnp.arange(E, dtype=jnp.int32)
            run_start = jax.lax.associative_scan(
                jnp.maximum, jnp.where(first, idx_e, 0))
            ecnt = jnp.minimum(idx_e - run_start + 1, Q)
            take_new = qs[None, :] < ecnt[:, None]
            src_i = jnp.clip(idx_e[:, None] - qs[None, :], 0, E - 1)
            vt = jnp.stack([v_s, t_s], axis=1)
            got = jnp.take_along_axis(
                vt, src_i.reshape(-1)[:, None], axis=0).reshape(E, Q, 2)
            orow = jnp.take_along_axis(t, sp[:, None], axis=0)
            osh = jnp.clip(qs[None, :] - ecnt[:, None], 0, Q - 1)
            oh = (osh[:, :, None] == qs[None, None, :]).astype(jnp.float32)
            r = orow.reshape(E, 2, Q)
            hi = lax.shift_right_arithmetic(r, 16).astype(jnp.float32)
            lo = (r & 0xFFFF).astype(jnp.float32)
            parts = jnp.concatenate([hi, lo], axis=1)
            picked = lax.dot_general(
                oh, parts, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            merged = (picked[..., :2] << 16) | picked[..., 2:]
            new_row = jnp.concatenate([
                jnp.where(take_new, got[..., 0], merged[..., 0]),
                jnp.where(take_new, got[..., 1], merged[..., 1])], axis=1)
            is_last = jnp.concatenate(
                [sp[1:] != sp[:-1], jnp.ones((1,), bool)])
            tgt = jnp.where(is_last, sp, NROW + 1)
            t = t.at[tgt].set(new_row, mode="drop")
            return (t, d), t[0, 0]
        (t, d), s = jax.lax.scan(
            body2, (tab, dead), jnp.arange(T, dtype=jnp.int32))
        return s.sum() + t.sum() + sum(x.sum() for x in d[:1])
    timeit(f"insert-oh+dead-carry E={E}", insert_oh_carry, tab, spix,
           vidf, tf, dead, n_units=E)


if __name__ == "__main__":
    main()
