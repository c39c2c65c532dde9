"""Round-3 microbench: queue-table gathers/scatters and small-E
selection — the serve-engine primitives.  Chains T distinct iterations
inside one jit (unfoldable index perturbation) and subtracts the
empty-call overhead, per the honest-timing recipe.

Run: python scripts/microbench3.py
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

    # ---- gather: [E] random idx from [N, Wd] i32 tables --------------
    def gather_bench(N, Wd, E):
        tab = jnp.asarray(rng.integers(0, 100, (N, Wd), np.int32))
        base = jnp.asarray(rng.integers(0, N, (E,), np.int32))

        def fn(bump, tab, base):
            def body(c, i):
                idx = jnp.clip((base + c + i) % N, 0, N - 1)
                rows = jnp.take_along_axis(tab, idx[:, None], axis=0)
                return c + rows[0, 0], rows.sum()
            c, s = jax.lax.scan(body, bump, jnp.arange(T, dtype=jnp.int32))
            return s

        timeit(f"gather [{E}] from [{N},{Wd}]", fn, tab, base, n_units=E)

    gather_bench(614_402, 32, 82_944)    # big table, few idx: is TABLE
                                         # size or idx count the driver?
    gather_bench(307_202, 32, 663_552)   # half-size table, many idx
    gather_bench(153_602, 32, 663_552)
    gather_bench(76_802, 32, 663_552)    # S=1-size table, S=8 idx count

    # sliced-copy trick: gather from an explicitly materialized slice
    # of a big table (stream slab) — if XLA materializes the slice, the
    # inner gather runs in the fast small-table regime
    def sliced_gather_bench(N, Wd, E, S):
        tab = jnp.asarray(rng.integers(0, 100, (S, N, Wd), np.int32))
        base = jnp.asarray(rng.integers(0, N, (S, E // S), np.int32))

        def fn(bump, tab, base):
            def body(c, i):
                tot = jnp.zeros((), jnp.int32)
                for s in range(S):
                    slab = jax.lax.optimization_barrier(tab[s])
                    idx = jnp.clip((base[s] + c + i) % N, 0, N - 1)
                    rows = jnp.take_along_axis(slab, idx[:, None], axis=0)
                    tot = tot + rows.sum()
                return c + tot % 7, tot
            c, s = jax.lax.scan(body, bump, jnp.arange(T, dtype=jnp.int32))
            return s

        timeit(f"sliced gather [{E}] from {S}x[{N},{Wd}]", fn, tab, base,
               n_units=E)

    sliced_gather_bench(76_802, 32, 663_552, 8)

    # the serve mask/count block: rows [E, 81, 2Q] -> cand/cnt/first
    def mask_bench(E, NS, Q):
        rows = jnp.asarray(
            rng.integers(-1, 50_000, (E, NS, 2 * Q), np.int32))
        tq = jnp.asarray(rng.integers(0, 1_000_000, (E,), np.int32))

        def fn(bump, rows, tq):
            def body(c, i):
                r = rows + c + i
                vid_g, t_g = r[..., :Q], r[..., Q:]
                te = (tq + i)[:, None, None]
                cand = (t_g >= te - 10_000) & (vid_g >= 0) & (vid_g < te)
                fo = jnp.sum(vid_g >= te, axis=-1)
                cnt = jnp.sum(cand, axis=-1)
                return c + cnt[0, 0], (cnt.sum() + fo.sum())
            c, s = jax.lax.scan(body, bump, jnp.arange(T, dtype=jnp.int32))
            return s

        timeit(f"maskblock [{E},{NS},{Q}]", fn, rows, tq, n_units=E)

    mask_bench(1024, 81, 16)
    mask_bench(8192, 81, 16)

    # ---- minor-axis gather: [E, K] from [E, F] -----------------------
    def minor_bench(E, F, K):
        tab = jnp.asarray(rng.integers(0, 100, (E, F), np.int32))
        base = jnp.asarray(rng.integers(0, F, (E, K), np.int32))

        def fn(bump, tab, base):
            def body(c, i):
                idx = (base + c + i) % F
                rows = jnp.take_along_axis(tab, idx, axis=1)
                return c + rows[0, 0], rows.sum()
            c, s = jax.lax.scan(body, bump, jnp.arange(T, dtype=jnp.int32))
            return s

        timeit(f"minor gather [{E},{K}] from [{E},{F}]", fn, tab, base,
               n_units=E * K)

    minor_bench(1024, 1296, 15)          # serve src_vid pick (c1024)
    minor_bench(8192, 1296, 15)

    # ---- scatter rows: [E] targets into [N, Wd] ----------------------
    def scatter_bench(N, Wd, E):
        tab = jnp.asarray(rng.integers(0, 100, (N, Wd), np.int32))
        base = jnp.asarray(rng.integers(0, N, (E,), np.int32))
        rows = jnp.asarray(rng.integers(0, 100, (E, Wd), np.int32))

        def fn(bump, tab, base, rows):
            def body(c, i):
                idx = jnp.clip((base + i) % N, 0, N - 1)
                t2 = c.at[idx].set(rows + i)
                return t2, t2[0, 0]
            c, s = jax.lax.scan(body, tab + bump,
                                jnp.arange(T, dtype=jnp.int32))
            return s

        timeit(f"scatter [{E}] rows into [{N},{Wd}]", fn, tab, base, rows,
               n_units=E)

    scatter_bench(76_802, 32, 1024)
    scatter_bench(614_402, 32, 8192)

    # ---- selection compare-reduce at small vs large E ----------------
    def select_bench(E, S, K):
        cnt = jnp.asarray(rng.integers(0, 3, (E, S), np.int32))

        def fn(bump, cnt):
            def body(c, i):
                cn = cnt + (i - i)  # keep shape; perturb via c
                cn = jnp.where(c < -1e9, 0, cn)
                cum = jnp.cumsum(cn, axis=-1)
                ks = jnp.arange(K, dtype=jnp.int32)
                le = cum[:, :, None] <= ks[None, None, :]
                cum_prev = jnp.sum(cn[:, :, None] * le, axis=1)
                at_sel = jnp.logical_not(le) & ((cum - cn)[:, :, None] <= ks)
                sel = jnp.sum(
                    jnp.arange(S, dtype=jnp.int32)[None, :, None] * at_sel,
                    axis=1)
                return c + sel[0, 0].astype(jnp.float32), \
                    (sel.sum() + cum_prev.sum())
            c, s = jax.lax.scan(body, bump.astype(jnp.float32),
                                jnp.arange(T, dtype=jnp.int32))
            return s

        timeit(f"select [{E},{S},{K}]", fn, cnt, n_units=E)

    select_bench(1024, 81, 15)
    select_bench(8192, 81, 15)
    select_bench(45056, 81, 15)


if __name__ == "__main__":
    main()
