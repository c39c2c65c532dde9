"""Round-3b microbench: neighborhood SLICE gathers vs row gathers, and
one-hot dot_general picks — candidate primitives for the queue-mode
serving search (streaming/serve.py).

Hypothesis under test: ``lax.gather`` with ``slice_sizes=(9, 9, 2Q)``
from a padded per-stream ``[H+8, W+8, 2Q]`` queue table charges per
OFFSET, not per touched row — one slice per event would replace the 81
row gathers per event (the measured 0.36 us/event wall of queue-mode
search, scripts/microbench3.py).

Honest-timing recipe throughout (CLAUDE.md): T distinct iterations
chained in one jit, unfoldable perturbation, np.asarray materialization,
empty-call overhead subtracted.

Run: python scripts/microbench4.py
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

    H, W = 240, 320
    Hp, Wp = H + 8, W + 8

    def neigh_slice(slab, ys, xs, Wd):
        starts = jnp.stack(
            [ys, xs, jnp.zeros_like(ys)], axis=1)            # [C, 3]
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1, 2))
        return lax.gather(slab, starts, dn, slice_sizes=(9, 9, Wd),
                          mode=lax.GatherScatterMode.CLIP)

    # ---- per-stream slabs, one 9x9xWd slice per event ----------------
    def slice_bench(S, C, Wd):
        tab = jnp.asarray(
            rng.integers(0, 100, (S, Hp, Wp, Wd), np.int32))
        ys = jnp.asarray(rng.integers(0, H, (S, C), np.int32))
        xs = jnp.asarray(rng.integers(0, W, (S, C), np.int32))

        def fn(bump, tab, ys, xs):
            def body(c, i):
                tot = jnp.zeros((), jnp.int32)
                for s in range(S):
                    slab = lax.optimization_barrier(tab[s])
                    y2 = (ys[s] + c + i) % H
                    x2 = (xs[s] + i) % W
                    rows = neigh_slice(slab, y2, x2, Wd)
                    tot = tot + rows.sum()
                return c + tot % 7, tot
            c, s = jax.lax.scan(body, bump, jnp.arange(T, dtype=jnp.int32))
            return s

        mb = S * Hp * Wp * Wd * 4 / 1e6
        timeit(f"slice9x9 [{S}x{C}] from {S}x[{Hp},{Wp},{Wd}] ({mb:.0f}MB)",
               fn, tab, ys, xs, n_units=S * C)

    slice_bench(1, 8192, 32)       # Q=16, one stream (10.4 MB slab)
    slice_bench(8, 8192, 32)       # Q=16, 8 streams
    slice_bench(8, 8192, 16)       # Q=8 (5.2 MB slabs)
    slice_bench(8, 2048, 32)       # smaller chunk

    # monolithic 4D gather (1,9,9,Wd) — is the unrolled slab loop needed?
    def slice4d_bench(S, C, Wd):
        tab = jnp.asarray(
            rng.integers(0, 100, (S, Hp, Wp, Wd), np.int32))
        ss = jnp.asarray(
            np.repeat(np.arange(S, dtype=np.int32), C))
        ys = jnp.asarray(rng.integers(0, H, (S * C,), np.int32))
        xs = jnp.asarray(rng.integers(0, W, (S * C,), np.int32))

        def fn(bump, tab, ss, ys, xs):
            dn = lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
                start_index_map=(0, 1, 2, 3))
            def body(c, i):
                y2 = (ys + c + i) % H
                x2 = (xs + i) % W
                starts = jnp.stack(
                    [ss, y2, x2, jnp.zeros_like(ss)], axis=1)
                rows = lax.gather(tab, starts, dn,
                                  slice_sizes=(1, 9, 9, Wd),
                                  mode=lax.GatherScatterMode.CLIP)
                return c + rows.sum() % 7, rows.sum()
            c, s = jax.lax.scan(body, bump, jnp.arange(T, dtype=jnp.int32))
            return s

        timeit(f"slice4d [{S * C}] from [{S},{Hp},{Wp},{Wd}]",
               fn, tab, ss, ys, xs, n_units=S * C)

    slice4d_bench(8, 8192, 32)

    # ---- one-hot pick: dot_general vs minor-axis take_along_axis -----
    def onehot_pick_bench(E, NS, K, Wd):
        sel = np.zeros((E, NS, K), np.float32)
        sel[np.arange(E)[:, None], rng.integers(0, NS, (E, K)),
            np.arange(K)[None, :]] = 1.0
        sel = jnp.asarray(sel)
        rows = jnp.asarray(
            rng.integers(0, 60_000, (E, NS, Wd), np.int32).astype(
                np.float32))

        def fn(bump, sel, rows):
            def body(c, i):
                r = rows + (i - i) + jnp.where(c < -1e9, 0.0, 0.0)
                r = r + c * 0.0 + i
                out = lax.dot_general(
                    sel, r, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)   # [E, K, Wd]
                return c + out[0, 0, 0], out.sum()
            c, s = jax.lax.scan(body, bump.astype(jnp.float32),
                                jnp.arange(T, dtype=jnp.int32))
            return s

        timeit(f"onehot-pick [{E},{NS},{K}]x[{E},{NS},{Wd}]", fn, sel,
               rows, n_units=E * K)

    onehot_pick_bench(8192, 81, 15, 32)
    onehot_pick_bench(65536, 81, 15, 32)

    # ---- permutation matmul: cnt [E, 81] @ P [81, 81] ----------------
    def perm_bench(E, NS):
        cnt = jnp.asarray(
            rng.integers(0, 16, (E, NS), np.int32).astype(np.float32))
        P = jnp.asarray(np.eye(NS, dtype=np.float32)[
            rng.permutation(NS)])

        def fn(bump, cnt, P):
            def body(c, i):
                out = (cnt + c * 0.0 + i) @ P
                return c + out[0, 0], out.sum()
            c, s = jax.lax.scan(body, bump.astype(jnp.float32),
                                jnp.arange(T, dtype=jnp.int32))
            return s

        timeit(f"perm [{E},{NS}]@[{NS},{NS}]", fn, cnt, P, n_units=E)

    perm_bench(65536, 81)

    # ---- maskblock at serving scale (E=65536) ------------------------
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

    mask_bench(65536, 81, 16)
    mask_bench(65536, 81, 8)


if __name__ == "__main__":
    main()
