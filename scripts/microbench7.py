"""Round-4 microbench: what actually drives the slab-search cost at the
flagship serving point (slabv Q=16 S=8 c8192: gather 13.4 ms + candidate
pass 14.3 ms of the 45 ms step — bench_serve.py sweep).

Axes under test:
  1. queue table DTYPE (i32 vs u16) — the round-3 knee data
     (scripts/microbench3.py) says gather cost is table-SIZE driven
     (~10 MB fast/slow knee), so u16 may win by shrinking the table,
     not by moving fewer payload bytes (vt->v at the same Q measured
     the SAME 205 ns/event).
  2. queue depth Q (16 vs 8) — table size again.
  3. query ORDER (event order vs pixel-sorted) — pixel-sorted starts
     make consecutive slices overlap, so cache locality may restore
     the fast regime even for a >10 MB table.
  4. the candidate pass (in_dt/cand/cnt/first_older reductions over the
     gathered [E, 81, Q] rows) on i32 vs u16 rows — elementwise, so
     this one SHOULD scale with bytes.

Run: python scripts/microbench7.py
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
    R = 4
    Hp, Wp = H + 2 * R, W + 2 * R
    S, C = 8, 8192
    E = S * C

    # query pixels: bench-density random events
    xs = rng.integers(0, W, size=(T, E)).astype(np.int32)
    ys = rng.integers(0, H, size=(T, E)).astype(np.int32)
    ss = np.broadcast_to(
        np.repeat(np.arange(S, dtype=np.int32), C)[None], (T, E)).copy()
    # pixel-sorted variant of the same queries (per chunk)
    key = ss * (H * W) + ys * W + xs
    srt = np.argsort(key, axis=1, kind="stable")
    xs_s = np.take_along_axis(xs, srt, axis=1)
    ys_s = np.take_along_axis(ys, srt, axis=1)
    ss_s = np.take_along_axis(ss, srt, axis=1)

    def mk_starts(ss_, ys_, xs_):
        return jnp.asarray(np.stack(
            [ss_, ys_, xs_, np.zeros_like(ss_)], axis=2))      # [T, E, 4]

    starts_u = mk_starts(ss, ys, xs)
    starts_s = mk_starts(ss_s, ys_s, xs_s)

    def slab_gather(bump, table, starts, Q, npw):
        """Chained slice gathers; npw = payload words per slot."""
        QW = Q * npw
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2, 3))

        def body(c, st):
            st = jnp.where(bump < -10**9, 0, st)      # unfoldable perturb
            rows = lax.gather(
                table, st, dn, slice_sizes=(1, 2 * R + 1, 2 * R + 1, QW),
                mode=lax.GatherScatterMode.CLIP)
            return c + rows.astype(jnp.int32).sum(), None
        out, _ = lax.scan(body, jnp.int32(0), starts)
        return out

    def cand_pass(bump, table, starts, Q, dtype):
        """gather + the serve candidate pass (in_dt/cand/cnt/fo/deep)."""
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2, 3))

        def body(c, st):
            st = jnp.where(bump < -10**9, 0, st)
            rows = lax.gather(
                table, st, dn, slice_sizes=(1, 2 * R + 1, 2 * R + 1, Q),
                mode=lax.GatherScatterMode.CLIP).reshape(E, 81, Q)
            v = rows.astype(jnp.int32)
            vid_e = (c + jnp.arange(E, dtype=jnp.int32))[:, None, None]
            vmin = (vid_e[..., 0] - 3000)
            valid = v < (2**16 - 1 if dtype == jnp.uint16 else 2**30)
            cand = valid & (v >= vmin[..., None]) & (v < vid_e)
            fo = jnp.sum(valid & (v >= vid_e), axis=-1)
            cnt = jnp.sum(cand, axis=-1).astype(jnp.int32)
            deep = jnp.sum(valid[..., Q - 1] & (v[..., Q - 1] >= vmin))
            return c + cnt.sum() + fo.sum() + deep, None
        out, _ = lax.scan(body, jnp.int32(0), starts)
        return out

    for Q, npw, dtype, tag in [
        (16, 1, jnp.int32, "i32 Q16 v  (41.6MB)"),
        (16, 2, jnp.int32, "i32 Q16 vt (83MB)"),
        (16, 1, jnp.uint16, "u16 Q16 v  (20.8MB)"),
        (8, 1, jnp.uint16, "u16 Q8  v  (10.4MB)"),
        (8, 1, jnp.int32, "i32 Q8  v  (20.8MB)"),
    ]:
        QW = Q * npw
        tab = jnp.asarray(
            rng.integers(0, 30000, size=(S, Hp, Wp, QW)), dtype=dtype)
        timeit(f"slab gather {tag} event-order",
               lambda b, t=tab, q=Q, n=npw: slab_gather(b, t, starts_u, q, n),
               n_units=T * E)
        timeit(f"slab gather {tag} pixel-sorted",
               lambda b, t=tab, q=Q, n=npw: slab_gather(b, t, starts_s, q, n),
               n_units=T * E)
        if npw == 1:
            timeit(f"gather+cand  {tag} event-order",
                   lambda b, t=tab, q=Q, d=dtype: cand_pass(
                       b, t, starts_u, q, d), n_units=T * E)

    # per-stream split slabs (1.3-5.2 MB each, under the knee), u16 Q16
    tab = jnp.asarray(
        rng.integers(0, 30000, size=(S, Hp, Wp, 16)), dtype=jnp.uint16)

    def split_gather(bump, table, starts):
        dn3 = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1, 2))

        def body(c, st):
            st = jnp.where(bump < -10**9, 0, st)
            outs = []
            for s in range(S):
                slab = lax.optimization_barrier(table[s])
                st3 = st[s * C:(s + 1) * C, 1:]           # (y, x, 0)
                outs.append(lax.gather(
                    slab, st3, dn3, slice_sizes=(9, 9, 16),
                    mode=lax.GatherScatterMode.CLIP))
            return c + sum(o.astype(jnp.int32).sum() for o in outs), None
        out, _ = lax.scan(body, jnp.int32(0), starts)
        return out

    timeit("slab gather u16 Q16 per-stream split (2.6MB each) sorted",
           lambda b: split_gather(b, tab, starts_s), n_units=T * E)


if __name__ == "__main__":
    main()
