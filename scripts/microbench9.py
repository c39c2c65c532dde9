"""Round-4 microbench: PACKED slab gather — is the slice-gather cost
per gathered ROW rather than per byte?

microbench7 measured the (1, 9, 9, QW) slab slice at ~10.3-12.9 ms for
65536 events regardless of QW (Q8 == Q16, u16 ~= i32 x0.84) — i.e. the
cost tracks the 81 gathered rows, not the bytes.  If true, packing
``pack`` adjacent pixels into one table row shrinks the slice to
9 x ceil((9 + pack - 1) / pack) rows (the x-window lands anywhere, so
one extra block covers the alignment) and should cut the gather near-
proportionally:

  pack=1: 81 rows   pack=2: 45   pack=4: 27   pack=8: 18

Run: python scripts/microbench9.py
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

    H, W, R, Q = 240, 320, 4, 16
    S, C = 8, 8192
    E = S * C

    xs = jnp.asarray(rng.integers(0, W, size=(T, E)).astype(np.int32))
    ys = jnp.asarray(rng.integers(0, H, size=(T, E)).astype(np.int32))
    ss = jnp.asarray(np.broadcast_to(
        np.repeat(np.arange(S, dtype=np.int32), C)[None], (T, E)).copy())

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        out = f(jnp.int32(0), *args)
        _ = np.asarray(out)
        best = np.inf
        for i in range(3):
            t0 = time.perf_counter()
            out = f(jnp.int32(i + 1), *args)
            _ = np.asarray(out)
            best = min(best, time.perf_counter() - t0 - ovh)
        print(f"{name}: {best/T*1e3:.3f} ms/step "
              f"({best/T/E*1e9:.1f} ns/event)", flush=True)

    for pack in (1, 2, 4, 8, 16):
        Hp = H + 2 * R
        xblocks = -(-(2 * R + 1 + pack - 1) // pack)   # covers any align
        Wb = (W + 2 * R + pack - 1) // pack + 1        # +1: start clamp room
        tab = jnp.asarray(rng.integers(
            0, 30000, size=(S, Hp, Wb, pack * Q)).astype(np.uint16))
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2, 3))

        def run(bump, tab=tab, pack=pack, xblocks=xblocks, Wb=Wb):
            def body(c, xs_ys_ss):
                x, y, s = xs_ys_ss
                x = jnp.where(bump < -10**9, 0, x)
                bx = jnp.clip((x + R - R) // pack, 0, Wb - xblocks)
                st = jnp.stack(
                    [s, y, bx, jnp.zeros_like(s)], axis=1)
                rows = lax.gather(
                    tab, st, dn,
                    slice_sizes=(1, 2 * R + 1, xblocks, pack * Q),
                    mode=lax.GatherScatterMode.CLIP)
                return c + rows.astype(jnp.int32).sum(), None
            out, _ = lax.scan(body, jnp.int32(0), (xs, ys, ss))
            return out

        nrows = 9 * xblocks
        kb = nrows * pack * Q * 2 / 1024
        timeit(f"pack={pack:2d} ({nrows} rows, {kb:.1f} KB/event)", run)


if __name__ == "__main__":
    main()
