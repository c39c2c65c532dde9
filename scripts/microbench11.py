"""Round-4 microbench: FLATTENED-X slab gather.

The per-pixel FIFO table [nrow, Q] viewed as [S, Hp, Wp*Q] makes the
spiral neighborhood's x-extent CONTIGUOUS: one (1, 2R+1, (2R+1)*Q)
slice starting at (s, y, x*Q) fetches the whole 9x9xQ block in NINE
gathered rows — the minimum possible rows AND bytes, already row-major,
with none of the packed-mode alignment machinery (cf. microbench9/10).

Variants (v16 payload, S=8 c8192, 9x9 radius):
  A. 4D unpacked gather: 81 rows/event      (the round-3 layout)
  B. flattened-x 3D gather: 9 rows/event    (this idea)
  C. B + the full big-dot selection in-chain (what serve.py would run)

Run: python scripts/microbench11.py
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

    H, W, R, Q, K = 240, 320, 4, 16, 16
    S, C = 8, 8192
    E = S * C
    Hp, Wp = H + 2 * R, W + 2 * R
    n_dy = 2 * R + 1
    SENT = np.uint16(2 ** 16 - 1)

    tab = np.full((S, Hp, Wp, Q), SENT, np.uint16)
    m = rng.random(tab.shape) < 0.03
    tab[m] = rng.integers(0, 30000, size=int(m.sum()))
    tab = jnp.asarray(tab)

    xs = jnp.asarray(rng.integers(0, W, size=(T, E)).astype(np.int32))
    ys = jnp.asarray(rng.integers(0, H, size=(T, E)).astype(np.int32))
    ss = jnp.asarray(np.broadcast_to(
        np.repeat(np.arange(S, dtype=np.int32), C)[None], (T, E)).copy())
    rel_e = jnp.asarray(
        rng.integers(25000, 32000, size=(T, E)).astype(np.int32))
    vmin = rel_e - 3000
    code_cells = jnp.asarray(rng.permutation(81).astype(np.float32))

    def timeit(name, fn):
        f = jax.jit(fn)
        out = f(jnp.int32(0))
        _ = np.asarray(out)
        best = np.inf
        for i in range(3):
            t0 = time.perf_counter()
            out = f(jnp.int32(i + 1))
            _ = np.asarray(out)
            best = min(best, time.perf_counter() - t0 - ovh)
        print(f"{name}: {best/T*1e3:.3f} ms/step", flush=True)

    dn4 = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2, 3))
    dn3 = lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2))
    tab3 = tab.reshape(S, Hp, Wp * Q)

    def g4(x, y, s):
        st = jnp.stack([s, y, x, jnp.zeros_like(s)], axis=1)
        return lax.gather(
            tab, st, dn4, slice_sizes=(1, n_dy, n_dy, Q),
            mode=lax.GatherScatterMode.CLIP).reshape(E, 81, Q)

    def g3(x, y, s):
        st = jnp.stack([s, y, x * Q], axis=1)
        return lax.gather(
            tab3, st, dn3, slice_sizes=(1, n_dy, n_dy * Q),
            mode=lax.GatherScatterMode.CLIP).reshape(E, 81, Q)

    def probe_gather(bump, g):
        def body(c, xsa):
            x, y, s = xsa
            x = jnp.where(bump < -10**9, 0, x)
            rows = g(x, y, s)
            return c + rows.astype(jnp.int32).sum(), None
        out, _ = lax.scan(body, jnp.int32(0), (xs, ys, ss))
        return out

    timeit("A 4D gather, 81 rows/event ", lambda b: probe_gather(b, g4))
    timeit("B 3D flat-x gather, 9 rows ", lambda b: probe_gather(b, g3))

    def full_select(bump):
        ks = jnp.arange(K - 1, dtype=jnp.int32)

        def body(c, xsa):
            x, y, s, re_, vm = xsa
            x = jnp.where(bump < -10**9, 0, x)
            rows = lax.optimization_barrier(g3(x, y, s))
            v = jnp.where(rows == SENT, -1, rows.astype(jnp.int32))
            cand = (v >= vm[:, None, None]) & (v >= 0) \
                & (v < re_[:, None, None])
            fo = jnp.sum(v >= re_[:, None, None], axis=-1)
            cnt = jnp.sum(cand, axis=-1).astype(jnp.int32)
            cum = jnp.cumsum(cnt, axis=-1)
            at_sel = jnp.logical_not(cum[:, :, None] <= ks) \
                & ((cum - cnt)[:, :, None] <= ks)
            any_hit = cum[:, -1:] > ks
            cumcnt = cum - cnt
            cols = jnp.concatenate([
                v.astype(jnp.float32),
                fo[..., None].astype(jnp.float32),
                jnp.broadcast_to(code_cells[None, :, None], (E, 81, 1)),
                cumcnt[..., None].astype(jnp.float32)], axis=2)
            picked = lax.dot_general(
                at_sel.astype(jnp.float32), cols,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                precision=lax.Precision.HIGH,
                preferred_element_type=jnp.float32)
            rowv = picked[..., :Q]
            fo_sel = picked[..., Q].astype(jnp.int32)
            cum_prev = picked[..., Q + 2].astype(jnp.int32)
            depth = jnp.clip(fo_sel + ks[None, :] - cum_prev, 0, Q - 1)
            ohd = jnp.arange(Q, dtype=jnp.int32)[None, None, :] \
                == depth[..., None]
            src = jnp.sum(jnp.where(ohd, rowv, 0.0), axis=-1)
            return c + src.sum().astype(jnp.int32) + any_hit.sum(), None
        out, _ = lax.scan(body, jnp.int32(0),
                          (xs, ys, ss, rel_e, vmin))
        return out

    timeit("C flat-x gather + big-dot select", full_select)


if __name__ == "__main__":
    main()
