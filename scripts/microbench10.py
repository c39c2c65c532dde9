"""Round-4 microbench: packed-slab SELECTION variants + gather
duplication probe.

microbench9 confirmed the slab slice-gather cost is per gathered ROW:
pack=8 adjacent pixels per table row turns the 81-row spiral fetch
into 18 rows (9 y-rows x 2 x-blocks) at 1.9 ms/step vs 10.2 unpacked.
The open questions this script answers on the real chip:

1. gather duplication: does consuming the gathered rows in several
   fused reductions re-run the (expensive) gather, and does an
   optimization_barrier fix it?  (The in-chain bench shows a +14.3 ms
   "search" delta that isolated passes cannot explain.)
2. selection layout: with pack>1 the spiral cell (dy, dx) of event e
   lives at flat sub-row (dy+R)*(xb*pack) + (x_e % pack) + (dx+R) —
   alignment-dependent.  Variants producing [E, K-1, Q] selected rows:
   V1 align-gather rows to [E, 81, Q] spiral order up front
      (take_along_axis width-Q row gather), then the big-dot select.
   V2 compare-reduce in full NC space, 4-col transport dot carrying
      the selected sub-row index j_sel, then an iota-compare one-hot
      dot for the row transport.
   V3 like V2 but fetch the K-1 rows by take_along_axis instead of
      the one-hot dot.
   V4 windowed one-hot dot: normalize rows to [E, 81, Q] row-major on
      the MXU (out[e,u,dy,q] = sum_o (o == a+u) rows[e,dy,o,q] — the
      _fifo_shift pattern), then the unpacked big-dot select verbatim.

Measured verdict (real chip): V1-V3 are catastrophic (58-100 ms/step —
the per-event [E,144]->[E,81] take_along_axis is a batched minor-axis
gather, the known-toxic primitive); V4 is the winner and is what
serve.py ships.

Run: python scripts/microbench10.py
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
    pack = 8
    xb = 2
    W16 = xb * pack                       # sub-rows per y-row
    NC = (2 * R + 1) * W16                # 144
    Hp = H + 2 * R
    Wb = max(-(-(W + 2 * R) // pack), (W - 1) // pack + xb)
    SENT = np.uint16(2 ** 16 - 1)

    tab = np.full((S, Hp, Wb, pack * Q), SENT, np.uint16)
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

    # spiral-ordered static base indices (toy spiral: row-major here —
    # the cost is order-independent)
    dyx = [(dy, dx) for dy in range(-R, R + 1) for dx in range(-R, R + 1)]
    idx0 = jnp.asarray(
        np.array([(dy + R) * W16 + (dx + R) for (dy, dx) in dyx],
                 np.int32))
    code_cells = jnp.asarray(rng.permutation(81).astype(np.float32))

    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2, 3))

    def packed_gather(x, y, s):
        bx = jnp.clip(x // pack, 0, Wb - xb)
        st = jnp.stack([s, y, bx, jnp.zeros_like(s)], axis=1)
        rows = lax.gather(
            tab, st, dn, slice_sizes=(1, 2 * R + 1, xb, pack * Q),
            mode=lax.GatherScatterMode.CLIP)          # [E, 9, xb, pack*Q]
        a = x - bx * pack                              # alignment in [0, pack)
        return rows.reshape(E, NC, Q), a

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

    # ---- 1. duplication probe: gather + 4 reductions, +- barrier ----
    def dup(bump, barrier):
        def body(c, xsa):
            x, y, s, re_ = xsa
            x = jnp.where(bump < -10**9, 0, x)
            rows, a = packed_gather(x, y, s)
            if barrier:
                rows = lax.optimization_barrier(rows)
            v = jnp.where(rows == SENT, -1, rows.astype(jnp.int32))
            r1 = jnp.sum(v >= re_[:, None, None], axis=-1)
            r2 = jnp.sum((v >= 0) & (v < re_[:, None, None]), axis=-1)
            r3 = v[..., Q - 1]
            r4 = jnp.max(v, axis=-1)
            return c + r1.sum() + r2.sum() + r3.sum() + r4.sum(), None
        out, _ = lax.scan(body, jnp.int32(0), (xs, ys, ss, rel_e))
        return out

    timeit("dup probe, no barrier ", lambda b: dup(b, False))
    timeit("dup probe, barrier    ", lambda b: dup(b, True))

    # ---- 2. selection variants (packed rows -> [E, K-1, Q]) ---------
    def common_sp(v_sp, re_, vm):
        cand = (v_sp >= vm[:, None, None]) & (v_sp >= 0) \
            & (v_sp < re_[:, None, None])
        fo = jnp.sum(v_sp >= re_[:, None, None], axis=-1)
        cnt = jnp.sum(cand, axis=-1).astype(jnp.int32)
        cum = jnp.cumsum(cnt, axis=-1)
        ks = jnp.arange(K - 1, dtype=jnp.int32)
        at_sel = jnp.logical_not(cum[:, :, None] <= ks) \
            & ((cum - cnt)[:, :, None] <= ks)
        any_hit = cum[:, -1:] > ks
        return fo, cnt, cum, at_sel, any_hit, ks

    def v1(bump):
        def body(c, xsa):
            x, y, s, re_, vm = xsa
            x = jnp.where(bump < -10**9, 0, x)
            rows, a = packed_gather(x, y, s)
            rows = lax.optimization_barrier(rows)
            idx = idx0[None, :] + a[:, None]                  # [E, 81]
            r_sp = jnp.take_along_axis(rows, idx[:, :, None], axis=1)
            v = jnp.where(r_sp == SENT, -1, r_sp.astype(jnp.int32))
            fo, cnt, cum, at_sel, any_hit, ks = common_sp(v, re_, vm)
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
            oh = jnp.arange(Q, dtype=jnp.int32)[None, None, :] \
                == depth[..., None]
            src = jnp.sum(jnp.where(oh, rowv, 0.0), axis=-1)
            return c + src.sum().astype(jnp.int32) + any_hit.sum(), None
        out, _ = lax.scan(body, jnp.int32(0),
                          (xs, ys, ss, rel_e, vmin))
        return out

    def v23(bump, dot_fetch):
        def body(c, xsa):
            x, y, s, re_, vm = xsa
            x = jnp.where(bump < -10**9, 0, x)
            rows, a = packed_gather(x, y, s)
            rows = lax.optimization_barrier(rows)
            v = jnp.where(rows == SENT, -1, rows.astype(jnp.int32))
            # per-sub-row reductions over ALL NC (alignment-oblivious)
            cand_nc = (v >= vm[:, None, None]) & (v >= 0) \
                & (v < re_[:, None, None])
            cnt_nc = jnp.sum(cand_nc, axis=-1).astype(jnp.int32)
            fo_nc = jnp.sum(v >= re_[:, None, None], axis=-1)
            # one width-2 row gather maps both to the 81 spiral cells
            both = jnp.stack([cnt_nc, fo_nc], axis=-1)        # [E, NC, 2]
            idx = idx0[None, :] + a[:, None]
            both_sp = jnp.take_along_axis(both, idx[:, :, None], axis=1)
            cnt, fo = both_sp[..., 0], both_sp[..., 1]
            cum = jnp.cumsum(cnt, axis=-1)
            ks = jnp.arange(K - 1, dtype=jnp.int32)
            at_sel = jnp.logical_not(cum[:, :, None] <= ks) \
                & ((cum - cnt)[:, :, None] <= ks)
            any_hit = cum[:, -1:] > ks
            cumcnt = cum - cnt
            jcell = (idx0[None, :] + a[:, None]).astype(jnp.float32)
            cols = jnp.stack([
                fo.astype(jnp.float32),
                jnp.broadcast_to(code_cells[None, :], (E, 81)),
                cumcnt.astype(jnp.float32),
                jcell], axis=2)                               # [E, 81, 4]
            picked = lax.dot_general(
                at_sel.astype(jnp.float32), cols,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                precision=lax.Precision.HIGH,
                preferred_element_type=jnp.float32)           # [E, K-1, 4]
            fo_sel = picked[..., 0].astype(jnp.int32)
            cum_prev = picked[..., 2].astype(jnp.int32)
            j_sel = picked[..., 3].astype(jnp.int32)          # [E, K-1]
            if dot_fetch:
                onehot = (jnp.arange(NC, dtype=jnp.int32)[None, :, None]
                          == j_sel[:, None, :]).astype(jnp.float32)
                rowv = lax.dot_general(
                    onehot, v.astype(jnp.float32),
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    precision=lax.Precision.HIGH,
                    preferred_element_type=jnp.float32)       # [E, K-1, Q]
            else:
                rowv = jnp.take_along_axis(
                    v, j_sel[:, :, None], axis=1).astype(jnp.float32)
            depth = jnp.clip(fo_sel + ks[None, :] - cum_prev, 0, Q - 1)
            oh = jnp.arange(Q, dtype=jnp.int32)[None, None, :] \
                == depth[..., None]
            src = jnp.sum(jnp.where(oh, rowv, 0.0), axis=-1)
            return c + src.sum().astype(jnp.int32) + any_hit.sum(), None
        out, _ = lax.scan(body, jnp.int32(0),
                          (xs, ys, ss, rel_e, vmin))
        return out

    def v4(bump):
        n_dy = 2 * R + 1
        WW = xb * pack

        def body(c, xsa):
            x, y, s, re_, vm = xsa
            x = jnp.where(bump < -10**9, 0, x)
            rows, a = packed_gather(x, y, s)
            r4 = rows.reshape(E, n_dy, WW, Q)
            o = jnp.arange(WW, dtype=jnp.int32)
            u = jnp.arange(n_dy, dtype=jnp.int32)
            oh = (o[None, None, :]
                  == (a[:, None, None] + u[None, :, None])
                  ).astype(jnp.float32)                  # [E, 9u, WWo]
            out = lax.dot_general(
                oh, r4.astype(jnp.float32),
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                precision=lax.Precision.HIGH,
                preferred_element_type=jnp.float32)      # [E, 9u, 9dy, Q]
            r_sp = out.transpose(0, 2, 1, 3).reshape(E, 81, Q)
            v = jnp.where(r_sp == 2.0 ** 16 - 1, -1.0, r_sp
                          ).astype(jnp.int32)
            fo, cnt, cum, at_sel, any_hit, ks = common_sp(v, re_, vm)
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

    if "v4" not in sys.argv[1:]:       # the losers, kept as evidence
        timeit("V1 align-gather rows + big dot   ", v1)
        timeit("V2 NC reduce + j_sel one-hot dot ", lambda b: v23(b, True))
        timeit("V3 NC reduce + j_sel row fetch   ", lambda b: v23(b, False))
    timeit("V4 windowed-dot normalize + select", v4)


if __name__ == "__main__":
    main()
