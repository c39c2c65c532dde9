"""Round-4 microbench: packed-slab SELECT block variants.

In-chain attribution (bench_serve.py sweep, slabv16p8 S=8 c8192 te4)
puts the select delta at 9.3 ms/step: two batched tiny dots (the 4-col
transport [E,81,15]x[E,81,4] and the iota one-hot row fetch
[E,15,144]x[E,144,16] at Precision.HIGH).  Batched tiny dots lower to
per-batch matmuls, so per-MAC cost is awful — variants:

  X1 current: 4-col HIGH dot + oh_j HIGH fetch dot.
  X2 X1 with both dots in DEFAULT (single-pass bf16) precision over
     hi/lo BYTE-split columns — each operand < 2^8 is exact in bf16,
     the one-hot contraction sums one term, accumulation is f32, so
     the transport stays exact at ~1/3 the per-MAC cost (2x columns).
  X3 alignment-roll the Q-deep rows (log2(pack) conditional rolls)
     then ONE unpacked-style (Q+3)-col HIGH dot.
  X4 X3 with the dot in hi/lo bf16 (2Q+3 cols, default precision).

All variants produce identical (src, code, any_hit) checksums.

Run: python scripts/microbench12.py
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
    pack, xb = 8, 2
    WW = xb * pack
    n_dy = 2 * R + 1
    NC = n_dy * WW
    NS = 81
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

    dyx = [(dy, dx) for dy in range(-R, R + 1) for dx in range(-R, R + 1)]
    idx0 = jnp.asarray(
        np.array([(dy + R) * WW + (dx + R) for (dy, dx) in dyx], np.int32))
    code_cells = jnp.asarray(rng.permutation(NS).astype(np.float32))
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2, 3))
    ks = jnp.arange(K - 1, dtype=jnp.int32)

    def packed_gather(x, y, s):
        bx = jnp.clip(x // pack, 0, Wb - xb)
        st = jnp.stack([s, y, bx, jnp.zeros_like(s)], axis=1)
        rows = lax.gather(
            tab, st, dn, slice_sizes=(1, n_dy, xb, pack * Q),
            mode=lax.GatherScatterMode.CLIP)
        return (lax.optimization_barrier(rows.reshape(E, NC, Q)),
                x - bx * pack)

    def timeit(name, fn):
        f = jax.jit(fn)
        out = f(jnp.int32(0))
        ref = np.asarray(out)
        best = np.inf
        for i in range(3):
            t0 = time.perf_counter()
            out = f(jnp.int32(i + 1))
            _ = np.asarray(out)
            best = min(best, time.perf_counter() - t0 - ovh)
        print(f"{name}: {best/T*1e3:.3f} ms/step  (chk {int(ref)})",
              flush=True)

    def nc_phase(v, re_, vm):
        """Alignment-oblivious per-sub-row reductions + spiral land."""
        cand = (v >= vm[:, None, None]) & (v >= 0) & (v < re_[:, None, None])
        cnt_nc = jnp.sum(cand, axis=-1).astype(jnp.int32)
        fo_nc = jnp.sum(v >= re_[:, None, None], axis=-1)
        return cnt_nc, fo_nc

    def land(arr, a, ncol):
        """[E, NC, ncol] -> [E, NS, ncol] by conditional rolls."""
        arr = arr.reshape(E, n_dy, WW, ncol)
        sh = 1
        while sh < pack:
            bit = (a & sh) != 0
            arr = jnp.where(bit[:, None, None, None],
                            jnp.roll(arr, -sh, axis=2), arr)
            sh <<= 1
        return arr[:, :, :n_dy, :].reshape(E, n_dy * n_dy, ncol)

    def spiral_phase(cnt_sp, fo_sp):
        cum = jnp.cumsum(cnt_sp, axis=-1)
        at_sel = jnp.logical_not(cum[:, :, None] <= ks) \
            & ((cum - cnt_sp)[:, :, None] <= ks)
        any_hit = cum[:, -1:] > ks
        return cum, at_sel, any_hit

    def finish(rowv, fo_sel, cum_prev):
        depth = jnp.clip(fo_sel + ks[None, :] - cum_prev, 0, Q - 1)
        ohd = jnp.arange(Q, dtype=jnp.int32)[None, None, :] \
            == depth[..., None]
        return jnp.sum(jnp.where(ohd, rowv, 0.0), axis=-1)

    def x12(bump, bytesplit):
        def body(c, xsa):
            x, y, s, re_, vm = xsa
            x = jnp.where(bump < -10**9, 0, x)
            rows, a = packed_gather(x, y, s)
            v = jnp.where(rows == SENT, -1, rows.astype(jnp.int32))
            cnt_nc, fo_nc = nc_phase(v, re_, vm)
            trio = land(jnp.stack([cnt_nc, fo_nc], axis=-1), a, 2)
            cnt_sp, fo_sp = trio[..., 0], trio[..., 1]
            cum, at_sel, any_hit = spiral_phase(cnt_sp, fo_sp)
            jcol = (idx0[None, :] + a[:, None]).astype(jnp.float32)
            colv = [fo_sp.astype(jnp.float32),
                    jnp.broadcast_to(code_cells[None, :], (E, NS)),
                    (cum - cnt_sp).astype(jnp.float32), jcol]
            if bytesplit:
                cols = jnp.stack(
                    sum([[c_ // 256, c_ % 256] for c_ in colv], []),
                    axis=2)
                picked = lax.dot_general(
                    at_sel.astype(jnp.float32), cols,
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                picked = picked[..., 0::2] * 256 + picked[..., 1::2]
            else:
                cols = jnp.stack(colv, axis=2)
                picked = lax.dot_general(
                    at_sel.astype(jnp.float32), cols,
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    precision=lax.Precision.HIGH,
                    preferred_element_type=jnp.float32)
            fo_sel = picked[..., 0].astype(jnp.int32)
            code_sel = picked[..., 1].astype(jnp.int32)
            cum_prev = picked[..., 2].astype(jnp.int32)
            j_sel = picked[..., 3].astype(jnp.int32)
            oh_j = jnp.arange(NC, dtype=jnp.int32)[None, None, :] \
                == j_sel[:, :, None]
            if bytesplit:
                # u16 rows split into exact bf16 bytes; sentinel ->
                # hi=255,lo=255 recombines to 65535 -> mapped after
                vb = jnp.concatenate(
                    [rows // 256, rows % 256], axis=-1).astype(jnp.float32)
                pick2 = lax.dot_general(
                    oh_j.astype(jnp.float32), vb,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                rowu = pick2[..., :Q] * 256 + pick2[..., Q:]
                rowv = jnp.where(rowu == 2.0 ** 16 - 1, -1.0, rowu)
            else:
                rowv = lax.dot_general(
                    oh_j.astype(jnp.float32), v.astype(jnp.float32),
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    precision=lax.Precision.HIGH,
                    preferred_element_type=jnp.float32)
            src = jnp.where(any_hit, finish(rowv, fo_sel, cum_prev), 0.0)
            code_sel = jnp.where(any_hit, code_sel, 0)
            return (c + src.sum().astype(jnp.int32) + code_sel.sum()
                    + any_hit.sum()), None
        out, _ = lax.scan(body, jnp.int32(0), (xs, ys, ss, rel_e, vmin))
        return out

    def x34(bump, bytesplit):
        def body(c, xsa):
            x, y, s, re_, vm = xsa
            x = jnp.where(bump < -10**9, 0, x)
            rows, a = packed_gather(x, y, s)
            # roll the Q-deep rows themselves into row-major order
            r_sp = land(rows, a, Q)
            v = jnp.where(r_sp == SENT, -1, r_sp.astype(jnp.int32))
            cand = (v >= vm[:, None, None]) & (v >= 0) \
                & (v < re_[:, None, None])
            cnt_sp = jnp.sum(cand, axis=-1).astype(jnp.int32)
            fo_sp = jnp.sum(v >= re_[:, None, None], axis=-1)
            cum, at_sel, any_hit = spiral_phase(cnt_sp, fo_sp)
            cumcnt = cum - cnt_sp
            if bytesplit:
                # split the UNMAPPED u16 (sentinel 255,255 -> 65535),
                # map to -1 after recombination
                cols = jnp.concatenate([
                    (r_sp // 256).astype(jnp.float32),
                    (r_sp % 256).astype(jnp.float32),
                    fo_sp[..., None].astype(jnp.float32),
                    jnp.broadcast_to(
                        code_cells[None, :, None], (E, NS, 1)),
                    cumcnt[..., None].astype(jnp.float32)], axis=2)
                picked = lax.dot_general(
                    at_sel.astype(jnp.float32), cols,
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                rowu = picked[..., :Q] * 256 + picked[..., Q:2 * Q]
                rowv = jnp.where(rowu == 2.0 ** 16 - 1, -1.0, rowu)
                rest = picked[..., 2 * Q:]
            else:
                cols = jnp.concatenate([
                    v.astype(jnp.float32),
                    fo_sp[..., None].astype(jnp.float32),
                    jnp.broadcast_to(
                        code_cells[None, :, None], (E, NS, 1)),
                    cumcnt[..., None].astype(jnp.float32)], axis=2)
                picked = lax.dot_general(
                    at_sel.astype(jnp.float32), cols,
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    precision=lax.Precision.HIGH,
                    preferred_element_type=jnp.float32)
                rowv = picked[..., :Q]
                rest = picked[..., Q:]
            fo_sel = rest[..., 0].astype(jnp.int32)
            code_sel = rest[..., 1].astype(jnp.int32)
            cum_prev = rest[..., 2].astype(jnp.int32)
            src = jnp.where(any_hit, finish(rowv, fo_sel, cum_prev), 0.0)
            code_sel = jnp.where(any_hit, code_sel, 0)
            return (c + src.sum().astype(jnp.int32) + code_sel.sum()
                    + any_hit.sum()), None
        out, _ = lax.scan(body, jnp.int32(0), (xs, ys, ss, rel_e, vmin))
        return out

    # NOTE on X2/X4 byte-split of v: hi/lo of the SENTINEL-mapped v
    # (-1) would not byte-split, so X4 splits v AFTER mapping -> -1 //
    # 256 in python-floor semantics... to keep all variants
    # checksum-identical we map sentinels AFTER recombination in X2 and
    # keep X4's split on the pre-mapped u16 the same way via r_sp.
    timeit("X1 two HIGH dots (current)      ", lambda b: x12(b, False))
    timeit("X2 two byte-split bf16 dots     ", lambda b: x12(b, True))
    timeit("X3 roll rows + one HIGH big dot ", lambda b: x34(b, False))
    timeit("X4 roll rows + byte-split big   ", lambda b: x34(b, True))


if __name__ == "__main__":
    main()
