"""Round-5 microbench, part 3: the depth FINISH is the real cost.

microbench13b piece attribution (E=65536, shipped Y0 design):
  front (gather+cand+trio roll+spiral) 5.65 | +at_sel 1.13 | +dot1 1.57
  | +dot2 0.39 | +FINISH 5.48 -> full 14.22 ms/step.

The finish is `ohd = (iota[Q] == depth[..,None]); sum(where(ohd, rowv,
0), -1)` on a [E,15,16] f32 block - tiny FLOPs, 5.5 ms.  Variants:

  C0  Y0 full (re-measure baseline)
  C1  finish = (rowv * ohd.f32).sum(-1)          (mul instead of select)
  C2  finish = take_along_axis(rowv, depth)      (1M width-1 row picks)
  C3  finish = binary-decomposed conditional roll of rowv by depth
      along Q (4x where+roll on [E,15,16]), take column 0
  C4  no finish tensor at all: fold depth into dot2's RHS - transport
      Q+2 columns (v row, fo, cum_prev) with ONE dot as Y0 does, but
      compute src from the rolled LHS instead:
      skip (measured in 13b as Y4-style, lost).
  C4p dot1 packed: 2 transported columns instead of 4
      (fo + 16*cum_prev <= 2^8; jcol + 144*code < 2^17 - both exact
      under bf16x3), decode by mod/div, rest as C1-best finish.
  C5  dot2+finish fused by 16 STATIC q-shards: src = sum_q rowv[..,q] *
      (depth == q) computed column-by-column so no [E,15,16] where
      materializes (unrolled python loop of 16 tiny fused ops).

Run: python scripts/microbench13c.py [fill_pct] [win]
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

    fill = float(sys.argv[1]) / 100 if len(sys.argv) > 1 else 0.03
    win = int(sys.argv[2]) if len(sys.argv) > 2 else 300

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
    m = rng.random(tab.shape) < fill
    tab[m] = rng.integers(0, 30000, size=int(m.sum()))
    tab = jnp.asarray(tab)

    xs = jnp.asarray(rng.integers(0, W, size=(T, E)).astype(np.int32))
    ys = jnp.asarray(rng.integers(0, H, size=(T, E)).astype(np.int32))
    ss = jnp.asarray(np.broadcast_to(
        np.repeat(np.arange(S, dtype=np.int32), C)[None], (T, E)).copy())
    rel_e = jnp.asarray(
        rng.integers(25000, 32000, size=(T, E)).astype(np.int32))
    vmin = rel_e - win

    dyx = [(dy, dx) for dy in range(-R, R + 1) for dx in range(-R, R + 1)]
    idx0 = jnp.asarray(
        np.array([(dy + R) * WW + (dx + R) for (dy, dx) in dyx], np.int32))
    rm_of_sp = rng.permutation(NS).astype(np.int32)
    sp_of_rm = np.argsort(rm_of_sp).astype(np.int32)
    rm_of_sp_j = jnp.asarray(rm_of_sp)
    sp_of_rm_j = jnp.asarray(sp_of_rm)
    code_sp = jnp.asarray(
        (rm_of_sp % n_dy + 64 * (rm_of_sp // n_dy)).astype(np.int32))
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

    def roll_align(arr, a, sign):
        sh = 1
        while sh < pack:
            bit = (a & sh) != 0
            arr = jnp.where(bit[:, None, None, None],
                            jnp.roll(arr, sign * sh, axis=2), arr)
            sh <<= 1
        return arr

    def common_front(bump, xsa):
        """Everything up to (at_sel, any_hit, v, a, per-cell spiral
        tables) - identical across variants."""
        x, y, s, re_, vm = xsa
        x = jnp.where(bump < -10**9, 0, x)
        rows, a = packed_gather(x, y, s)
        v = jnp.where(rows == SENT, -1, rows.astype(jnp.int32))
        cand = (v >= vm[:, None, None]) & (v >= 0) & (v < re_[:, None, None])
        cnt_nc = jnp.sum(cand, axis=-1).astype(jnp.int32)
        fo_nc = jnp.sum(v >= re_[:, None, None], axis=-1)
        trio = roll_align(jnp.stack([cnt_nc, fo_nc], axis=-1)
                          .reshape(E, n_dy, WW, 2), a, -1)
        trio_sp = trio[:, :, :n_dy, :].reshape(E, NS, 2)[:, sp_of_rm_j]
        cnt_sp, fo_sp = trio_sp[..., 0], trio_sp[..., 1]
        cum = jnp.cumsum(cnt_sp, axis=-1)
        at_sel = jnp.logical_not(cum[:, :, None] <= ks) \
            & ((cum - cnt_sp)[:, :, None] <= ks)
        any_hit = cum[:, -1:] > ks
        return v, a, fo_sp, cum, cnt_sp, at_sel, any_hit

    def dot1_4col(a, fo_sp, cum, cnt_sp, at_sel):
        jcol = (idx0[rm_of_sp_j][None, :] + a[:, None]).astype(jnp.float32)
        cols = jnp.stack([
            fo_sp.astype(jnp.float32),
            jnp.broadcast_to(code_sp[None, :].astype(jnp.float32),
                             at_sel.shape[:2]),
            (cum - cnt_sp).astype(jnp.float32),
            jcol,
        ], axis=2)
        picked = lax.dot_general(
            at_sel.astype(jnp.float32), cols,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            precision=lax.Precision.HIGH,
            preferred_element_type=jnp.float32)
        return (picked[..., 0].astype(jnp.int32),
                picked[..., 1].astype(jnp.int32),
                picked[..., 2].astype(jnp.int32),
                picked[..., 3].astype(jnp.int32))

    def dot2_rowv(v, j_sel):
        oh_j = jnp.arange(NC, dtype=jnp.int32)[None, None, :] \
            == j_sel[:, :, None]
        return lax.dot_general(
            oh_j.astype(jnp.float32), v.astype(jnp.float32),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=lax.Precision.HIGH,
            preferred_element_type=jnp.float32)

    def wrap(src, any_hit, code_sel):
        return (src.sum().astype(jnp.int32)
                + jnp.where(any_hit, code_sel, 0).sum() + any_hit.sum())

    # ---- C0: shipped finish (where + sum over Q one-hot) ---------------
    def c0(bump, xsa):
        v, a, fo_sp, cum, cnt_sp, at_sel, any_hit = common_front(bump, xsa)
        fo_sel, code_sel, cum_prev, j_sel = dot1_4col(
            a, fo_sp, cum, cnt_sp, at_sel)
        rowv = dot2_rowv(v, j_sel)
        depth = jnp.clip(fo_sel + ks[None, :] - cum_prev, 0, Q - 1)
        ohd = jnp.arange(Q, dtype=jnp.int32)[None, None, :] \
            == depth[..., None]
        src = jnp.sum(jnp.where(ohd, rowv, 0.0), axis=-1)
        src = jnp.where(any_hit, src, 0.0)
        return wrap(src, any_hit, code_sel)

    # ---- C1: mul-sum finish ---------------------------------------------
    def c1(bump, xsa):
        v, a, fo_sp, cum, cnt_sp, at_sel, any_hit = common_front(bump, xsa)
        fo_sel, code_sel, cum_prev, j_sel = dot1_4col(
            a, fo_sp, cum, cnt_sp, at_sel)
        rowv = dot2_rowv(v, j_sel)
        depth = jnp.clip(fo_sel + ks[None, :] - cum_prev, 0, Q - 1)
        ohd = (jnp.arange(Q, dtype=jnp.int32)[None, None, :]
               == depth[..., None]).astype(jnp.float32)
        src = jnp.sum(rowv * ohd, axis=-1)
        src = jnp.where(any_hit, src, 0.0)
        return wrap(src, any_hit, code_sel)

    # ---- C2: take_along_axis finish --------------------------------------
    def c2(bump, xsa):
        v, a, fo_sp, cum, cnt_sp, at_sel, any_hit = common_front(bump, xsa)
        fo_sel, code_sel, cum_prev, j_sel = dot1_4col(
            a, fo_sp, cum, cnt_sp, at_sel)
        rowv = dot2_rowv(v, j_sel)
        depth = jnp.clip(fo_sel + ks[None, :] - cum_prev, 0, Q - 1)
        src = jnp.take_along_axis(rowv, depth[..., None], axis=-1)[..., 0]
        src = jnp.where(any_hit, src, 0.0)
        return wrap(src, any_hit, code_sel)

    # ---- C3: binary-decomposed roll finish --------------------------------
    def c3(bump, xsa):
        v, a, fo_sp, cum, cnt_sp, at_sel, any_hit = common_front(bump, xsa)
        fo_sel, code_sel, cum_prev, j_sel = dot1_4col(
            a, fo_sp, cum, cnt_sp, at_sel)
        rowv = dot2_rowv(v, j_sel)
        depth = jnp.clip(fo_sel + ks[None, :] - cum_prev, 0, Q - 1)
        sh = 1
        while sh < Q:
            bit = (depth & sh) != 0
            rowv = jnp.where(bit[..., None],
                             jnp.roll(rowv, -sh, axis=-1), rowv)
            sh <<= 1
        src = jnp.where(any_hit, rowv[..., 0], 0.0)
        return wrap(src, any_hit, code_sel)

    # ---- C5: 16 static q-shards (no [E,15,16] select) ---------------------
    def c5(bump, xsa):
        v, a, fo_sp, cum, cnt_sp, at_sel, any_hit = common_front(bump, xsa)
        fo_sel, code_sel, cum_prev, j_sel = dot1_4col(
            a, fo_sp, cum, cnt_sp, at_sel)
        rowv = dot2_rowv(v, j_sel)
        depth = jnp.clip(fo_sel + ks[None, :] - cum_prev, 0, Q - 1)
        src = jnp.zeros(depth.shape, jnp.float32)
        for q in range(Q):
            src = src + rowv[..., q] * (depth == q).astype(jnp.float32)
        src = jnp.where(any_hit, src, 0.0)
        return wrap(src, any_hit, code_sel)

    # ---- C4p: packed 2-column dot1 + best finish (C1 form) ----------------
    def c4p(bump, xsa):
        v, a, fo_sp, cum, cnt_sp, at_sel, any_hit = common_front(bump, xsa)
        jcol_i = idx0[rm_of_sp_j][None, :] + a[:, None]          # < NC=144
        cum_prev_sp = cum - cnt_sp                               # <= NS
        # pack: colA = fo + 16*cum_prev (fo < Q=16, cum_prev <= 14 when
        # selected -> <= 2^8); colB = jcol + 144*code (< 2^17, exact
        # under bf16x3 per the round-4 advisor bound)
        colA = (fo_sp + Q * jnp.minimum(cum_prev_sp, K - 1)) \
            .astype(jnp.float32)
        colB = (jcol_i + NC * code_sp[None, :]).astype(jnp.float32)
        cols = jnp.stack([colA, colB], axis=2)
        picked = lax.dot_general(
            at_sel.astype(jnp.float32), cols,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            precision=lax.Precision.HIGH,
            preferred_element_type=jnp.float32)
        pa = picked[..., 0].astype(jnp.int32)
        pb = picked[..., 1].astype(jnp.int32)
        fo_sel = pa % Q
        cum_prev = pa // Q
        j_sel = pb % NC
        code_sel = pb // NC
        rowv = dot2_rowv(v, j_sel)
        depth = jnp.clip(fo_sel + ks[None, :] - cum_prev, 0, Q - 1)
        ohd = (jnp.arange(Q, dtype=jnp.int32)[None, None, :]
               == depth[..., None]).astype(jnp.float32)
        src = jnp.sum(rowv * ohd, axis=-1)
        src = jnp.where(any_hit, src, 0.0)
        return wrap(src, any_hit, code_sel)

    def scan_over(body):
        def run(bump):
            def f(c, xsa):
                return c + body(bump, xsa), None
            out, _ = lax.scan(f, jnp.int32(0), (xs, ys, ss, rel_e, vmin))
            return out
        return run

    for name, fn in [("C0 where-oh ", c0), ("C1 mul-sum  ", c1),
                     ("C2 take     ", c2), ("C3 roll     ", c3),
                     ("C5 q-shards ", c5), ("C4p packed  ", c4p)]:
        timeit(name, scan_over(fn))


if __name__ == "__main__":
    main()
