"""Round-5 microbench, part 4: layout-level attacks on the depth
finish.

13c result: where/mul/take/roll/q-shard variants all lose or tie —
the finish cost is structural.  Hypothesis: [E,15,16] f32 pads its
16-wide minor axis to 128 lanes (and 15 -> 16 sublanes), so every
elementwise op on rowv moves ~8.5x the logical bytes.  Variants:

  D0  baseline (13c C1 mul-sum form)
  D6  transposed finish: rowv -> [K-1, Q, E] (E minor), ohd/mul/sum in
      that layout, transpose the small [K-1, E] result back
  D11 flat finish: rowv -> [E, 240]; mask m[e,c] = (c%Q ==
      depth[e,c//Q]) built in the flat layout (240 -> 256 lanes,
      1.07x pad); per-slot sums via ONE static [240,15] 0/1 projection
      matmul on the MXU
  D9  16 unrolled per-depth dots: src += dot(oh_j * (depth==q), v[.,.,q])
      per q - no [E,15,16] tensor ever exists

Run: python scripts/microbench13d.py [fill_pct] [win]
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

    # ---- D0: 13c C1 baseline -------------------------------------------
    def d0(bump, xsa):
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

    # ---- D6: transposed finish -------------------------------------------
    def d6(bump, xsa):
        v, a, fo_sp, cum, cnt_sp, at_sel, any_hit = common_front(bump, xsa)
        fo_sel, code_sel, cum_prev, j_sel = dot1_4col(
            a, fo_sp, cum, cnt_sp, at_sel)
        rowv = dot2_rowv(v, j_sel)
        rowv_t = jnp.transpose(rowv, (1, 2, 0))           # [K-1, Q, E]
        depth_t = jnp.transpose(
            jnp.clip(fo_sel + ks[None, :] - cum_prev, 0, Q - 1))  # [K-1, E]
        ohd_t = (jnp.arange(Q, dtype=jnp.int32)[None, :, None]
                 == depth_t[:, None, :]).astype(jnp.float32)
        src_t = jnp.sum(rowv_t * ohd_t, axis=1)           # [K-1, E]
        src = jnp.where(any_hit, jnp.transpose(src_t), 0.0)
        return wrap(src, any_hit, code_sel)

    # ---- D11: flat-[E,240] finish + static projection matmul -------------
    proj = np.zeros((Q * (K - 1), K - 1), np.float32)
    for k in range(K - 1):
        proj[k * Q:(k + 1) * Q, k] = 1.0
    proj_j = jnp.asarray(proj)

    def d11(bump, xsa):
        v, a, fo_sp, cum, cnt_sp, at_sel, any_hit = common_front(bump, xsa)
        fo_sel, code_sel, cum_prev, j_sel = dot1_4col(
            a, fo_sp, cum, cnt_sp, at_sel)
        rowv = dot2_rowv(v, j_sel).reshape(E, (K - 1) * Q)
        depth = jnp.clip(fo_sel + ks[None, :] - cum_prev, 0, Q - 1)
        dflat = jnp.repeat(depth, Q, axis=1)              # [E, 240]
        qpat = jnp.tile(jnp.arange(Q, dtype=jnp.int32), K - 1)[None, :]
        msel = (qpat == dflat).astype(jnp.float32)
        src = jnp.dot(rowv * msel, proj_j,
                      preferred_element_type=jnp.float32)  # [E, K-1]
        src = jnp.where(any_hit, src, 0.0)
        return wrap(src, any_hit, code_sel)

    # ---- D9: 16 unrolled per-depth dots -----------------------------------
    def d9(bump, xsa):
        v, a, fo_sp, cum, cnt_sp, at_sel, any_hit = common_front(bump, xsa)
        fo_sel, code_sel, cum_prev, j_sel = dot1_4col(
            a, fo_sp, cum, cnt_sp, at_sel)
        depth = jnp.clip(fo_sel + ks[None, :] - cum_prev, 0, Q - 1)
        oh_j = (jnp.arange(NC, dtype=jnp.int32)[None, None, :]
                == j_sel[:, :, None])
        vf = v.astype(jnp.float32)
        src = jnp.zeros(depth.shape, jnp.float32)
        for q in range(Q):
            lhs = (oh_j & (depth == q)[..., None]).astype(jnp.float32)
            src = src + lax.dot_general(
                lhs, vf[..., q],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                precision=lax.Precision.HIGH,
                preferred_element_type=jnp.float32)
        src = jnp.where(any_hit, src, 0.0)
        return wrap(src, any_hit, code_sel)

    def scan_over(body):
        def run(bump):
            def f(c, xsa):
                return c + body(bump, xsa), None
            out, _ = lax.scan(f, jnp.int32(0), (xs, ys, ss, rel_e, vmin))
            return out
        return run

    for name, fn in [("D0 base     ", d0), ("D6 transpose", d6),
                     ("D11 flat240 ", d11), ("D9 16 dots  ", d9)]:
        timeit(name, scan_over(fn))


if __name__ == "__main__":
    main()
