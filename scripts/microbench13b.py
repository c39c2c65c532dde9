"""Round-5 microbench, part 2: attribute Y0's select cost per piece and
test the single-dot NC-space selection.

microbench13 outcome: byte-cutting (bf16 / compaction / rolled rows)
LOSES — the two f32 HIGH dots stand.  So attribute Y0's 8.4 ms select
delta piece by piece (at_sel build, transport dot 1, oh_j + fetch dot
2, depth finish) and test Y4:

  Y4 single-dot selection IN NC SPACE: the selection one-hot is built
     directly over the 144 packed sub-rows (valid-window mask from the
     alignment, cum transported back from spiral space by rolling ONE
     small [E,9,16] column), so ONE HIGH dot [E,K-1,NC] x [E,NC,Q+3]
     transports the fetched rows AND (fo, code, cum_prev) together —
     no oh_j construction, no second dot, no jcol column, and the
     3-column trio roll shrinks to two 1-column rolls (cnt fwd, cum
     back).

Run: python scripts/microbench13b.py [fill_pct] [win]
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
    # spiral permutation stand-in over ROW-MAJOR cell index: rm_of_sp[i]
    # = row-major position of spiral cell i (a fixed permutation)
    rm_of_sp = rng.permutation(NS).astype(np.int32)
    sp_of_rm = np.argsort(rm_of_sp).astype(np.int32)
    rm_of_sp_j = jnp.asarray(rm_of_sp)
    sp_of_rm_j = jnp.asarray(sp_of_rm)
    # cell code of spiral cell i == its row-major (dx+R) + 64*(dy+R)
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
        """Binary-decomposed conditional roll of [E, n_dy, WW, ncol] by
        -a (sign=-1, pack->aligned) or +a (sign=+1, aligned->pack)."""
        sh = 1
        while sh < pack:
            bit = (a & sh) != 0
            arr = jnp.where(bit[:, None, None, None],
                            jnp.roll(arr, sign * sh, axis=2), arr)
            sh <<= 1
        return arr

    def finish(rowv, fo_sel, cum_prev):
        depth = jnp.clip(fo_sel + ks[None, :] - cum_prev, 0, Q - 1)
        ohd = jnp.arange(Q, dtype=jnp.int32)[None, None, :] \
            == depth[..., None]
        return jnp.sum(jnp.where(ohd, rowv, 0.0), axis=-1)

    # ---- Y0 pieces (shipped design) -----------------------------------
    def y0(bump, xsa, upto):
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
        if upto == "front":
            return cnt_sp.sum() + fo_sp.sum()
        cum = jnp.cumsum(cnt_sp, axis=-1)
        at_sel = jnp.logical_not(cum[:, :, None] <= ks) \
            & ((cum - cnt_sp)[:, :, None] <= ks)
        any_hit = cum[:, -1:] > ks
        if upto == "atsel":
            return at_sel.sum() + any_hit.sum()
        jcol = (idx0[rm_of_sp_j][None, :] + a[:, None]).astype(jnp.float32)
        cols = jnp.stack([
            fo_sp.astype(jnp.float32),
            jnp.broadcast_to(code_sp[None, :].astype(jnp.float32), (E, NS)),
            (cum - cnt_sp).astype(jnp.float32),
            jcol,
        ], axis=2)
        picked = lax.dot_general(
            at_sel.astype(jnp.float32), cols,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            precision=lax.Precision.HIGH,
            preferred_element_type=jnp.float32)
        fo_sel = picked[..., 0].astype(jnp.int32)
        code_sel = picked[..., 1].astype(jnp.int32)
        cum_prev = picked[..., 2].astype(jnp.int32)
        j_sel = picked[..., 3].astype(jnp.int32)
        if upto == "dot1":
            return (fo_sel.sum() + code_sel.sum() + cum_prev.sum()
                    + j_sel.sum())
        oh_j = jnp.arange(NC, dtype=jnp.int32)[None, None, :] \
            == j_sel[:, :, None]
        rowv = lax.dot_general(
            oh_j.astype(jnp.float32), v.astype(jnp.float32),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            precision=lax.Precision.HIGH,
            preferred_element_type=jnp.float32)
        if upto == "dot2":
            return rowv.sum().astype(jnp.int32) + code_sel.sum()
        src = jnp.where(any_hit, finish(rowv, fo_sel, cum_prev), 0.0)
        return (src.sum().astype(jnp.int32)
                + jnp.where(any_hit, code_sel, 0).sum() + any_hit.sum())

    # ---- Y4: single-dot selection in NC space --------------------------
    def y4(bump, xsa):
        x, y, s, re_, vm = xsa
        x = jnp.where(bump < -10**9, 0, x)
        rows, a = packed_gather(x, y, s)
        v = jnp.where(rows == SENT, -1, rows.astype(jnp.int32))
        cand = (v >= vm[:, None, None]) & (v >= 0) & (v < re_[:, None, None])
        cnt_nc = jnp.sum(cand, axis=-1).astype(jnp.int32)
        fo_nc = jnp.sum(v >= re_[:, None, None], axis=-1)
        # cnt -> spiral order (ONE column fwd roll) for the cumsum
        cnt_al = roll_align(
            cnt_nc.reshape(E, n_dy, WW, 1), a, -1)
        cnt_sp = cnt_al[:, :, :n_dy, 0].reshape(E, NS)[:, sp_of_rm_j]
        cum_sp = jnp.cumsum(cnt_sp, axis=-1)
        any_hit = cum_sp[:, -1:] > ks
        # cum back to NC layout (ONE column back roll); pad cols >= n_dy
        # are junk but masked by valid_j below
        cum_rm = cum_sp[:, rm_of_sp_j].reshape(E, n_dy, n_dy)
        cum_pad = jnp.pad(cum_rm, ((0, 0), (0, 0), (0, WW - n_dy)))
        cum_nc = roll_align(cum_pad[..., None], a, +1)[..., 0] \
            .reshape(E, NC)
        # native NC-space columns
        jj = jnp.arange(NC, dtype=jnp.int32)
        xo = (jj % WW)[None, :] - a[:, None]            # dx+R or junk
        valid_j = (xo >= 0) & (xo < n_dy)
        code_nc = xo + 64 * (jj // WW)[None, :]
        cum_prev_nc = cum_nc - cnt_nc
        at_sel = valid_j[:, :, None] \
            & jnp.logical_not(cum_nc[:, :, None] <= ks) \
            & (cum_prev_nc[:, :, None] <= ks)           # [E, NC, K-1]
        cols = jnp.concatenate([
            v.astype(jnp.float32),
            fo_nc[..., None].astype(jnp.float32),
            jnp.where(valid_j, code_nc, 0)[..., None].astype(jnp.float32),
            cum_prev_nc[..., None].astype(jnp.float32),
        ], axis=2)                                      # [E, NC, Q+3]
        picked = lax.dot_general(
            at_sel.astype(jnp.float32), cols,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            precision=lax.Precision.HIGH,
            preferred_element_type=jnp.float32)         # [E, K-1, Q+3]
        rowv = picked[..., :Q]
        fo_sel = picked[..., Q].astype(jnp.int32)
        code_sel = picked[..., Q + 1].astype(jnp.int32)
        cum_prev = picked[..., Q + 2].astype(jnp.int32)
        src = jnp.where(any_hit, finish(rowv, fo_sel, cum_prev), 0.0)
        return (src.sum().astype(jnp.int32)
                + jnp.where(any_hit, code_sel, 0).sum() + any_hit.sum())

    def scan_over(body):
        def run(bump):
            def f(c, xsa):
                return c + body(bump, xsa), None
            out, _ = lax.scan(f, jnp.int32(0), (xs, ys, ss, rel_e, vmin))
            return out
        return run

    for stage in ["front", "atsel", "dot1", "dot2"]:
        timeit(f"Y0 upto {stage:5s}",
               scan_over(lambda b, xsa, st=stage: y0(b, xsa, st)))
    timeit("Y0 full      ", scan_over(lambda b, xsa: y0(b, xsa, "full")))
    timeit("Y4 single dot", scan_over(y4))


if __name__ == "__main__":
    main()
