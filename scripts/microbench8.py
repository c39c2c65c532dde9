"""Round-4 microbench: the slab-search SELECTION stage in isolation.

The bench_serve sweep at slabv Q=16 S=8 c8192 shows ~13.9 ms between
the raw slice gather and the finished selection (cand pass + vmin join
+ the one-hot transport dot); scripts/microbench7.py puts the cand
pass alone at ~1.4 ms — so the transport machinery is the cost.
Variants (all produce (src_rel, code_sel, any_hit) for the same
semantics as serve._pick_neighbors):

  A. current serve.py path: per-cell value columns (Q rel columns +
     fo/code/cumprev) concatenated to f32 [E, NS, Q+3], ONE one-hot
     dot_general at Precision.HIGH, then a depth one-hot pick.
  B. A but with the rows in uint16 (fused convert feeds the dot).
  C. no-dot: fo/code/cumprev via compare-and-reduce masked sums
     (the sort-mode _select_first_k trick), then the rel pick as a
     fused elementwise reduce over (cell, q) with a computed depth
     one-hot — nothing materialized beyond [E, NS, K-1].
  D. hybrid: 3-column one-hot dot for (fo, code, cumprev) + the fused
     (cell, q) reduce for rel.

Run: python scripts/microbench8.py
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

    E, NS, Q, K = 65536, 81, 16, 16
    code_cells = jnp.asarray(rng.permutation(NS).astype(np.float32))

    # synthetic rows at bench-like sparsity: ~3% of slots hold a
    # plausible rel vid, the rest sentinel
    rows_np = np.full((T, E, NS, Q), -1, np.int32)
    m = rng.random((T, E, NS, Q)) < 0.03
    rows_np[m] = rng.integers(0, 30000, size=int(m.sum()))
    rows_np.sort(axis=-1)
    rows_np = rows_np[..., ::-1]                  # newest-first FIFO rows
    rows_i32 = jnp.asarray(rows_np)
    rows_u16 = jnp.asarray(
        np.where(rows_np < 0, 2**16 - 1, rows_np).astype(np.uint16))
    rel_e_np = np.broadcast_to(
        rng.integers(25000, 32000, size=(T, E, 1, 1)).astype(np.int32),
        rows_np.shape).copy()
    rel_e = jnp.asarray(rel_e_np[:, :, 0, 0])     # [T, E]
    vmin = rel_e - 3000

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
        print(f"{name}: {best/T*1e3:.3f} ms/step", flush=True)
        return out

    def common(v, re_, vm):
        valid = v >= 0
        cand = valid & (v >= vm[:, None, None]) & (v < re_[:, None, None])
        fo = jnp.sum(valid & (v >= re_[:, None, None]), axis=-1)
        cnt = jnp.sum(cand, axis=-1).astype(jnp.int32)
        cum = jnp.cumsum(cnt, axis=-1)
        ks = jnp.arange(K - 1, dtype=jnp.int32)
        le = cum[:, :, None] <= ks[None, None, :]
        at_sel = jnp.logical_not(le) & ((cum - cnt)[:, :, None] <= ks)
        any_hit = cum[:, -1:] > ks
        return cand, fo, cnt, cum, at_sel, any_hit, ks

    def variant_A(bump, rows, u16):
        def body(c, xs):
            r, re_, vm = xs
            v = r.astype(jnp.int32)
            if u16:
                v = jnp.where(r == np.uint16(2**16 - 1), -1, v)
            v = jnp.where(c < -10**9, 0, v)
            cand, fo, cnt, cum, at_sel, any_hit, ks = common(v, re_, vm)
            cumcnt = cum - cnt
            cols = jnp.concatenate([
                v.astype(jnp.float32),
                fo[..., None].astype(jnp.float32),
                jnp.broadcast_to(code_cells[None, :, None], (E, NS, 1)),
                cumcnt[..., None].astype(jnp.float32),
            ], axis=2)
            picked = lax.dot_general(
                at_sel.astype(jnp.float32), cols,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                precision=lax.Precision.HIGH,
                preferred_element_type=jnp.float32)
            rowv = picked[..., :Q]
            fo_sel = picked[..., Q].astype(jnp.int32)
            code_sel = picked[..., Q + 1].astype(jnp.int32)
            cum_prev = picked[..., Q + 2].astype(jnp.int32)
            depth = jnp.clip(fo_sel + ks[None, :] - cum_prev, 0, Q - 1)
            oh = jnp.arange(Q, dtype=jnp.int32)[None, None, :] \
                == depth[..., None]
            src = jnp.sum(jnp.where(oh, rowv, 0.0), axis=-1)
            return (c + src.sum().astype(jnp.int32)
                    + code_sel.sum() + any_hit.sum()), None
        out, _ = lax.scan(body, jnp.int32(0), (rows, rel_e, vmin))
        return out

    def variant_CD(bump, rows, u16, dot3):
        def body(c, xs):
            r, re_, vm = xs
            v = r.astype(jnp.int32)
            if u16:
                v = jnp.where(r == np.uint16(2**16 - 1), -1, v)
            v = jnp.where(c < -10**9, 0, v)
            cand, fo, cnt, cum, at_sel, any_hit, ks = common(v, re_, vm)
            cumcnt = cum - cnt
            if dot3:
                cols = jnp.concatenate([
                    fo[..., None].astype(jnp.float32),
                    jnp.broadcast_to(code_cells[None, :, None], (E, NS, 1)),
                    cumcnt[..., None].astype(jnp.float32),
                ], axis=2)
                picked = lax.dot_general(
                    at_sel.astype(jnp.float32), cols,
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    precision=lax.Precision.HIGH,
                    preferred_element_type=jnp.float32)
                fo_sel = picked[..., 0].astype(jnp.int32)
                code_sel = picked[..., 1].astype(jnp.int32)
                cum_prev = picked[..., 2].astype(jnp.int32)
            else:
                asl = at_sel
                fo_sel = jnp.sum(fo[:, :, None] * asl, axis=1)
                code_sel = jnp.sum(
                    code_cells.astype(jnp.int32)[None, :, None] * asl,
                    axis=1)
                cum_prev = jnp.sum(cumcnt[:, :, None] * asl, axis=1)
            # depth of pick k WITHIN its selected cell's FIFO row
            depth = jnp.clip(fo_sel + ks[None, :] - cum_prev, 0, Q - 1)
            # fused (cell, q) reduce: src[e,k] = sum_c at_sel * v[c, depth]
            qs = jnp.arange(Q, dtype=jnp.int32)
            pick_q = (qs[None, None, :, None] == depth[:, None, None, :])
            vv = v[..., None] * (pick_q & at_sel[:, :, None, :])
            src = jnp.sum(vv, axis=(1, 2))
            return (c + src.sum() + code_sel.sum() + any_hit.sum()), None
        out, _ = lax.scan(body, jnp.int32(0), (rows, rel_e, vmin))
        return out

    timeit("A  big-dot select, i32 rows",
           lambda b: variant_A(b, rows_i32, False))
    timeit("B  big-dot select, u16 rows",
           lambda b: variant_A(b, rows_u16, True))
    timeit("C  no-dot select, u16 rows",
           lambda b: variant_CD(b, rows_u16, True, False))
    timeit("D  3-col dot + fused pick, u16 rows",
           lambda b: variant_CD(b, rows_u16, True, True))
    timeit("D' 3-col dot + fused pick, i32 rows",
           lambda b: variant_CD(b, rows_i32, False, True))


if __name__ == "__main__":
    main()
