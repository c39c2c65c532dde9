"""Micro-benchmarks of the primitives the graph builder leans on.

v2: the axon tunnel costs ~30 ms per dispatched call AND memoizes
repeated identical executions, so every measurement here (a) runs T
iterations INSIDE one jit via lax.scan with a data dependency between
iterations, and (b) perturbs the inputs per iteration.  Reported time
is (call - empty-call overhead) / T.

Run: python scripts/microbench.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

T = 8


def timed_call(f, *args, n=4):
    import jax
    for _ in range(2):
        out = f(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def scan_bench(body, init_seed_arrays, overhead_ms):
    """body(carry_i32, i) -> (new_carry_i32, dummy). Runs T times in one
    jit; carry perturbs each iteration's data so nothing memoizes."""
    import jax
    import jax.numpy as jnp

    def run(*arrays):
        def step(c, i):
            c2 = body(c, i, arrays)
            return c2, ()
        c, _ = jax.lax.scan(step, jnp.int32(1), jnp.arange(T))
        return c

    f = jax.jit(run)
    ms = timed_call(f, *init_seed_arrays)
    return (ms - overhead_ms) / T


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    res = {}

    overhead = timed_call(jax.jit(lambda x: x + 1), jnp.zeros((), jnp.int32))
    print(f"per-call tunnel overhead ~ {overhead:.1f} ms")

    # ---- lax.sort at builder sizes ----------------------------------
    for n, ops, keys in [(8_150_000, 3, 2), (4_100_000, 3, 2),
                         (4_100_000, 2, 1), (2_050_000, 2, 1),
                         (91_000, 4, 3), (50_000, 3, 2)]:
        base = jnp.asarray(rng.integers(0, 1 << 30, (ops, n), dtype=np.int32))

        def body(c, i, arrays, k=keys, o=ops):
            a = arrays[0]
            ins = tuple(a[j] ^ c for j in range(o))
            out = jax.lax.sort(ins, num_keys=k)[-1]
            return c + out[0]

        res[f"sort n={n/1e6:.2f}M ops={ops} keys={keys}"] = scan_bench(
            body, (base,), overhead)

    # ---- gather (take_along_axis) -----------------------------------
    for tab_n, idx_n in [(50_000, 4_050_000), (50_000, 1_000_000),
                         (2_240, 4_050_000)]:
        tab = jnp.asarray(rng.integers(0, 1 << 30, tab_n, dtype=np.int32))
        idx = jnp.asarray(rng.integers(0, tab_n, idx_n, dtype=np.int32))

        def body(c, i, arrays, tn=tab_n):
            t, ix = arrays
            ix2 = (ix + c) % tn
            out = jnp.take_along_axis(
                t.reshape(1, -1), ix2.reshape(1, -1), axis=1)
            return c + out[0, 0]

        res[f"gather tab={tab_n} idx={idx_n/1e6:.2f}M"] = scan_bench(
            body, (tab, idx), overhead)

    # ---- bisect over [50k,81] (8 and 17 iterations) ------------------
    M, S = 50_000, 81
    tab = jnp.sort(jnp.asarray(rng.integers(0, 1 << 30, M, dtype=np.int32)))
    keys0 = jnp.asarray(rng.integers(0, 1 << 30, (M, S), dtype=np.int32))

    def mk_bisect(iters):
        def body(c, i, arrays):
            t, k0 = arrays
            k = k0 ^ c

            def bb(_, lh):
                lo, hi = lh
                mid = (lo + hi) // 2
                v = jnp.take_along_axis(
                    t.reshape(1, -1),
                    jnp.clip(mid, 0, M - 1).reshape(1, -1), axis=1
                ).reshape(mid.shape)
                go = (v < k) & (lo < hi)
                return jnp.where(go, mid + 1, lo), jnp.where(go, hi, mid)

            lo, _ = jax.lax.fori_loop(
                0, iters, bb,
                (jnp.zeros((M, S), jnp.int32), jnp.full((M, S), M, jnp.int32)))
            return c + lo[0, 0]
        return body

    res["bisect8  [50k,81]"] = scan_bench(mk_bisect(8), (tab, keys0), overhead)
    res["bisect17 [50k,81]"] = scan_bench(mk_bisect(17), (tab, keys0), overhead)

    # ---- histogram scatter-add, cumsum, segment ops ------------------
    idx = jnp.asarray(rng.integers(0, 77_000, 50_000, dtype=np.int32))

    def body(c, i, arrays):
        (ix,) = arrays
        out = jnp.zeros(77_001, jnp.int32).at[(ix + c) % 77_000].add(1)
        return c + out[0]

    res["scatter-add 50k->77k"] = scan_bench(body, (idx,), overhead)

    cm = jnp.asarray(rng.integers(0, 4, (M, S), dtype=np.int32))

    def body2(c, i, arrays):
        (a,) = arrays
        return c + jnp.cumsum(a + c, axis=-1)[0, 0]

    res["cumsum [50k,81]"] = scan_bench(body2, (cm,), overhead)

    for k, v in res.items():
        print(f"{k:42s} {v:9.3f} ms")


if __name__ == "__main__":
    main()
