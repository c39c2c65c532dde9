"""Gather cost model: per-index vs per-element (row width), and
event-level conv variants.  Honest scan-chained timing.
Run: python scripts/microbench2.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

T = 12


def main():
    import jax
    import jax.numpy as jnp

    probe = jax.jit(lambda x: x + 1)
    _ = np.asarray(probe(jnp.zeros((), jnp.int32)))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(probe(jnp.int32(i)))
        ts.append(time.perf_counter() - t0)
    ovh = min(ts)
    print(f"overhead {ovh*1e3:.1f} ms")

    rng = np.random.default_rng(0)

    def bench(body, arrays, label):
        def run(*arrays):
            def step(c, _):
                return c + body(c, arrays), ()
            c, _ = jax.lax.scan(step, jnp.int32(1), jnp.arange(T))
            return c
        f = jax.jit(run)
        for i in range(2):
            _ = np.asarray(f(*arrays))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(f(*arrays))
            ts.append(time.perf_counter() - t0)
        print(f"{label:44s} {(min(ts)-ovh)/T*1e3:9.3f} ms", flush=True)

    # row gathers: same index count, varying row width
    N, E = 50_000, 800_000
    idx = jnp.asarray(rng.integers(0, N, E, dtype=np.int32))
    for width in (1, 2, 4, 16, 32):
        tab = jnp.asarray(rng.random((N, width), np.float32))

        def body(c, arrays, w=width):
            t, ix = arrays
            ix2 = (ix + c) % N
            out = jnp.take_along_axis(t, ix2[:, None], axis=0)
            return out[0, 0].astype(jnp.int32)

        bench(body, (tab, idx), f"row-gather tab[{N},{width}] idx=800k")

    # tiny-table gather (basis LUT style)
    tab = jnp.asarray(rng.random((82, 25), np.float32))
    idx2 = jnp.asarray(rng.integers(0, 82, E, dtype=np.int32))

    def body(c, arrays):
        t, ix = arrays
        ix2 = (ix + c) % 82
        out = jnp.take_along_axis(t, ix2[:, None], axis=0)
        return out[0, 0].astype(jnp.int32)

    bench(body, (tab, idx2), "row-gather tab[82,25] idx=800k")

    # one_hot matmul alternative for the LUT: one_hot(idx, 82) @ tab
    def body(c, arrays):
        t, ix = arrays
        ix2 = (ix + c) % 82
        oh = jax.nn.one_hot(ix2, 82, dtype=jnp.float32)
        out = jnp.dot(oh, t, preferred_element_type=jnp.float32)
        return out[0, 0].astype(jnp.int32)

    bench(body, (tab, idx2), "one_hot(82) matmul idx=800k")


if __name__ == "__main__":
    main()
