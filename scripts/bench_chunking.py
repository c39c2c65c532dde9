"""A/B: spline_conv node_chunk 2048 (lax.map) vs single-shot at the
event level with a PRECOMPUTED shared basis (post basis-sharing the
chunking trade-off may have flipped).  Run: python scripts/bench_chunking.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

T = 16


def main():
    import jax
    import jax.numpy as jnp

    from dagr_tpu.ops.spline import spline_conv, edge_basis

    probe = jax.jit(lambda x: x + 1)
    _ = np.asarray(probe(jnp.zeros((), jnp.float32)))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(probe(jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    ovh = min(ts)

    rng = np.random.default_rng(0)
    B, N, K, P = 1, 50_000, 16, 25
    pos = jnp.asarray(rng.random((B, N, 3), np.float32))
    nbr = jnp.asarray(rng.integers(0, N, (B, N, K), dtype=np.int32))
    mask = jnp.asarray(rng.random((B, N, K)) < 0.25)

    for cin, cout in [(3, 16), (16, 16)]:
        x = jnp.asarray(rng.random((B, N, cin), np.float32))
        w = jnp.asarray(rng.random((P, cin, cout), np.float32) * 0.1)
        root = jnp.asarray(rng.random((cin, cout), np.float32) * 0.1)

        for chunk in (2048, 8192, 50_000):
            def run(x, pos, nbr, mask, w, root, bump, _c=chunk):
                basis = edge_basis(pos, nbr, max_value=4 / 320.0)

                def step(c, _):
                    out = spline_conv(x + c, pos, nbr, mask, w, root,
                                      None, basis, max_value=4 / 320.0,
                                      node_chunk=_c)
                    return c + out[0, 0, 0], ()
                c, _ = jax.lax.scan(step, bump, jnp.arange(T))
                return c

            f = jax.jit(run)
            for i in range(2):
                _ = np.asarray(f(x, pos, nbr, mask, w, root, jnp.float32(i)))
            ts = []
            for i in range(3):
                t0 = time.perf_counter()
                _ = np.asarray(f(x, pos, nbr, mask, w, root,
                                 jnp.float32(i + 5)))
                ts.append(time.perf_counter() - t0)
            print(f"cin={cin:2d} chunk={chunk:6d} "
                  f"{(min(ts)-ovh)/T*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
