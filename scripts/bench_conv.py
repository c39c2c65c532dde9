"""Compare spline_conv implementations on the real chip at both the
event-level geometry (M=50k, K=16) and a pooled-level geometry
(M=2240, K=9).  Honest timing: T iterations scan-chained in one jit.

Run: python scripts/bench_conv.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

T = 24


def main():
    import jax
    import jax.numpy as jnp

    from dagr_tpu.ops.spline import spline_conv

    probe = jax.jit(lambda x: x + 1)
    _ = np.asarray(probe(jnp.zeros((), jnp.float32)))
    ovhs = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(probe(jnp.float32(i + 1)))
        ovhs.append(time.perf_counter() - t0)
    ovh = min(ovhs)

    rng = np.random.default_rng(0)
    P = 25
    for (N, K, cin, cout, label) in [
        (50_000, 16, 3, 16, "event cin=3"),
        (50_000, 16, 16, 16, "event cin=16"),
        (2_240, 9, 18, 64, "pool1 cin=18"),
        (2_240, 9, 64, 64, "pool1 cin=64"),
    ]:
        B = 1
        pos = jnp.asarray(rng.random((B, N, 3), np.float32))
        nbr = jnp.asarray(rng.integers(0, N, (B, N, K), dtype=np.int32))
        mask = jnp.asarray(rng.random((B, N, K)) < 0.5)
        x = jnp.asarray(rng.random((B, N, cin), np.float32))
        w = jnp.asarray(rng.random((P, cin, cout), np.float32) * 0.1)
        root = jnp.asarray(rng.random((cin, cout), np.float32) * 0.1)

        for impl in ("edge", "node", "node_dot"):
            def run(x, pos, nbr, mask, w, root, bump, _impl=impl):
                def step(c, _):
                    out = spline_conv(x + c, pos, nbr, mask, w, root,
                                      max_value=4 / 320.0, node_chunk=2048,
                                      impl=_impl)
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
            per = (min(ts) - ovh) / T * 1e3
            print(f"{label:16s} impl={impl:5s} {per:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
