"""Piece timings: detect/NMS alone, event-level basis compute vs LUT,
conv sub-pieces.  Scan-chained honest timing.
Run: python scripts/bench_pieces.py
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

    from dagr_tpu.config import DagrConfig
    from dagr_tpu.models.dagr import detect
    from dagr_tpu.ops.spline import bilinear_basis

    probe = jax.jit(lambda x: x + 1)
    _ = np.asarray(probe(jnp.zeros((), jnp.float32)))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(probe(jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    ovh = min(ts)

    def bench(body, arrays, label):
        def run(*arrays):
            def step(c, _):
                return c + body(c, arrays), ()
            c, _ = jax.lax.scan(step, jnp.float32(1), jnp.arange(T))
            return c
        f = jax.jit(run)
        for i in range(2):
            _ = np.asarray(f(*arrays))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(f(*arrays))
            ts.append(time.perf_counter() - t0)
        print(f"{label:40s} {(min(ts)-ovh)/T*1e3:8.3f} ms", flush=True)

    rng = np.random.default_rng(0)
    cfg = DagrConfig()
    H, W = 240, 320

    # detect/NMS on realistic raw head outputs
    A = sum(ny * nx for ny, nx in cfg.grid_shapes()[-2:])
    raw = jnp.asarray(rng.standard_normal(
        (1, A, 5 + cfg.num_classes)).astype(np.float32))

    def body(c, arrays):
        (r,) = arrays
        det = detect(r + 0.001 * c, cfg, H, W)
        return det["scores"][0, 0]

    bench(body, (raw,), "detect (decode+topk+NMS300)")

    # event-level basis: compute vs LUT gather
    E = 800_000
    dpos = jnp.asarray(
        (rng.integers(-4, 5, (E, 2)) / np.array([320, 240])).astype(
            np.float32))
    mv = 4 / 320.0

    def body(c, arrays):
        (d,) = arrays
        attr = (d + 0 * c) / (2 * mv) + 0.5
        bas = bilinear_basis(jnp.clip(attr, 0, 1), 5)
        return bas[0, 0]

    bench(body, (dpos,), "basis compute [800k, 25]")

    code = jnp.asarray(rng.integers(0, 81, E, dtype=np.int32))
    lut = jnp.asarray(rng.random((81, 25), np.float32))

    def body(c, arrays):
        cd, l = arrays
        cd2 = (cd + c.astype(jnp.int32)) % 81
        bas = jnp.take_along_axis(l, cd2[:, None], axis=0)
        return bas[0, 0]

    bench(body, (code, lut), "basis LUT gather [800k, 25]")


if __name__ == "__main__":
    main()
