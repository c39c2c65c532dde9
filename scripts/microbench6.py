"""Stencil-conv offset-contraction variants at the serve-tail L2 shape
([S=8, 40x56 grid, cin 18 -> cout 32]): the per-cell contraction
``g[n,p,c] = sum_o bas[n,o,p] * src[n,o,c]`` is 17,920 tiny [25x9]@[9x18]
matmuls when expressed as a batched dot_general — this script races the
expressible alternatives to pick the lowering the backend likes.

Run: python scripts/microbench6.py
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

    from dagr_tpu.core.types import GRID_OFFSETS
    from dagr_tpu.ops.spline import stencil_srcs

    B, ny, nx = 8, 40, 56
    cin, cout, P, O = 18, 32, 25, 9
    G = ny * nx
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, ny, nx, cin), np.float32))
    bas = jnp.asarray(rng.random((B, ny, nx, O, P), np.float32))
    w = jnp.asarray(rng.random((P, cin, cout), np.float32) * 0.1)

    probe = jax.jit(lambda v: v + 1)
    _ = np.asarray(probe(jnp.zeros((), jnp.float32)))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(probe(jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    ovh = min(ts)
    print(f"overhead {ovh*1e3:.1f} ms", flush=True)

    def timeit(name, op):
        def fn(bump):
            def body(c, i):
                xc = x + c
                out = op(xc)
                return c + out.reshape(-1)[0], out.sum()
            c, s = jax.lax.scan(body, bump, jnp.arange(T))
            return s
        f = jax.jit(fn)
        _ = np.asarray(f(jnp.float32(0)))
        best = np.inf
        for i in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(f(jnp.float32(i + 1)))
            best = min(best, time.perf_counter() - t0 - ovh)
        print(f"{name}: {best/T*1e3:.3f} ms", flush=True)

    w_flat = w.reshape(P * cin, cout)
    w_cf = jnp.transpose(w, (1, 0, 2)).reshape(cin * P, cout)

    def a_batched_dot(xc):
        srcs = stencil_srcs(xc)
        g = jax.lax.dot_general(
            bas, srcs, dimension_numbers=(((3,), (3,)), ((0, 1, 2), (0, 1, 2))),
            preferred_element_type=jnp.float32)
        return jnp.dot(g.reshape(B * G, P * cin), w_flat,
                       preferred_element_type=jnp.float32)

    def b_flat_batched_dot(xc):
        srcs = stencil_srcs(xc).reshape(B * G, O, cin)
        g = jax.lax.dot_general(
            bas.reshape(B * G, O, P), srcs,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return jnp.dot(g.reshape(B * G, P * cin), w_flat,
                       preferred_element_type=jnp.float32)

    def c_mult_sum(xc):
        srcs = stencil_srcs(xc)
        g = jnp.sum(bas[..., None] * srcs[..., None, :], axis=3)
        return jnp.dot(g.reshape(B * G, P * cin), w_flat,
                       preferred_element_type=jnp.float32)

    def d_shift_accum(xc):
        p = jnp.pad(xc, ((0, 0), (1, 1), (1, 1), (0, 0)))
        g = jnp.zeros((B, ny, nx, P, cin), jnp.float32)
        for o, (dy, dx) in enumerate(GRID_OFFSETS):
            so = p[:, 1 + dy:1 + dy + ny, 1 + dx:1 + dx + nx]
            g = g + bas[:, :, :, o, :, None] * so[..., None, :]
        return jnp.dot(g.reshape(B * G, P * cin), w_flat,
                       preferred_element_type=jnp.float32)

    def e_swapped(xc):
        srcs = stencil_srcs(xc).reshape(B * G, O, cin)
        g = jax.lax.dot_general(
            srcs, bas.reshape(B * G, O, P),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # [BG, cin, P]
        return jnp.dot(g.reshape(B * G, cin * P), w_cf,
                       preferred_element_type=jnp.float32)

    def f_zw_first(xc):
        # contract W first: z = x @ W [B*G, P*cout], then per-cell
        # o-shift contraction with bas on the (p, cout) payload
        z = jnp.dot(xc.reshape(B * G, cin), w_flat.reshape(cin, -1)
                    if False else jnp.transpose(w, (1, 0, 2)).reshape(cin, P * cout),
                    preferred_element_type=jnp.float32)
        zs = stencil_srcs(z.reshape(B, ny, nx, P * cout)).reshape(
            B * G, O, P, cout)
        return jnp.einsum("nop,nopc->nc", bas.reshape(B * G, O, P), zs)

    timeit("A stack + dot_general batch (B,ny,nx)", a_batched_dot)
    timeit("B stack + dot_general batch flat BG", b_flat_batched_dot)
    timeit("C stack + multiply+sum over o", c_mult_sum)
    timeit("D shift-accumulate (no stack)", d_shift_accum)
    timeit("E swapped operands + cin-major W", e_swapped)
    timeit("F x@W first, contract (o,p) after", f_zw_first)


if __name__ == "__main__":
    main()
