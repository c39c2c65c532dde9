"""Spline-conv numerics vs a naive per-edge numpy implementation of the
reference semantics (reference: src/dagr/model/layers/spline_conv.py
and torch-spline-conv's degree-1 basis — bilinear interpolation into a
kernel_size x kernel_size grid of weight matrices)."""
import numpy as np
import pytest

from dagr_tpu.ops.spline import bilinear_basis, spline_conv


def naive_basis(attr, k=5):
    """Per-edge bilinear basis, independent reimplementation."""
    out = np.zeros((k * k,))
    p = np.clip(attr, 0, 1) * (k - 1)
    bot = np.minimum(np.floor(p), k - 2).astype(int)
    f = p - bot
    for bx, wx in ((0, 1 - f[0]), (1, f[0])):
        for by, wy in ((0, 1 - f[1]), (1, f[1])):
            out[(bot[1] + by) * k + (bot[0] + bx)] += wx * wy
    return out


def naive_spline_conv(x, pos, nbr, nbr_mask, W, Wr, b, max_value, k=5):
    B, N, cin = x.shape
    P, _, cout = W.shape
    out = np.zeros((B, N, cout))
    for bi in range(B):
        for n in range(N):
            for s in range(nbr.shape[-1]):
                if not nbr_mask[bi, n, s]:
                    continue
                j = nbr[bi, n, s]
                attr = (pos[bi, j, :2] - pos[bi, n, :2]) / (2 * max_value) + 0.5
                attr = np.clip(attr, 0, 1)
                basis = naive_basis(attr, k)
                Weff = np.einsum("p,pio->io", basis, W)
                out[bi, n] += x[bi, j] @ Weff
            if Wr is not None:
                out[bi, n] += x[bi, n] @ Wr
            if b is not None:
                out[bi, n] += b
    return out


def test_basis_partition_of_unity(rng):
    attr = rng.random((100, 2))
    b = np.asarray(bilinear_basis(attr, 5))
    np.testing.assert_allclose(b.sum(-1), 1.0, atol=1e-6)
    assert (np.sort(b, axis=-1)[:, :-4] == 0).all()  # <= 4 nonzeros


def test_basis_center_is_single_tap():
    b = np.asarray(bilinear_basis(np.array([0.5, 0.5]), 5))
    expect = np.zeros(25)
    expect[2 * 5 + 2] = 1.0
    np.testing.assert_allclose(b, expect, atol=1e-7)


def test_basis_corners():
    # attr = 0 -> tap (0, 0); attr = 1 -> tap (4, 4)
    b0 = np.asarray(bilinear_basis(np.array([0.0, 0.0]), 5))
    b1 = np.asarray(bilinear_basis(np.array([1.0, 1.0]), 5))
    assert b0[0] == 1.0 and b0.sum() == 1.0
    assert b1[24] == 1.0 and abs(b1.sum() - 1.0) < 1e-6


@pytest.mark.parametrize("chunk", [64, 2048])
@pytest.mark.parametrize("cin,cout,K", [(3, 8, 5), (16, 16, 16)])
def test_matches_naive(rng, chunk, cin, cout, K):
    B, N = 2, 50
    x = rng.standard_normal((B, N, cin)).astype(np.float32)
    pos = rng.random((B, N, 3)).astype(np.float32)
    nbr = rng.integers(0, N, (B, N, K)).astype(np.int32)
    nbr_mask = rng.random((B, N, K)) < 0.7
    W = rng.standard_normal((25, cin, cout)).astype(np.float32) * 0.1
    Wr = rng.standard_normal((cin, cout)).astype(np.float32) * 0.1
    b = rng.standard_normal((cout,)).astype(np.float32)
    mv = 0.05
    # keep attrs mostly in range so the clamp isn't the whole story
    pos[..., :2] *= 0.1

    got = np.asarray(spline_conv(
        x, pos, nbr, nbr_mask, W, Wr, b,
        max_value=mv, kernel_size=5, node_chunk=chunk,
    ))
    want = naive_spline_conv(x, pos, nbr, nbr_mask, W, Wr, b, mv)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_grad_flows(rng):
    import jax
    import jax.numpy as jnp

    B, N, K, cin, cout = 1, 20, 4, 3, 4
    x = jnp.asarray(rng.standard_normal((B, N, cin)), dtype=jnp.float32)
    pos = jnp.asarray(rng.random((B, N, 3)), dtype=jnp.float32)
    nbr = jnp.asarray(rng.integers(0, N, (B, N, K)), dtype=jnp.int32)
    nbr_mask = jnp.asarray(rng.random((B, N, K)) < 0.8)
    W = jnp.asarray(rng.standard_normal((25, cin, cout)), dtype=jnp.float32)
    Wr = jnp.asarray(rng.standard_normal((cin, cout)), dtype=jnp.float32)

    def loss(W, Wr, x):
        out = spline_conv(x, pos, nbr, nbr_mask, W, Wr, None,
                          max_value=0.05, node_chunk=8)
        return (out ** 2).sum()

    g = jax.grad(loss, argnums=(0, 1, 2))(W, Wr, x)
    assert all(bool(jnp.isfinite(gi).all()) for gi in g)
    assert float(jnp.abs(g[0]).sum()) > 0


def test_impl_node_matches_edge(rng):
    """The factored 'node' formulation must match the edge-major oracle."""
    import jax.numpy as jnp

    from dagr_tpu.ops.spline import spline_conv

    B, N, K, cin, cout = 2, 300, 7, 5, 6
    x = jnp.asarray(rng.random((B, N, cin), np.float32))
    pos = jnp.asarray(rng.random((B, N, 3), np.float32))
    nbr = jnp.asarray(rng.integers(0, N, (B, N, K), dtype=np.int32))
    mask = jnp.asarray(rng.random((B, N, K)) < 0.5)
    w = jnp.asarray(rng.standard_normal((25, cin, cout), np.float32) * 0.2)
    root = jnp.asarray(rng.standard_normal((cin, cout), np.float32) * 0.2)
    kw = dict(max_value=0.05, node_chunk=128)
    a = spline_conv(x, pos, nbr, mask, w, root, impl="edge", **kw)
    b = spline_conv(x, pos, nbr, mask, w, root, impl="node", **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=2e-5)


def test_stencil_conv_matches_gather():
    """stencil_spline_conv (dense shifts on pooled grids) must equal the
    general gather-based spline_conv on a real pooled NodeSet."""
    import jax.numpy as jnp

    from dagr_tpu.core.types import NodeSet, EventGraph
    from dagr_tpu.graph.build import build_graph
    from dagr_tpu.ops.pool import pool_nodeset
    from dagr_tpu.ops.spline import spline_conv, stencil_spline_conv

    rng = np.random.default_rng(7)
    B, N = 2, 400
    W, H = 64, 48
    pos_px = np.zeros((B, N, 3), np.int32)
    pos_px[..., 0] = rng.integers(0, W, (B, N))
    pos_px[..., 1] = rng.integers(0, H, (B, N))
    pos_px[..., 2] = np.sort(rng.integers(0, 100_000, (B, N)), axis=1)
    mask = np.ones((B, N), bool)
    mask[1, 300:] = False
    g = build_graph(jnp.asarray(pos_px), jnp.asarray(mask), width=W,
                    height=H, radius=3, delta_t_us=50_000, max_neighbors=8)
    pos = pos_px.astype(np.float32) / np.array([W, H, 100_000], np.float32)
    feat = rng.random((B, N, 5), np.float32)
    ns = NodeSet(feat=jnp.asarray(feat), pos=jnp.asarray(pos),
                 mask=jnp.asarray(mask), graph=g)
    ns = pool_nodeset(ns, grid_ny=12, grid_nx=16, width=W, height=H,
                      aggr="max", keep_temporal_ordering=True)

    w = jnp.asarray(rng.standard_normal((25, 5, 6), np.float32) * 0.2)
    root = jnp.asarray(rng.standard_normal((5, 6), np.float32) * 0.2)
    bias = jnp.asarray(rng.standard_normal(6, np.float32) * 0.2)
    mv = 0.1
    a = spline_conv(ns.feat, ns.pos, ns.graph.nbr, ns.graph.nbr_mask,
                    w, root, bias, max_value=mv)
    b = stencil_spline_conv(ns.feat, ns.pos, ns.graph.nbr_mask, w, root,
                            bias, grid_hw=(12, 16), max_value=mv)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=2e-5)
    # shared-basis path too
    from dagr_tpu.ops.spline import stencil_basis

    sb = stencil_basis(ns.pos, grid_hw=(12, 16), max_value=mv)
    c = stencil_spline_conv(ns.feat, ns.pos, ns.graph.nbr_mask, w, root,
                            bias, sb, grid_hw=(12, 16), max_value=mv)
    np.testing.assert_allclose(np.asarray(b), np.asarray(c), atol=1e-6)
