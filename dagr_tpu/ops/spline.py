"""Spline convolution over fixed-degree neighbor lists.

TPU-native replacement for PyG SplineConv + torch-spline-conv
(reference: src/dagr/model/layers/spline_conv.py:9-78; the external
``spline_basis`` op it calls computes, for degree=1/dim=2/kernel 5x5,
a bilinear interpolation into a 5x5 grid of weight matrices — the
reference's own LUT mode spells this out at spline_conv.py:16-47).

Design (SURVEY.md §7): instead of ragged per-edge scatter/gather, edges
live in dense ``[B, N, K]`` neighbor slots.  The message for an edge is

    m = sum_p basis_p(attr) * (x_src @ W_p),   p in 5x5 kernel taps

computed as ONE MXU matmul per edge chunk: ``z = x_src @ W`` with W
reshaped to ``[Cin, P*Cout]``, followed by a small VPU contraction with
the (4-sparse but densely stored) basis vector.  Node chunking under
``lax.map`` bounds the ``[*, P, Cout]`` intermediate regardless of N.

Edge attributes are recomputed from positions on the fly (they are two
subtractions), matching PyG's Cartesian transform semantics
(attr = (pos_src - pos_dst) / (2 * max_value) + 0.5, clamped to [0, 1];
reference: src/dagr/model/layers/components.py:25-35 and the explicit
clamp at src/dagr/model/networks/net.py:123).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def bilinear_basis(attr: jnp.ndarray, kernel_size: int = 5) -> jnp.ndarray:
    """Degree-1 open B-spline basis on a 2-D kernel grid.

    attr: [..., 2] in [0, 1].  Returns dense [..., kernel_size**2] with
    at most 4 non-zeros.  Flat tap index is ``kx + kernel_size * ky``
    (dim 0 = x contiguous), the torch-spline-conv layout the reference
    weights use (reference: spline_conv.py:27-35 builds its LUT by
    meshgrid(dx, dy) with x varying slowest over rows — the flat order
    is fixed here and round-tripped by the checkpoint converter).
    """
    k = kernel_size
    p = jnp.clip(attr, 0.0, 1.0) * (k - 1)
    bot = jnp.clip(jnp.floor(p), 0, k - 2).astype(jnp.int32)   # [..., 2]
    frac = p - bot.astype(p.dtype)
    taps = jax.nn.one_hot(bot, k, dtype=p.dtype)               # [..., 2, k]
    taps_hi = jax.nn.one_hot(bot + 1, k, dtype=p.dtype)
    w = taps * (1.0 - frac[..., None]) + taps_hi * frac[..., None]
    wx, wy = w[..., 0, :], w[..., 1, :]
    # [..., ky, kx] row-major flatten -> flat = ky * k + kx
    return (wy[..., :, None] * wx[..., None, :]).reshape(*attr.shape[:-1], k * k)


def _edge_messages(x_src, basis, weight):
    """x_src [E, Cin], basis [E, P], weight [P, Cin, Cout] -> [E, Cout]."""
    P, cin, cout = weight.shape
    w_flat = jnp.transpose(weight, (1, 0, 2)).reshape(cin, P * cout)
    z = jnp.dot(x_src, w_flat, preferred_element_type=jnp.float32)
    return jnp.einsum("ep,epo->eo", basis, z.reshape(-1, P, cout))


def edge_basis(
    pos: jnp.ndarray,        # f32 [B, N, >=2]
    nbr: jnp.ndarray,        # i32 [B, N, K]
    *,
    max_value: float,
    kernel_size: int = 5,
) -> jnp.ndarray:
    """Precompute the per-edge spline basis [B, N, K, P] so several
    convs on the same level share it (the reference computes edge_attr
    once per level and every conv reuses it, net.py:122-125 +
    pooling.py:88-92).  Worth it only for small pooled levels — at the
    50k-node event level the materialization outweighs recompute."""
    B, N, K = nbr.shape
    M = B * N
    pos_flat = pos[..., :2].reshape(M, 2)
    base = (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
    idx = jnp.clip(nbr + base, 0, M - 1).reshape(-1)
    pos_src = jnp.take_along_axis(pos_flat, idx[:, None], axis=0)
    pos_dst = jnp.repeat(pos_flat, K, axis=0).reshape(B, N, K, 2)
    attr = (pos_src.reshape(B, N, K, 2) - pos_dst) / (2.0 * max_value) + 0.5
    return bilinear_basis(jnp.clip(attr, 0.0, 1.0), kernel_size)


def _shift2d(c: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """value at (y, x) of the result = c[y + dy, x + dx], zero-padded.
    c: [B, ny, nx, C]."""
    B, ny, nx, C = c.shape
    out = c
    if dy:
        pad = jnp.zeros((B, abs(dy), nx, C), c.dtype)
        out = (jnp.concatenate([out[:, dy:], pad], axis=1) if dy > 0
               else jnp.concatenate([pad, out[:, :dy]], axis=1))
    if dx:
        pad = jnp.zeros((B, ny, abs(dx), C), c.dtype)
        out = (jnp.concatenate([out[:, :, dx:], pad], axis=2) if dx > 0
               else jnp.concatenate([pad, out[:, :, :dx]], axis=2))
    return out


def stencil_srcs(c: jnp.ndarray) -> jnp.ndarray:
    """All 9 GRID_OFFSETS shifts of a canvas in one padded extraction:
    ``out[b, y, x, o] = c[y + dy_o, x + dx_o]`` (zero outside), i.e.
    ``out[..., o, :] == _shift2d(c, *GRID_OFFSETS[o])``.

    ONE pad + 9 static slices + a stack replace the per-offset
    concatenate chains (2 materialized concats each) — the dense tail
    is pure small-op launch overhead at pooled-grid sizes (~0.05% MFU,
    BENCH_NOTES.md §3), so op count IS the cost model here."""
    from dagr_tpu.core.types import GRID_OFFSETS

    B, ny, nx, C = c.shape
    p = jnp.pad(c, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jnp.stack(
        [p[:, 1 + dy:1 + dy + ny, 1 + dx:1 + dx + nx]
         for (dy, dx) in GRID_OFFSETS], axis=3)       # [B, ny, nx, 9, C]


def stencil_basis(
    pos: jnp.ndarray,        # f32 [B, G, >=2]
    *,
    grid_hw,
    max_value: float,
    kernel_size: int = 5,
) -> jnp.ndarray:
    """Per-offset spline basis on a dense cell grid: [B, G, 9, P].
    Shares across the convs of one level (like edge_basis).  All 9
    offsets ride one stencil_srcs extraction + ONE bilinear_basis call
    (the per-offset loop launched ~10 small ops per offset)."""
    ny, nx = grid_hw
    B = pos.shape[0]
    pc = pos[..., :2].reshape(B, ny, nx, 2)
    src_p = stencil_srcs(pc)                          # [B, ny, nx, 9, 2]
    attr = (src_p - pc[..., None, :]) / (2.0 * max_value) + 0.5
    bas = bilinear_basis(jnp.clip(attr, 0.0, 1.0), kernel_size)
    return bas.reshape(B, ny * nx, src_p.shape[3], kernel_size ** 2)


@functools.partial(
    jax.jit,
    static_argnames=("grid_hw", "kernel_size", "max_value"),
)
def stencil_spline_conv(
    x: jnp.ndarray,            # f32 [B, G, Cin], G = ny * nx cell table
    pos: jnp.ndarray,          # f32 [B, G, >=2]
    nbr_mask: jnp.ndarray,     # bool [B, G, 9] (GRID_OFFSETS slot order)
    weight: jnp.ndarray,       # f32 [P, Cin, Cout]
    root_weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    basis: Optional[jnp.ndarray] = None,   # f32 [B, G, 9, P] precomputed
    *,
    grid_hw,                   # (ny, nx)
    max_value: float,
    kernel_size: int = 5,
) -> jnp.ndarray:
    """Spline conv specialized to the pooled levels' dense 9-stencil
    grids (reference pooled graphs, pooling.py:58-64): every neighbor
    list is exactly the 3x3 cell stencil (ops/pool.py builds it that
    way), so source features/positions are SHIFTS of the dense canvas —
    no gathers at all, pure dense VPU work + one MXU matmul.  Matches
    spline_conv numerically (tested)."""
    from dagr_tpu.core.types import GRID_OFFSETS

    ny, nx = grid_hw
    B, G, cin = x.shape
    P, _, cout = weight.shape
    xc = x.reshape(B, ny, nx, cin)
    m = nbr_mask.reshape(B, ny, nx, len(GRID_OFFSETS))

    if basis is not None:
        bas_all = basis.reshape(B, ny, nx, len(GRID_OFFSETS), P)
    else:
        pc = pos[..., :2].reshape(B, ny, nx, 2)
        src_p = stencil_srcs(pc)
        attr = (src_p - pc[..., None, :]) / (2.0 * max_value) + 0.5
        bas_all = bilinear_basis(
            jnp.clip(attr, 0.0, 1.0), kernel_size)    # [B, ny, nx, 9, P]
    bas_m = bas_all * m[..., None]

    # contract the offset axis by SHIFT-ACCUMULATE over padded slices:
    # expressing it as a batched dot_general lowers to B*G tiny
    # [P, 9] @ [9, cin] matmuls, which this backend runs 37x slower
    # than the fused 9-step multiply-add (0.066 vs 2.48 ms at the L2
    # serve-tail shape; scripts/microbench6.py — variant D vs A)
    pad = jnp.pad(xc, ((0, 0), (1, 1), (1, 1), (0, 0)))
    g = jnp.zeros((B, ny, nx, P, cin), jnp.float32)
    for o, (dy, dx) in enumerate(GRID_OFFSETS):
        so = pad[:, 1 + dy:1 + dy + ny, 1 + dx:1 + dx + nx]
        g = g + bas_m[:, :, :, o, :, None] * so[..., None, :]
    out = jnp.dot(g.reshape(B * G, P * cin), weight.reshape(P * cin, cout),
                  preferred_element_type=jnp.float32)
    out = out.reshape(B, G, cout)
    if root_weight is not None:
        out = out + jnp.dot(x, root_weight,
                            preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out


def nodeset_conv(ns, weight, root_weight=None, bias=None, basis=None, *,
                 max_value: float, kernel_size: int = 5,
                 node_chunk: int = 2048) -> jnp.ndarray:
    """Dispatch: pooled dense-grid NodeSets (grid_hw set — their
    neighbor lists are exactly the 9-stencil) take the shift-based
    stencil conv; the event level takes the gather-based conv.  The
    shared ``basis`` is [B, G, 9, P] for stencil levels (stencil_basis
    or edge_basis — identical there) or [B, N, K, P] for the event
    level (edge_basis)."""
    if ns.grid_hw is not None:
        return stencil_spline_conv(
            ns.feat, ns.pos, ns.graph.nbr_mask, weight, root_weight, bias,
            basis, grid_hw=ns.grid_hw, max_value=max_value,
            kernel_size=kernel_size)
    return spline_conv(
        ns.feat, ns.pos, ns.graph.nbr, ns.graph.nbr_mask, weight,
        root_weight, bias, basis, max_value=max_value,
        kernel_size=kernel_size, node_chunk=node_chunk)


def level_basis(ns, *, max_value: float,
                kernel_size: int = 5) -> jnp.ndarray:
    """Shared per-level conv basis (shape matches nodeset_conv)."""
    if ns.grid_hw is not None:
        return stencil_basis(ns.pos, grid_hw=ns.grid_hw,
                             max_value=max_value, kernel_size=kernel_size)
    if ns.graph.nbr_dpos is not None:
        # edge geometry carried algebraically by the graph builder —
        # no per-edge position gather needed
        attr = ns.graph.nbr_dpos / (2.0 * max_value) + 0.5
        return bilinear_basis(jnp.clip(attr, 0.0, 1.0), kernel_size)
    return edge_basis(ns.pos, ns.graph.nbr, max_value=max_value,
                      kernel_size=kernel_size)


@functools.partial(
    jax.jit,
    static_argnames=("kernel_size", "max_value", "node_chunk", "impl"),
)
def spline_conv(
    x: jnp.ndarray,            # f32 [B, N, Cin]
    pos: jnp.ndarray,          # f32 [B, N, >=2] normalized positions
    nbr: jnp.ndarray,          # i32 [B, N, K] source index per (dst, slot)
    nbr_mask: jnp.ndarray,     # bool [B, N, K]
    weight: jnp.ndarray,       # f32 [P, Cin, Cout], P = kernel_size**2
    root_weight: Optional[jnp.ndarray] = None,  # f32 [Cin, Cout]
    bias: Optional[jnp.ndarray] = None,         # f32 [Cout]
    basis: Optional[jnp.ndarray] = None,        # f32 [B, N, K, P] precomputed
    *,
    max_value: float,
    kernel_size: int = 5,
    node_chunk: int = 2048,
    impl: str = "node_dot",
) -> jnp.ndarray:
    """Masked spline message passing; returns [B, N, Cout].

    Matches MySplineConv._forward (reference: spline_conv.py:64-78):
    out = sum_{src in nbr} basis(attr) . W . x_src  (+ x @ root) (+ b).
    Invalid slots and invalid nodes contribute nothing.

    impl:
    * "node" — factored: aggregate basis-weighted sources per (dst, tap)
      first (``g[n,p,c] = sum_k basis·x_src``, a small batched VPU
      contraction), then ONE node-level MXU matmul
      ``g.reshape(N, P*Cin) @ W``.  MXU FLOPs per node drop from
      K·Cin·P·Cout to P·Cin·Cout — ~K·Cout/(K+Cout) = 8x fewer at both
      the event level (K=16) and the pooled stencils (K=9, Cout=64).
    * "edge" — edge-major: per-edge ``z = x_src @ W[Cin, P*Cout]`` then
      a VPU contraction with the basis.  Kept as the numerics oracle.
    """
    B, N, cin = x.shape
    K = nbr.shape[-1]
    P, _, cout = weight.shape
    assert P == kernel_size * kernel_size

    M = B * N
    if M <= 4096:
        # small pooled levels: single shot, no lax.map chunking
        node_chunk = max(node_chunk, M)
    x_flat = x.reshape(M, cin)
    pos_flat = pos[..., :2].reshape(M, 2)
    base = (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
    nbr_flat = (nbr + base).reshape(M, K)
    mask_flat = nbr_mask.reshape(M, K)

    pad_to = ((M + node_chunk - 1) // node_chunk) * node_chunk
    pad = pad_to - M

    def padded(a, fill=0):
        cfg = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, cfg, constant_values=fill).reshape(
            (-1, node_chunk) + a.shape[1:]
        )

    def chunk_fn(args):
        if basis is None:
            nbr_c, mask_c, pos_c = args        # [T, K], [T, K], [T, 2]
        else:
            nbr_c, mask_c, basis_c = args      # basis_c [T, K, P]
        T = nbr_c.shape[0]
        idx = jnp.clip(nbr_c, 0, M - 1).reshape(-1)
        # NB: row gathers formulated as take_along_axis — the axon
        # backend executes x[idx] ~100x slower than this form
        x_src = jnp.take_along_axis(
            x_flat, idx[:, None], axis=0)                     # [T*K, Cin]
        if basis is None:
            pos_src = jnp.take_along_axis(pos_flat, idx[:, None], axis=0)
            attr = (pos_src - jnp.repeat(pos_c, K, axis=0)) \
                / (2.0 * max_value) + 0.5
            b_c = bilinear_basis(jnp.clip(attr, 0.0, 1.0), kernel_size)
        else:
            b_c = basis_c.reshape(T * K, P)
        if impl.startswith("node"):
            b_m = b_c.reshape(T, K, P) * mask_c[..., None]
            # g[t, p, c] = sum_k basis[t, k, p] * x_src[t, k, c]
            if impl == "node_dot":
                # batched dot on the MXU: measured 2x the fused
                # multiply+sum at the event shape (round 3 — the
                # earlier "beats a batched dot" note dated from the
                # era of the wrong 1 TF/s matmul measurement)
                g = jax.lax.dot_general(
                    b_m, x_src.reshape(T, K, cin),
                    dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)       # [T, P, Cin]
            else:
                g = jnp.sum(
                    b_m[:, :, :, None] * x_src.reshape(T, K, 1, cin),
                    axis=1)                                    # [T, P, Cin]
            w_flat = weight.reshape(P * cin, cout)
            return jnp.dot(g.reshape(T, P * cin), w_flat,
                           preferred_element_type=jnp.float32)
        msg = _edge_messages(x_src, b_c, weight)              # [T*K, Cout]
        msg = msg.reshape(T, K, cout) * mask_c[..., None]
        return msg.sum(axis=1)

    third = (
        padded(pos_flat) if basis is None
        else padded(basis.reshape(M, K, P))
    )
    args = (padded(nbr_flat), padded(mask_flat, False), third)
    if pad_to == node_chunk:
        out = chunk_fn(jax.tree.map(lambda a: a[0], args))[:M]
    else:
        out = jax.lax.map(chunk_fn, args).reshape(pad_to, cout)[:M]
    out = out.reshape(B, N, cout)

    if root_weight is not None:
        out = out + jnp.dot(x, root_weight, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out
