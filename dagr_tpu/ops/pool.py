"""Voxel-grid graph pooling.

TPU-native replacement for the reference Pooling module
(reference: src/dagr/model/layers/pooling.py:19-97), which uses
torch-cluster ``grid_cluster`` + ``torch.unique`` + torch-scatter.
None of that is static-shape; here the pooled level is a *dense* cell
table of ``ny * nx`` nodes (node id == cell id == cx + nx * cy, exactly
grid_cluster's linearization order with x fastest), empty cells masked.
``unique``/``consecutive_cluster`` disappear entirely — they only
compact the same table.

The pooled graph's edges are the 9-offset stencil (GRID_OFFSETS): an
event-graph edge spans < 1 cell in each dimension (radius_px/W < vx by
construction of the reference's pooling dims), and a level-l stencil
edge spans <= 1 cell of level l+1, so every pooled edge connects cells
at Chebyshev distance <= 1.  Out-of-stencil fine edges (impossible for
reference geometries) are dropped, and a test asserts the geometry.

Reproduced semantics, line for line against the reference:
 * cluster id from clamped positions           (pooling.py:55-57)
 * self-loop removal (default)                 (pooling.py:59-64)
 * edge dedup — free, adjacency is boolean     (pooling.py:60-64)
 * optional temporal-ordering filter t_dst>t_src on per-cell max t
                                               (pooling.py:69-72)
 * max or mean feature aggregation             (pooling.py:74-77)
 * mean position, x/y floored to pixel centers (pooling.py:47-49,86)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dagr_tpu.core.types import EventGraph, NodeSet, GRID_OFFSETS, GRID_SELF_OFFSET
from dagr_tpu.ops.spline import stencil_srcs


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid_ny", "grid_nx", "width", "height", "aggr",
        "keep_temporal_ordering", "self_loop", "fine_hw",
    ),
)
def pool_graph(
    feat: jnp.ndarray,        # f32 [B, N, C]
    pos: jnp.ndarray,         # f32 [B, N, 3] normalized (x, y, t)
    mask: jnp.ndarray,        # bool [B, N]
    nbr: jnp.ndarray,         # i32 [B, N, K]
    nbr_mask: jnp.ndarray,    # bool [B, N, K]
    nbr_dpos: jnp.ndarray = None,   # f32 [B, N, K, 2] builder edge deltas
    *,
    grid_ny: int,
    grid_nx: int,
    width: int,
    height: int,
    aggr: str = "max",
    keep_temporal_ordering: bool = False,
    self_loop: bool = False,
    fine_hw=None,             # (ny, nx) when the FINE level is itself a
                              # dense stencil grid (grid_hw set): its
                              # nbr list is exactly the 9-offset stencil
                              # in GRID_OFFSETS order, so per-edge source
                              # lookups become canvas slices (no gathers)
):
    """Returns (feat', pos', mask', nbr', nbr_mask', tmax') on the
    ``grid_ny * grid_nx`` cell table (K' = 9 stencil slots).

    Precondition when ``nbr_dpos`` is given: positions must be
    pixel-quantized (``pos[..., 0] * width`` and ``pos[..., 1] * height``
    integral, as produced by the graph builder and the repo loaders),
    and ``nbr_mask`` must imply a valid source event.  The fast path
    reconstructs each source's pixel as ``dst_px + round(dpos * W)``;
    sub-pixel destination positions would shift the recovered source
    cell silently.  Pass ``nbr_dpos=None`` to fall back to gathering
    the sources' own (arbitrary) positions."""
    assert aggr in ("max", "mean")
    B, N, C = feat.shape
    ncells = grid_ny * grid_nx
    # grid_cluster clamps pos to [0, 0.9999999] (reference: pooling.py:30-31)
    px = jnp.clip(pos[..., 0], 0.0, 0.9999999)
    py = jnp.clip(pos[..., 1], 0.0, 0.9999999)
    cx = jnp.clip((px * grid_nx).astype(jnp.int32), 0, grid_nx - 1)
    cy = jnp.clip((py * grid_ny).astype(jnp.int32), 0, grid_ny - 1)
    cell = cx + grid_nx * cy                                   # [B, N]
    seg = jnp.where(mask, cell, ncells)                       # overflow bin
    # batch folds into the segment id (one flat segment op instead of a
    # vmapped one per sample — vmapped scatter lowering loses the fast
    # path on this backend, the same lesson as the graph builder)
    seg_flat = (jnp.arange(B, dtype=jnp.int32)[:, None] * (ncells + 1)
                + seg).reshape(B * N)

    def seg_sum(v):
        out = jax.ops.segment_sum(
            v.reshape((B * N,) + v.shape[2:]), seg_flat,
            num_segments=B * (ncells + 1))
        return out.reshape((B, ncells + 1) + out.shape[1:])[:, :ncells]

    def seg_max(v):
        out = jax.ops.segment_max(
            v.reshape((B * N,) + v.shape[2:]), seg_flat,
            num_segments=B * (ncells + 1))
        return out.reshape((B, ncells + 1) + out.shape[1:])[:, :ncells]

    count = seg_sum(mask.astype(jnp.int32))                   # [B, ncells]
    cmask = count > 0

    if aggr == "max":
        # mask invalid rows to -inf so they never win
        big_neg = jnp.finfo(feat.dtype).min
        fmasked = jnp.where(mask[..., None], feat, big_neg)
        pooled = seg_max(fmasked)
        pooled = jnp.where(cmask[..., None], pooled, 0.0)
    else:
        pooled = seg_sum(jnp.where(mask[..., None], feat, 0.0))
        pooled = pooled / jnp.maximum(count[..., None], 1)

    pos_sum = seg_sum(jnp.where(mask[..., None], pos, 0.0))
    pos_mean = pos_sum / jnp.maximum(count[..., None], 1)
    # round x, y to pixel centers (reference: pooling.py:47-49,86)
    pxy = jnp.floor((pos_mean[..., :2] + 1e-5) * jnp.array([width, height], pos.dtype))
    pxy = pxy / jnp.array([width, height], pos.dtype)
    pos_out = jnp.concatenate([pxy, pos_mean[..., 2:]], axis=-1)
    pos_out = jnp.where(cmask[..., None], pos_out, 0.0)

    tmax = seg_max(jnp.where(mask, pos[..., 2], -jnp.inf))
    tmax = jnp.where(cmask, tmax, -jnp.inf)                   # [B, ncells]

    # ---- pool the fine edges into stencil adjacency ----------------------
    K = nbr.shape[-1]
    if nbr_dpos is not None:
        # edge geometry is algebraic (graph builder by-product): recover
        # the source's integer pixel as dst_px + delta_px and normalize
        # by the SAME float division that produced the stored positions,
        # so the cell assignment is bit-identical to gathering the
        # source's own position — and needs no per-edge gathers
        x_dst_px = jnp.floor(pos[..., 0:1] * width + 1e-3)
        y_dst_px = jnp.floor(pos[..., 1:2] * height + 1e-3)
        sxn = (x_dst_px + jnp.round(nbr_dpos[..., 0] * width)) / width
        syn = (y_dst_px + jnp.round(nbr_dpos[..., 1] * height)) / height
        sx = jnp.clip(sxn, 0.0, 0.9999999)
        sy = jnp.clip(syn, 0.0, 0.9999999)
        c_src_x = jnp.clip((sx * grid_nx).astype(jnp.int32), 0, grid_nx - 1)
        c_src_y = jnp.clip((sy * grid_ny).astype(jnp.int32), 0, grid_ny - 1)
        # builder edges are masked iff src is a valid event
        src_valid = nbr_mask
    elif fine_hw is not None:
        # fine level is a dense stencil grid: slot o's source is the
        # cell at GRID_OFFSETS[o], so its coarse cell / validity are
        # SHIFTED canvases of (cx, cy, mask) — three [B, N*9]-row
        # gathers become padded slices (out-of-frame slots read the
        # zero pad; nbr_mask is already False there)
        fny, fnx = fine_hw
        cxy = jnp.stack([cx, cy], axis=-1).reshape(B, fny, fnx, 2)
        s_xy = stencil_srcs(cxy).reshape(B, N, K, 2)
        c_src_x, c_src_y = s_xy[..., 0], s_xy[..., 1]
        src_valid = stencil_srcs(
            mask.reshape(B, fny, fnx, 1)).reshape(B, N, K)
    else:
        src = jnp.clip(nbr, 0, N - 1)
        c_src_x = jnp.take_along_axis(
            cx, src.reshape(B, -1), axis=1).reshape(B, N, K)
        c_src_y = jnp.take_along_axis(
            cy, src.reshape(B, -1), axis=1).reshape(B, N, K)
        src_valid = jnp.take_along_axis(
            mask, src.reshape(B, -1), axis=1
        ).reshape(B, N, K)
    dx = c_src_x - cx[..., None]
    dy = c_src_y - cy[..., None]
    in_stencil = (jnp.abs(dx) <= 1) & (jnp.abs(dy) <= 1)
    o = (dy + 1) * 3 + (dx + 1)                               # GRID_OFFSETS order
    evalid = nbr_mask & mask[..., None] & src_valid & in_stencil
    if not self_loop:
        evalid = evalid & (o != GRID_SELF_OFFSET)             # pooling.py:62
    # per-node 9-slot offset mask first (VPU), then segment N ROWS by
    # dst cell: scatter cost on this backend is per row, so reducing
    # the K axis before the scatter cuts an 800k-item segment_max to a
    # 50k-row one (~8x; scripts/microbench2.py measurements)
    bits = jnp.any(
        (o[..., None] == jnp.arange(9, dtype=o.dtype)) & evalid[..., None],
        axis=2)                                               # [B, N, 9]
    adj = seg_max(bits.astype(jnp.int32)) > 0                 # [B, ncells, 9]

    # ---- stencil neighbor list on the cell table -------------------------
    cid = jnp.arange(ncells, dtype=jnp.int32)
    ccx, ccy = cid % grid_nx, cid // grid_nx
    offs = jnp.array(GRID_OFFSETS, dtype=jnp.int32)           # [9, 2] (dy, dx)
    nx_ = ccx[:, None] + offs[None, :, 1]
    ny_ = ccy[:, None] + offs[None, :, 0]
    inb = (nx_ >= 0) & (nx_ < grid_nx) & (ny_ >= 0) & (ny_ < grid_ny)
    nbr_cells = jnp.clip(nx_ + grid_nx * ny_, 0, ncells - 1)  # [ncells, 9]

    nbr_out = jnp.broadcast_to(nbr_cells[None], (B, ncells, 9))
    # the coarse nbr list IS the 9-stencil, so source-cell validity and
    # t_max are shifted canvases (slices) rather than [B, ncells*9]-row
    # gathers; the zero pad reads False / 0.0 at out-of-frame slots,
    # which inb[None] masks anyway
    src_ok = stencil_srcs(
        cmask.reshape(B, grid_ny, grid_nx, 1)).reshape(B, ncells, 9)
    nbr_mask_out = adj & inb[None] & src_ok & cmask[..., None]

    if keep_temporal_ordering:
        # keep edge only if t_max(dst) > t_max(src)  (pooling.py:69-72)
        t_src = stencil_srcs(
            tmax.reshape(B, grid_ny, grid_nx, 1)).reshape(B, ncells, 9)
        nbr_mask_out = nbr_mask_out & (tmax[..., None] > t_src)

    return pooled, pos_out, cmask, nbr_out, nbr_mask_out, tmax


def pool_nodeset(
    ns: NodeSet,
    *,
    grid_ny: int,
    grid_nx: int,
    width: int,
    height: int,
    aggr: str = "max",
    keep_temporal_ordering: bool = False,
) -> NodeSet:
    """NodeSet-level wrapper (mirrors Pooling.forward, pooling.py:51-97)."""
    fine_hw = ns.grid_hw if (
        ns.grid_hw is not None and ns.graph.nbr.shape[-1] == 9
        and ns.graph.nbr_dpos is None) else None
    feat, pos, mask, nbr, nbr_mask, tmax = pool_graph(
        ns.feat, ns.pos, ns.mask, ns.graph.nbr, ns.graph.nbr_mask,
        ns.graph.nbr_dpos,
        grid_ny=grid_ny, grid_nx=grid_nx, width=width, height=height,
        aggr=aggr, keep_temporal_ordering=keep_temporal_ordering,
        fine_hw=fine_hw,
    )
    return NodeSet(
        feat=feat, pos=pos, mask=mask,
        graph=EventGraph(nbr=nbr, nbr_mask=nbr_mask),
        tmax=tmax, grid_hw=(grid_ny, grid_nx),
    )
