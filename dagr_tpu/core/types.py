"""Core pytree data structures.

Everything is statically shaped and masked.  The reference threads a
PyG ``Data`` object with ragged per-sample node/edge counts through the
network (reference: src/dagr/model/networks/net.py:108-190); here the
same information lives in dense ``[B, N, ...]`` arrays plus validity
masks so a single jit trace serves every batch.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EventBatch:
    """A padded batch of raw events.

    ``pos`` is normalized to [0, 1) as in the reference
    (reference: src/dagr/utils/buffers.py:33-44, format_data):
    pos = (x_px / W, y_px / H, t_us / time_window).
    """

    pos: jnp.ndarray          # f32 [B, N, 3]  normalized (x, y, t)
    feat: jnp.ndarray         # f32 [B, N, F]  node features (polarity in {0,1} or {-1,1})
    mask: jnp.ndarray         # bool [B, N]    valid events
    # static per-batch metadata
    width: int = struct.field(pytree_node=False, default=320)
    height: int = struct.field(pytree_node=False, default=240)
    time_window: int = struct.field(pytree_node=False, default=1_000_000)

    @property
    def batch_size(self) -> int:
        return self.pos.shape[0]

    @property
    def num_nodes(self) -> int:
        return self.pos.shape[1]

    def pos_px(self) -> jnp.ndarray:
        """Integer (x_px, y_px, t_us) positions
        (reference: model/layers/ev_tgn.py:11-16, denormalize_pos)."""
        denorm = jnp.array(
            [self.width, self.height, self.time_window], dtype=jnp.float32
        )
        return (self.pos * denorm[None, None, :] + 1e-3).astype(jnp.int32)


@struct.dataclass
class EventGraph:
    """Fixed-degree event graph: K neighbor slots per destination node.

    Slot 0 is always the self edge (reference: graph/ev_graph.cu:44-46).
    ``nbr`` holds within-sample *source* node indices; invalid slots
    point at node 0 and are masked by ``nbr_mask``.  The reference's
    ``2 x E`` growing edge list (graph/ev_graph.py:39-49) maps exactly
    onto this: every edge has src_i <= dst_i.
    """

    nbr: jnp.ndarray       # i32 [B, N, K]  source index per (dst, slot)
    nbr_mask: jnp.ndarray  # bool [B, N, K] valid edge slots

    @property
    def max_neighbors(self) -> int:
        return self.nbr.shape[-1]


@struct.dataclass
class NodeSet:
    """Node features + graph for the event (pre-pooling) stage."""

    feat: jnp.ndarray       # f32 [B, N, C]
    pos: jnp.ndarray        # f32 [B, N, 3] normalized
    mask: jnp.ndarray       # bool [B, N]
    graph: EventGraph

    @property
    def num_nodes(self) -> int:
        return self.feat.shape[1]


# offsets of the 9-cell neighborhood, order (dy, dx) row-major
GRID_OFFSETS: Tuple[Tuple[int, int], ...] = tuple(
    (dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
)
GRID_SELF_OFFSET = 4  # index of (0, 0) in GRID_OFFSETS


@struct.dataclass
class VoxelGrid:
    """A pooled graph living on a dense voxel grid.

    After the first voxel pooling the reference's graph has at most
    ``num_grid_cells`` nodes (reference: model/layers/pooling.py:34,43-45)
    and every edge connects cells at most one cell apart (edge length is
    bounded by the previous graph's Cartesian radius, which is < 2 cell
    widths).  We therefore store the pooled graph densely:

    * ``feat[b, y, x]``   — pooled features of cell (x, y), zero if empty
    * ``mask[b, y, x]``   — cell contains at least one node
    * ``pos[b, y, x]``    — mean node position, x/y floored to pixel
                             (reference: pooling.py:47-49,86)
    * ``tmax[b, y, x]``   — max t inside cell (for temporal-order edges,
                             reference: pooling.py:69-72)
    * ``adj[b, y, x, o]`` — True if an edge (src = cell + offset_o,
                             dst = cell) survived pooling; offset order
                             is GRID_OFFSETS; the self slot o=4 is the
                             (deduplicated) self loop, which the
                             reference removes (pooling.py:62) — kept
                             False here.

    SplineConv on this structure is a masked 9-offset stencil whose
    inner op is a dense matmul — the TPU-native replacement for
    scatter-based message passing.
    """

    feat: jnp.ndarray   # f32 [B, H', W', C]
    mask: jnp.ndarray   # bool [B, H', W']
    pos: jnp.ndarray    # f32 [B, H', W', 3]
    tmax: jnp.ndarray   # f32 [B, H', W']
    adj: jnp.ndarray    # bool [B, H', W', 9]

    @property
    def grid_hw(self) -> Tuple[int, int]:
        return self.feat.shape[1], self.feat.shape[2]


def shift2d(x: jnp.ndarray, dy: int, dx: int, fill=0):
    """Shift a [B, H, W, ...] array so out[b, y, x] = x[b, y+dy, x+dx],
    filling out-of-bounds with ``fill``.  Used to read the neighbor cell
    at offset (dy, dx) for every cell at once."""
    out = x
    if dy != 0:
        out = jnp.roll(out, -dy, axis=1)
    if dx != 0:
        out = jnp.roll(out, -dx, axis=2)
    H, W = x.shape[1], x.shape[2]
    yy = jnp.arange(H)[None, :, None]
    xx = jnp.arange(W)[None, None, :]
    valid = (yy + dy >= 0) & (yy + dy < H) & (xx + dx >= 0) & (xx + dx < W)
    valid = valid.reshape((1, H, W) + (1,) * (x.ndim - 3))
    return jnp.where(valid, out, fill)
