"""Core pytree data structures.

Everything is statically shaped and masked.  The reference threads a
PyG ``Data`` object with ragged per-sample node/edge counts through the
network (reference: src/dagr/model/networks/net.py:108-190); here the
same information lives in dense ``[B, N, ...]`` arrays plus validity
masks so a single jit trace serves every batch.
"""
from __future__ import annotations

from typing import Optional, Tuple

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
    # normalized (dx, dy) = pos_src - pos_dst per edge, emitted by the
    # graph builder as a by-product of spiral-cell selection.  Carrying
    # the edge GEOMETRY algebraically lets the conv basis and the
    # pooled-cell mapping be computed without per-edge position
    # gathers — gathers are the dominant cost on this backend.
    nbr_dpos: Optional[jnp.ndarray] = None   # f32 [B, N, K, 2]

    @property
    def max_neighbors(self) -> int:
        return self.nbr.shape[-1]


@struct.dataclass
class NodeSet:
    """Node features + graph at any level of the backbone pyramid.

    A single, uniform representation serves both the raw event graph
    (level 0: N = n_nodes capacity, K = max_neighbors) and every pooled
    level (node id == voxel-cell id ``cx + nx * cy``, K = 9 stencil
    slots in GRID_OFFSETS order).  The reference instead threads a PyG
    ``Data`` with a ragged ``2 x E`` edge list through every layer
    (reference: src/dagr/model/networks/net.py:108-190); here one conv
    implementation and one jit trace serve all levels.

    ``grid_hw`` is set on pooled levels: (ny, nx) of the voxel grid,
    letting the head reshape features to its dense ``B x ny x nx x C``
    canvas for free (the reference scatters into a zeroed canvas,
    src/dagr/model/layers/spline_conv.py:80-107).
    ``tmax`` is the per-cell max timestamp, used for the optional
    temporal-ordering edge filter (reference: pooling.py:69-72).
    """

    feat: jnp.ndarray       # f32 [B, N, C]
    pos: jnp.ndarray        # f32 [B, N, 3] normalized (x, y, t)
    mask: jnp.ndarray       # bool [B, N]
    graph: EventGraph
    tmax: Optional[jnp.ndarray] = None  # f32 [B, N]
    grid_hw: Optional[Tuple[int, int]] = struct.field(
        pytree_node=False, default=None
    )

    @property
    def num_nodes(self) -> int:
        return self.feat.shape[1]

    def canvas(self) -> jnp.ndarray:
        """Dense [B, ny, nx, C] view of a pooled level, empty cells
        zeroed (reference: spline_conv.py:80-107, to_dense)."""
        assert self.grid_hw is not None, "canvas() needs a pooled level"
        ny, nx = self.grid_hw
        B, N, C = self.feat.shape
        assert N == ny * nx
        feat = jnp.where(self.mask[..., None], self.feat, 0.0)
        return feat.reshape(B, ny, nx, C)


# offsets of the 9-cell neighborhood, order (dy, dx) row-major
GRID_OFFSETS: Tuple[Tuple[int, int], ...] = tuple(
    (dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
)
GRID_SELF_OFFSET = 4  # index of (0, 0) in GRID_OFFSETS
