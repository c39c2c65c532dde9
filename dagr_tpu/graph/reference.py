"""Numpy oracle for the event-graph builder.

Implements, step for step, the semantics of the reference CUDA kernels
(reference: src/dagr/graph/ev_graph.cu:15-128 fill_edges_cuda_kernel,
:169-276 insert_in_queue_cuda_kernel, and the SpiralOut generator in
src/dagr/graph/spiral.h) so the fast builders can be property-tested
against it.  Not used in any hot path.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def spiral_offsets(radius: int):
    """Outward square-spiral (dx, dy) sequence starting at (0, 0)
    (reference: src/dagr/graph/spiral.h:1-16)."""
    x = y = 0
    layer, leg = 1, 0
    out = [(0, 0)]
    for _ in range((2 * radius + 1) ** 2 - 1):
        if leg == 0:
            x += 1
            if x == layer:
                leg = 1
        elif leg == 1:
            y += 1
            if y == layer:
                leg = 2
        elif leg == 2:
            x -= 1
            if -x == layer:
                leg = 3
        else:
            y -= 1
            if -y == layer:
                leg = 0
                layer += 1
        out.append((x, y))
    return out


def build_queue(
    batch: np.ndarray,
    pos: np.ndarray,
    indices: np.ndarray,
    B: int,
    Q: int,
    H: int,
    W: int,
    queue: np.ndarray | None = None,
) -> np.ndarray:
    """Per-pixel FIFO of the last Q event indices, newest at depth 0
    (reference: graph/utils.py:6-18 + ev_graph.cu:169-212)."""
    if queue is None:
        queue = np.full((B, Q, H, W), -1, dtype=np.int64)
    lin = pos[:, 0] + W * pos[:, 1] + W * H * batch
    # group per pixel and push (stable order keeps per-pixel temporal order)
    for p in np.unique(lin):
        sel = indices[lin == p]  # ascending (older -> newer)
        x = int(p % W)
        y = int((p // W) % H)
        b = int(p // (W * H))
        col = queue[b, :, y, x]
        n = len(sel)
        if n >= Q:
            col[:] = sel[::-1][:Q]
        else:
            col[n:] = col[:-n].copy() if n > 0 else col[n:]
            col[:n] = sel[::-1]
        queue[b, :, y, x] = col
    return queue


def fill_edges(
    batch: np.ndarray,
    pos: np.ndarray,
    all_timestamps: np.ndarray,
    indices: np.ndarray,
    queue: np.ndarray,
    max_num_neighbors: int,
    radius: int,
    delta_t_us: int,
    min_index: int = 0,
) -> np.ndarray:
    """Edge search (reference: ev_graph.cu:15-80).  Returns int64 [2, E]
    with rows (src, dst), src emitted before hitting the K cap, self
    edge first."""
    B, Q, H, W = queue.shape
    N = len(batch)
    offsets = spiral_offsets(radius)
    edges = []
    for e in range(N):
        num = 0
        x, y, ts = int(pos[e, 0]), int(pos[e, 1]), int(pos[e, 2])
        b = int(batch[e])
        edges.append((indices[e] - min_index, indices[e] - min_index))
        num += 1
        for (dx, dy) in offsets:
            if num >= max_num_neighbors:
                break
            xn, yn = x + dx, y + dy
            if not (0 <= xn < W and 0 <= yn < H):
                continue
            for q in range(Q):
                idx = queue[b, q, yn, xn]
                if idx < min_index:
                    break
                if indices[e] > idx:
                    dt = ts - int(all_timestamps[idx - min_index])
                    if dt > delta_t_us:
                        continue
                    edges.append((idx - min_index, indices[e] - min_index))
                    num += 1
                    if num >= max_num_neighbors:
                        break
    return np.array(edges, dtype=np.int64).T.reshape(2, -1)


def build_graph_dense(
    pos_px: np.ndarray,
    mask: np.ndarray,
    width: int,
    height: int,
    radius: int,
    delta_t_us: int,
    max_neighbors: int,
    queue_size: int = 128,
) -> Tuple[np.ndarray, np.ndarray]:
    """Oracle producing the dense [B, N, K] neighbor-list layout from the
    reference edge semantics.  pos_px: int [B, N, 3]; mask: bool [B, N].
    Events must be time-sorted per sample (as the datasets guarantee)."""
    Bn, N, _ = pos_px.shape
    K = max_neighbors
    nbr = np.zeros((Bn, N, K), dtype=np.int32)
    nbr_mask = np.zeros((Bn, N, K), dtype=bool)
    for b in range(Bn):
        valid = np.nonzero(mask[b])[0]
        if len(valid) == 0:
            continue
        pos = pos_px[b, valid]
        batch = np.zeros(len(valid), dtype=np.int64)
        indices = np.arange(len(valid))
        queue = build_queue(batch, pos, indices, 1, queue_size, height, width)
        edges = fill_edges(
            batch, pos, pos[:, 2], indices, queue, K, radius, delta_t_us
        )
        # pack per-destination in emission order (slot 0 = self)
        slot = np.zeros(len(valid), dtype=np.int64)
        for src, dst in edges.T:
            d = valid[dst]
            s = valid[src]
            k = slot[dst]
            nbr[b, d, k] = s
            nbr_mask[b, d, k] = True
            slot[dst] += 1
    return nbr, nbr_mask
