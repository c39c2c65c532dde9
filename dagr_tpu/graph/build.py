"""Jittable, statically-shaped event-graph construction.

Replaces the reference's per-pixel FIFO + spiral-scan CUDA kernels
(reference: src/dagr/graph/ev_graph.cu:15-128, graph/utils.py:6-23)
with a sort-and-binary-search formulation that XLA compiles to fixed
shapes:

1.  Events are stably sorted by linearized pixel id; within one pixel
    the stable sort preserves the time/index order the CUDA queue would
    have, so "the newest <=Q events at pixel p that are older than event
    i and within delta_t" is a *contiguous run* of the sorted array,
    found with binary searches (segment bounds via searchsorted, then a
    vectorized in-segment bisection — all int32, no x64 needed).
2.  The spiral pixel order (reference: src/dagr/graph/spiral.h) becomes
    a static list of S=(2r+1)^2 offsets; per (event, cell) candidate
    counts are cumulated and the first K-1 candidates in (spiral order,
    recency) are selected — bit-identical neighbor selection to the
    CUDA kernel's tie-breaking.

The search runs in event chunks under ``lax.map`` so peak memory is
O(chunk * S) regardless of N.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dagr_tpu.core.types import EventGraph
from dagr_tpu.graph.reference import spiral_offsets


def _seg_lower_bound(arr: jnp.ndarray, lo, hi, val, iters: int):
    """First index p in [lo, hi) with arr[p] >= val (arr ascending on the
    segment).  lo/hi/val may be any broadcastable int32 shape."""
    n = arr.shape[0]

    def body(_, lh):
        lo, hi = lh
        mid = (lo + hi) // 2
        v = arr[jnp.clip(mid, 0, n - 1)]
        go_right = (v < val) & (lo < hi)
        return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "radius", "delta_t_us", "max_neighbors",
        "queue_size", "chunk",
    ),
)
def build_graph(
    pos_px: jnp.ndarray,   # i32 [B, N, 3] (x, y, t_us), time-sorted per sample
    mask: jnp.ndarray,     # bool [B, N], valid events form a prefix
    *,
    width: int,
    height: int,
    radius: int,
    delta_t_us: int,
    max_neighbors: int,
    queue_size: int = 128,
    chunk: int = 2048,
) -> EventGraph:
    B, N, _ = pos_px.shape
    K = max_neighbors
    HW = height * width
    assert B * HW < 2**31 - 1, "pixel id must fit int32"
    PAD_LIN = np.int32(B * HW)  # sentinel pixel id for padding events
    M = B * N
    ITERS = int(np.ceil(np.log2(max(M, 2)))) + 1

    offs = np.array(spiral_offsets(radius), dtype=np.int32)  # [S, 2] (dx, dy)

    x = pos_px[..., 0].astype(jnp.int32)
    y = pos_px[..., 1].astype(jnp.int32)

    b_ids = jnp.arange(B, dtype=jnp.int32)[:, None]
    lin = jnp.where(mask, b_ids * HW + y * width + x, PAD_LIN)  # [B, N]

    lin_f = lin.reshape(-1)
    order = jnp.argsort(lin_f, stable=True).astype(jnp.int32)   # [M]
    s_lin = lin_f[order]
    s_within = (order % N).astype(jnp.int32)   # within-sample index, ascending per segment
    s_t = pos_px[..., 2].reshape(-1)[order]    # ascending per segment (time-sorted input)

    def search_chunk(args):
        """args: (xq, yq, tq, iq, bq, mq) each [C] for one chunk of
        destination events.  Returns (nbr [C, K-1], mask [C, K-1])."""
        xq, yq, tq, iq, bq, mq = args
        C = xq.shape[0]

        xn = xq[:, None] + offs[None, :, 0]          # [C, S]
        yn = yq[:, None] + offs[None, :, 1]
        inb = (xn >= 0) & (xn < width) & (yn >= 0) & (yn < height) & mq[:, None]

        p = bq[:, None] * HW + yn * width + xn
        p = jnp.where(inb, p, PAD_LIN)

        g_lo = jnp.searchsorted(s_lin, p, side="left").astype(jnp.int32)
        g_hi = jnp.searchsorted(s_lin, p, side="right").astype(jnp.int32)
        # first in-segment position with within-index >= i  (idx < i run end)
        pos_i = _seg_lower_bound(s_within, g_lo, g_hi, iq[:, None], ITERS)
        # first in-segment position with t >= t_i - delta_t
        t_lo = _seg_lower_bound(s_t, g_lo, g_hi, tq[:, None] - delta_t_us, ITERS)

        lo = jnp.maximum(jnp.maximum(g_lo, g_hi - queue_size), t_lo)
        hi = pos_i
        cnt = jnp.where(inb, jnp.maximum(hi - lo, 0), 0)              # [C, S]

        cum = jnp.cumsum(cnt, axis=-1)                                # [C, S]
        slots = jnp.arange(K - 1, dtype=jnp.int32)                    # [K-1]
        # first spiral cell where the cumulative count exceeds the slot id
        hit = cum[:, None, :] > slots[None, :, None]                  # [C, K-1, S]
        s_sel = jnp.argmax(hit, axis=-1).astype(jnp.int32)            # [C, K-1]
        any_hit = jnp.any(hit, axis=-1)

        cum_prev = jnp.concatenate(
            [jnp.zeros((C, 1), cum.dtype), cum[:, :-1]], axis=-1
        )
        within_cell = slots[None, :] - jnp.take_along_axis(cum_prev, s_sel, axis=1)
        hi_sel = jnp.take_along_axis(hi, s_sel, axis=1)
        sorted_pos = jnp.clip(hi_sel - 1 - within_cell, 0, M - 1)     # [C, K-1]

        flat_src = order[sorted_pos]
        src = flat_src - bq[:, None] * N
        valid = any_hit & mq[:, None]
        return jnp.where(valid, src, 0).astype(jnp.int32), valid

    flat_i = jnp.tile(jnp.arange(N, dtype=jnp.int32)[None], (B, 1)).reshape(-1)
    flat_b = jnp.repeat(jnp.arange(B, dtype=jnp.int32), N)

    pad_to = ((M + chunk - 1) // chunk) * chunk
    pad = pad_to - M

    def padded(a, fill=0):
        return jnp.pad(a, (0, pad), constant_values=fill).reshape(-1, chunk)

    args = (
        padded(x.reshape(-1)), padded(y.reshape(-1)),
        padded(pos_px[..., 2].reshape(-1)),
        padded(flat_i), padded(flat_b), padded(mask.reshape(-1), False),
    )

    nbr_rest, mask_rest = jax.lax.map(search_chunk, args)
    nbr_rest = nbr_rest.reshape(pad_to, K - 1)[:M].reshape(B, N, K - 1)
    mask_rest = mask_rest.reshape(pad_to, K - 1)[:M].reshape(B, N, K - 1)

    self_idx = jnp.tile(jnp.arange(N, dtype=jnp.int32)[None, :, None], (B, 1, 1))
    nbr = jnp.concatenate([self_idx, nbr_rest], axis=-1)
    nbr_mask = jnp.concatenate([mask[..., None], mask_rest], axis=-1)
    return EventGraph(nbr=nbr, nbr_mask=nbr_mask)


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "radius", "delta_t_us", "max_neighbors",
        "queue_size",
    ),
)
def search_edges_into_store(
    store_x: jnp.ndarray,     # i32 [N] store pixel x (slot order == time order)
    store_y: jnp.ndarray,     # i32 [N]
    store_t: jnp.ndarray,     # i32 [N] timestamps (us)
    store_valid: jnp.ndarray, # bool [N]
    q_x: jnp.ndarray,         # i32 [C] query (new-event) pixel x
    q_y: jnp.ndarray,
    q_t: jnp.ndarray,
    q_idx: jnp.ndarray,       # i32 [C] query's own slot index in the store
    q_valid: jnp.ndarray,     # bool [C]
    *,
    width: int,
    height: int,
    radius: int,
    delta_t_us: int,
    max_neighbors: int,
    queue_size: int = 128,
):
    """Edge search for a chunk of new events against the full event
    store — the streaming-engine counterpart of the per-event CUDA path
    (reference: graph/ev_graph.py:62-103 forward with collect_edges,
    ev_graph.cu:130-166 single-event insertion + :15-128 search).

    The store must already contain the queries (insert-then-search,
    like the reference).  Returns (nbr [C, K-1], mask [C, K-1]) of
    non-self edges in (spiral order, recency) priority; combine with the
    self edge at slot 0 like build_graph does.
    """
    N = store_x.shape[0]
    K = max_neighbors
    ITERS = int(np.ceil(np.log2(max(N, 2)))) + 1
    PAD_LIN = np.int32(height * width)
    offs = np.array(spiral_offsets(radius), dtype=np.int32)

    lin = jnp.where(store_valid, store_y * width + store_x, PAD_LIN)
    order = jnp.argsort(lin, stable=True).astype(jnp.int32)
    s_lin = lin[order]
    s_within = order                     # slot index == temporal order
    s_t = store_t[order]

    xn = q_x[:, None] + offs[None, :, 0]                     # [C, S]
    yn = q_y[:, None] + offs[None, :, 1]
    inb = (xn >= 0) & (xn < width) & (yn >= 0) & (yn < height) & q_valid[:, None]
    p = jnp.where(inb, yn * width + xn, PAD_LIN)

    g_lo = jnp.searchsorted(s_lin, p, side="left").astype(jnp.int32)
    g_hi = jnp.searchsorted(s_lin, p, side="right").astype(jnp.int32)
    pos_i = _seg_lower_bound(s_within, g_lo, g_hi, q_idx[:, None], ITERS)
    t_lo = _seg_lower_bound(s_t, g_lo, g_hi, q_t[:, None] - delta_t_us, ITERS)

    lo = jnp.maximum(jnp.maximum(g_lo, g_hi - queue_size), t_lo)
    hi = pos_i
    cnt = jnp.where(inb, jnp.maximum(hi - lo, 0), 0)

    C = q_x.shape[0]
    cum = jnp.cumsum(cnt, axis=-1)
    slots = jnp.arange(K - 1, dtype=jnp.int32)
    hit = cum[:, None, :] > slots[None, :, None]
    s_sel = jnp.argmax(hit, axis=-1).astype(jnp.int32)
    any_hit = jnp.any(hit, axis=-1)
    cum_prev = jnp.concatenate([jnp.zeros((C, 1), cum.dtype), cum[:, :-1]], axis=-1)
    within_cell = slots[None, :] - jnp.take_along_axis(cum_prev, s_sel, axis=1)
    hi_sel = jnp.take_along_axis(hi, s_sel, axis=1)
    sorted_pos = jnp.clip(hi_sel - 1 - within_cell, 0, N - 1)
    src = order[sorted_pos]
    valid = any_hit & q_valid[:, None]
    return jnp.where(valid, src, 0).astype(jnp.int32), valid


def build_graph_from_batch(events, cfg) -> EventGraph:
    """Convenience wrapper mirroring EV_TGN.forward
    (reference: model/layers/ev_tgn.py:39-58)."""
    return build_graph(
        events.pos_px(),
        events.mask,
        width=events.width,
        height=events.height,
        radius=cfg.radius_px(events.width),
        delta_t_us=cfg.delta_t_us(),
        max_neighbors=cfg.max_neighbors,
        queue_size=cfg.max_queue_size,
    )
