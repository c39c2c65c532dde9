"""Jittable, statically-shaped event-graph construction.

Replaces the reference's per-pixel FIFO + spiral-scan CUDA kernels
(reference: src/dagr/graph/ev_graph.cu:15-128, graph/utils.py:6-23)
with a single-shot sort-merge join:

1.  Events are stably sorted by linearized pixel id; within one pixel
    the stable sort preserves time order, so "the newest <=Q events at
    pixel p older than event i and within delta_t" is a contiguous run
    of the sorted array.
2.  The run bounds for every (event, spiral-cell) candidate are
    obtained by ONE multi-key sort over insert / expire / query records
    (a lex merge join on (pixel, time, tie)) plus two cumulative sums —
    no per-query binary search.  Each data event contributes an insert
    record at t and an expire record at t + delta_t; per-pixel
    insert/expire totals are equal, so the two global prefix sums read
    at a query record directly give the event's data position and the
    dt-window lower bound.  The spiral pixel order
    (reference: src/dagr/graph/spiral.h) is a static list of
    S=(2r+1)^2 offsets; the first K-1 candidates in (spiral order,
    recency) are selected with fused compare-and-reduce over the
    per-event cumulative counts — bit-identical neighbor selection to
    the CUDA kernel's tie-breaking.

The formulation is tuned to the accelerator's cost model (measured,
scripts/microbench.py): sorts ~3.5 ms/M records, cumsums and
elementwise ops fast, but gathers ~7 ms/M indices and sequential op
chains (lax.map / searchsorted / bisect loops) catastrophically slow —
so everything is a handful of large fused array ops and the only
gathers left are the final neighbor picks.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dagr_tpu.core.types import EventGraph
from dagr_tpu.graph.reference import spiral_offsets


def _take(a: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Flat gather from a 1-D table.

    Measured backend quirk (scripts/microbench2.py): a width-1 gather
    costs ~6x more PER INDEX than a width>=2 row gather, so the table
    is widened to two identical columns and one column of the row
    gather is kept."""
    shape = idx.shape
    a2 = jnp.stack([a, a], axis=-1)                   # [N, 2]
    out = jnp.take_along_axis(a2, idx.reshape(-1)[:, None], axis=0)
    return out[:, 0].reshape(shape)


def _select_first_k(cnt, hi, order, K, M, cell_code=None):
    """Pick the first K-1 candidates in (spiral order, recency)
    priority.  cnt, hi: [M, S]; returns (src [M, K-1], valid
    [, per-edge cell code — one more weighted reduce when
    ``cell_code`` [S] is given]).

    The k-th candidate lives in the first spiral cell whose cumulative
    count exceeds k.  Rather than bisecting per (event, k) — gathers
    are the slow primitive on this backend — everything is a fused
    compare-and-reduce over the S axis (pure VPU, no gathers):
    ``cum`` is nondecreasing over s, so {s : cum[s] <= k} is a prefix
    whose length is the selected cell, its weighted sums recover the
    cell's cumulative offset and data-segment end, and the only gather
    left is the final (unavoidable) pick from ``order``."""
    cum = jnp.cumsum(cnt, axis=-1)                       # [M, S]
    slots = jnp.arange(K - 1, dtype=jnp.int32)           # [K-1]
    k_b = jnp.broadcast_to(slots[None], (cnt.shape[0], K - 1))

    le = cum[:, :, None] <= slots[None, None, :]         # [M, S, K-1]
    cum_prev = jnp.sum(cnt[:, :, None] * le, axis=1)     # cum[s_sel - 1]
    # cell s == s_sel  <=>  cum[s] > k and cum[s] - cnt[s] <= k (unique)
    at_sel = jnp.logical_not(le) & ((cum - cnt)[:, :, None] <= slots)
    hi_sel = jnp.sum(hi[:, :, None] * at_sel, axis=1)
    any_hit = cum[:, -1:] > k_b

    within = k_b - cum_prev
    sorted_pos = jnp.clip(hi_sel - 1 - within, 0, M - 1)
    src_flat = _take(order, sorted_pos)
    if cell_code is None:
        return src_flat, any_hit
    code_sel = jnp.sum(
        jnp.asarray(cell_code, jnp.int32)[None, :, None] * at_sel, axis=1)
    return src_flat, any_hit, code_sel


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
    chunk: int = 0,        # kept for API compatibility; unused
) -> EventGraph:
    """Precondition: timestamps must be window-relative, i.e.
    ``max(t) + delta_t_us < 2**31`` — the expire sort key is formed as
    ``t + delta_t_us`` in int32 (x64 is disabled on this backend), so
    raw epoch-scale microsecond timestamps would wrap and silently
    corrupt the dt-window counts.  Every in-repo caller normalizes to
    the window start (t <= time_window_us); external callers must too.
    """
    B, N, _ = pos_px.shape
    K = max_neighbors
    assert delta_t_us < 2**31 - 2**30, (
        "delta_t_us leaves no headroom for window-relative timestamps "
        "in the int32 expire key (see docstring)")
    HW = height * width
    assert B * HW < 2**31 - 1, "pixel id must fit int32"
    PAD = np.int32(B * HW)
    M = B * N
    offs = np.array(spiral_offsets(radius), dtype=np.int32)  # [S, 2] (dx, dy)
    S = offs.shape[0]

    x = pos_px[..., 0].astype(jnp.int32)
    y = pos_px[..., 1].astype(jnp.int32)
    t = pos_px[..., 2].astype(jnp.int32)

    b_ids = jnp.arange(B, dtype=jnp.int32)[:, None]
    lin = jnp.where(mask, b_ids * HW + y * width + x, PAD)   # [B, N]
    lin_f = lin.reshape(M)

    # stable sort by pixel: within a pixel, slot order == time order
    order = jnp.argsort(lin_f, stable=True).astype(jnp.int32)   # [M]

    # per-pixel event counts (cap check) + segment ENDS (queue cap)
    hist = jnp.zeros(B * HW + 1, jnp.int32).at[lin_f].add(
        mask.reshape(M).astype(jnp.int32))

    # candidate pixels: [M, S]
    xn = x.reshape(M)[:, None] + offs[None, :, 0]
    yn = y.reshape(M)[:, None] + offs[None, :, 1]
    inb = (
        (xn >= 0) & (xn < width) & (yn >= 0) & (yn < height)
        & mask.reshape(M)[:, None]
    )
    bq = jnp.repeat(jnp.arange(B, dtype=jnp.int32), N)[:, None]
    qpix = jnp.where(inb, bq * HW + yn * width + xn, PAD)       # [M, S]

    # ---- lex merge join over (pixel, time, tie) ----------------------
    # Three record types in ONE sort (keys: pixel, time, tie; +payload):
    #   insert_j at (lin_j, t_j)      — a data event entering the queue
    #   expire_j at (lin_j, t_j + dt) — the same event leaving the dt
    #                                    window (t_j < t_e - dt  <=>
    #                                    t_j + dt < t_e)
    #   query_(e,s) at (qpix, t_e)    — one per spiral cell
    # Per-pixel insert/expire totals are equal, so the cross-pixel terms
    # of the two global prefix sums cancel and, at a query record,
    #   prefix_insert = global data position (pixel-major) of t_e
    #   prefix_insert - prefix_expire = #data within the dt window.
    # This halves the sorted records vs. emitting a second query stream
    # for the dt bound and kills the per-event dt bisect entirely.
    # Tie order at equal (pixel, time): inserts with smaller slot ->
    # query e -> everything else; the dt window is inclusive
    # (reference: ev_graph.cu:64-66), so expire(t_j+dt == t_e) sorts
    # AFTER the query via tie = 2M + slot.
    e_flat = jnp.arange(M, dtype=jnp.int32)
    pix_all = jnp.concatenate([lin_f, lin_f, qpix.reshape(-1)])
    t_all = jnp.concatenate([
        t.reshape(M), t.reshape(M) + delta_t_us, jnp.repeat(t.reshape(M), S),
    ])
    tie_all = jnp.concatenate([
        e_flat * 2 + 1,                          # insert: odd, < 2M
        e_flat + np.int32(2 * M),                # expire: >= 2M
        jnp.repeat(e_flat, S) * 2,               # query:  even, < 2M
    ])
    payload = jnp.arange(pix_all.shape[0], dtype=jnp.int32)
    _, _, tie_s, pay_s = jax.lax.sort(
        (pix_all, t_all, tie_all, payload), num_keys=3)
    is_exp = (tie_s >= np.int32(2 * M)).astype(jnp.int32)
    is_ins = (tie_s & 1) * (1 - is_exp)
    pref_ins = jnp.cumsum(is_ins, dtype=jnp.int32) - is_ins
    pref_exp = jnp.cumsum(is_exp, dtype=jnp.int32) - is_exp
    # unsort via kv sort (scatter is slower on this backend); when both
    # prefixes fit 16 bits they ride one uint32 word so the unsort is a
    # single 2-operand sort
    if M < (1 << 16):
        packed = (pref_ins.astype(jnp.uint32) << 16) \
            | pref_exp.astype(jnp.uint32)
        _, packed_u = jax.lax.sort((pay_s, packed), num_keys=1)
        pq = packed_u[2 * M:]
        cnt_hi = (pq >> 16).astype(jnp.int32).reshape(M, S)   # data pos of e
        cnt_t = (pq & 0xFFFF).astype(jnp.int32).reshape(M, S)  # dt low bound
    else:
        _, ins_u, exp_u = jax.lax.sort(
            (pay_s, pref_ins, pref_exp), num_keys=1)
        cnt_hi = ins_u[2 * M:].reshape(M, S)
        cnt_t = exp_u[2 * M:].reshape(M, S)

    # queue cap: only bites when some pixel holds > queue_size events
    # in the window (hot pixels); skip the [M, S] table gather otherwise
    def with_cap(_):
        seg_end_table = jnp.cumsum(hist[:-1], dtype=jnp.int32)  # [B*HW]
        g_hi = _take(seg_end_table, jnp.clip(qpix, 0, B * HW - 1))
        return jnp.where(inb, g_hi, 0) - queue_size

    cap_lo = jax.lax.cond(
        hist[:-1].max() > queue_size, with_cap,
        lambda _: jnp.zeros_like(cnt_t), operand=None)
    lo = jnp.maximum(cap_lo, cnt_t)
    cnt = jnp.where(inb, jnp.maximum(cnt_hi - lo, 0), 0)        # [M, S]

    # per-edge spiral cell packed as (dx+R) + 64*(dy+R): emitting the
    # edge geometry here (one extra fused reduce) saves downstream
    # per-edge position gathers in the conv basis and pool-cell mapping
    R = radius
    assert 2 * R < 64, "cell code packs (dx+R) in 6 bits"
    cell_code = (offs[:, 0] + R) + 64 * (offs[:, 1] + R)
    src_flat, any_hit, code_sel = _select_first_k(
        cnt, cnt_hi, order, K, M, cell_code)
    src = src_flat - jnp.repeat(
        jnp.arange(B, dtype=jnp.int32) * N, N)[:, None]
    valid = any_hit & mask.reshape(M)[:, None]

    nbr_rest = jnp.where(valid, src, 0).reshape(B, N, K - 1)
    mask_rest = valid.reshape(B, N, K - 1)

    self_idx = jnp.tile(jnp.arange(N, dtype=jnp.int32)[None, :, None], (B, 1, 1))
    nbr = jnp.concatenate([self_idx, nbr_rest], axis=-1)
    nbr_mask = jnp.concatenate([mask[..., None], mask_rest], axis=-1)

    code = code_sel.reshape(B, N, K - 1)
    dxe = (code % 64 - R).astype(jnp.float32) / np.float32(width)
    dye = (code // 64 - R).astype(jnp.float32) / np.float32(height)
    dpos_rest = jnp.stack([dxe, dye], axis=-1)          # [B, N, K-1, 2]
    dpos = jnp.concatenate(
        [jnp.zeros((B, N, 1, 2), jnp.float32), dpos_rest], axis=2)
    return EventGraph(nbr=nbr.astype(jnp.int32), nbr_mask=nbr_mask,
                      nbr_dpos=dpos)


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "radius", "delta_t_us", "max_neighbors",
        "queue_size",
    ),
)
def search_edges_into_store(
    store_x: jnp.ndarray,     # i32 [N] store pixel x
    store_y: jnp.ndarray,     # i32 [N]
    store_t: jnp.ndarray,     # i32 [N] timestamps (us)
    store_valid: jnp.ndarray, # bool [N]
    q_x: jnp.ndarray,         # i32 [C] query (new-event) pixel x
    q_y: jnp.ndarray,
    q_t: jnp.ndarray,
    q_idx: jnp.ndarray,       # i32 [C] query's own slot / virtual id
    q_valid: jnp.ndarray,     # bool [C]
    *,
    width: int,
    height: int,
    radius: int,
    delta_t_us: int,
    max_neighbors: int,
    queue_size: int = 128,
    store_vid: Optional[jnp.ndarray] = None,  # i32 [N] virtual ids
):
    """Edge search for a chunk of new events against the full event
    store — the streaming-engine counterpart of the per-event CUDA path
    (reference: graph/ev_graph.py:62-103, ev_graph.cu:130-166,15-128).
    The store must already contain the queries (insert-then-search).

    ``store_vid`` supports the sliding-window ring store
    (reference: ev_graph.py:121-136, delete_nodes): slot order then no
    longer equals time order, so every slot carries a monotone virtual
    event id; recency and self-exclusion compare vids.  When None,
    slot order is the time order (append-only store) and vids are the
    slot indices.  ``q_idx`` must be in the same id space.

    One lex merge with keys (pixel, time, vid) yields both the
    self-position and the delta-t lower bound, so no bisect over store
    times is needed.  Returns (nbr [C, K-1] store slots, mask).
    """
    N = store_x.shape[0]
    C = q_x.shape[0]
    K = max_neighbors
    HW = height * width
    PAD = np.int32(HW)
    offs = np.array(spiral_offsets(radius), dtype=np.int32)
    S = offs.shape[0]

    if store_vid is None:
        store_vid = jnp.arange(N, dtype=jnp.int32)

    lin = jnp.where(store_valid, store_y * width + store_x, PAD)
    # slots in (pixel, vid) order == (pixel, time) order
    _, _, order = jax.lax.sort(
        (lin, store_vid, jnp.arange(N, dtype=jnp.int32)), num_keys=2)

    hist = jnp.zeros(HW + 1, jnp.int32).at[lin].add(
        store_valid.astype(jnp.int32))
    seg_end_table = jnp.cumsum(hist[:-1], dtype=jnp.int32)

    xn = q_x[:, None] + offs[None, :, 0]
    yn = q_y[:, None] + offs[None, :, 1]
    inb = (
        (xn >= 0) & (xn < width) & (yn >= 0) & (yn < height)
        & q_valid[:, None]
    )
    qpix = jnp.where(inb, yn * width + xn, PAD)                # [C, S]

    # lex merge, keys (pixel, time, vid*2 + is_data):
    #  - self bound:  query (qpix, t_e, vid_e*2) counts data strictly
    #    older (vid < vid_e; time ties resolved by vid)
    #  - dt bound:    query (qpix, t_e - dt, 0) counts data with
    #    t < t_e - dt (dt window is inclusive, ev_graph.cu:64-66)
    t_dead = np.int32(2**30)
    d_t = jnp.where(store_valid, store_t, t_dead)
    pix_all = jnp.concatenate([lin, qpix.reshape(-1), qpix.reshape(-1)])
    t_all = jnp.concatenate([
        d_t, jnp.repeat(q_t, S), jnp.repeat(q_t - delta_t_us, S)])
    vid2_all = jnp.concatenate([
        store_vid * 2 + 1,
        jnp.repeat(q_idx, S) * 2,
        jnp.zeros(C * S, jnp.int32),
    ])
    payload = jnp.arange(pix_all.shape[0], dtype=jnp.int32)
    _, _, vid2_s, pay_s = jax.lax.sort(
        (pix_all, t_all, vid2_all, payload), num_keys=3)
    is_data = (vid2_s & 1).astype(jnp.int32)
    prefix = jnp.cumsum(is_data, dtype=jnp.int32) - is_data
    _, counts = jax.lax.sort((pay_s, prefix), num_keys=1)

    cnt_hi = counts[N:N + C * S].reshape(C, S)
    cnt_t = counts[N + C * S:].reshape(C, S)

    g_hi = _take(seg_end_table, jnp.clip(qpix, 0, HW - 1))
    g_hi = jnp.where(inb, g_hi, 0)
    lo = jnp.maximum(g_hi - queue_size, cnt_t)
    cnt = jnp.where(inb, jnp.maximum(cnt_hi - lo, 0), 0)

    src, any_hit = _select_first_k(cnt, cnt_hi, order, K, N)
    valid = any_hit & q_valid[:, None]
    return jnp.where(valid, src, 0).astype(jnp.int32), valid
