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
from dagr_tpu.graph.slab import (
    fifo_payload, fifo_shift, make_geom, packed_gather, packed_select)

# slab fast-path FIFO depth: an event whose in-dt candidates may extend
# below this depth trips the coverage flag and the whole window falls
# back to the exact merge-join path (lax.cond), so any value is exact;
# 16 is the serving engine's measured-best depth
_SLAB_Q = 16
_SLAB_SENT = np.uint16(0xFFFF)


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
        "queue_size", "chunk", "fast_path",
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
    chunk: int = 0,        # slab-path chunk size override (0 = 8192)
    fast_path: str = "sort",   # "sort" | "slab" (chunked FIFO + fallback)
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

    R = radius
    assert 2 * R < 64, "cell code packs (dx+R) in 6 bits"
    cell_code = (offs[:, 0] + R) + 64 * (offs[:, 1] + R)
    mask_f = mask.reshape(M)
    x_f, y_f, t_f = x.reshape(M), y.reshape(M), t.reshape(M)

    def sort_core(_):
        """Exact one-shot lex merge join — the round-2/3 formulation
        (~25 ms at flagship scale, BENCH_NOTES.md sec 1).  Round 5 made
        it the FALLBACK branch of a lax.cond: the slab FIFO fast path
        below covers the common window and trips back here whenever its
        depth-Q view could differ (deep-in-dt flag / hot pixel over the
        queue cap), so the result is bit-identical either way."""
        b_ids = jnp.arange(B, dtype=jnp.int32)[:, None]
        lin = jnp.where(mask, b_ids * HW + y * width + x, PAD)   # [B, N]
        lin_f = lin.reshape(M)

        # stable sort by pixel: within a pixel, slot order == time order
        order = jnp.argsort(lin_f, stable=True).astype(jnp.int32)   # [M]

        # per-pixel event counts (cap check) + segment ENDS (queue cap)
        hist = jnp.zeros(B * HW + 1, jnp.int32).at[lin_f].add(
            mask_f.astype(jnp.int32))

        # candidate pixels: [M, S]
        xn = x_f[:, None] + offs[None, :, 0]
        yn = y_f[:, None] + offs[None, :, 1]
        inb = (
            (xn >= 0) & (xn < width) & (yn >= 0) & (yn < height)
            & mask_f[:, None]
        )
        bq = jnp.repeat(jnp.arange(B, dtype=jnp.int32), N)[:, None]
        qpix = jnp.where(inb, bq * HW + yn * width + xn, PAD)    # [M, S]

        # ---- lex merge join over (pixel, time, tie) ------------------
        # Three record types in ONE sort (keys: pixel, time, tie;
        # +payload):
        #   insert_j at (lin_j, t_j)      — a data event entering the
        #                                    queue
        #   expire_j at (lin_j, t_j + dt) — the same event leaving the
        #                                    dt window (t_j < t_e - dt
        #                                    <=> t_j + dt < t_e)
        #   query_(e,s) at (qpix, t_e)    — one per spiral cell
        # Per-pixel insert/expire totals are equal, so the cross-pixel
        # terms of the two global prefix sums cancel and, at a query,
        #   prefix_insert = global data position (pixel-major) of t_e
        #   prefix_insert - prefix_expire = #data within the dt window.
        # This halves the sorted records vs. emitting a second query
        # stream for the dt bound and kills the per-event dt bisect.
        # Tie order at equal (pixel, time): inserts with smaller slot ->
        # query e -> everything else; the dt window is inclusive
        # (reference: ev_graph.cu:64-66), so expire(t_j+dt == t_e) sorts
        # AFTER the query via tie = 2M + slot.
        e_flat = jnp.arange(M, dtype=jnp.int32)
        pix_all = jnp.concatenate([lin_f, lin_f, qpix.reshape(-1)])
        t_all = jnp.concatenate([
            t_f, t_f + delta_t_us, jnp.repeat(t_f, S),
        ])
        tie_all = jnp.concatenate([
            e_flat * 2 + 1,                      # insert: odd, < 2M
            e_flat + np.int32(2 * M),            # expire: >= 2M
            jnp.repeat(e_flat, S) * 2,           # query:  even, < 2M
        ])
        payload = jnp.arange(pix_all.shape[0], dtype=jnp.int32)
        _, _, tie_s, pay_s = jax.lax.sort(
            (pix_all, t_all, tie_all, payload), num_keys=3)
        is_exp = (tie_s >= np.int32(2 * M)).astype(jnp.int32)
        is_ins = (tie_s & 1) * (1 - is_exp)
        pref_ins = jnp.cumsum(is_ins, dtype=jnp.int32) - is_ins
        pref_exp = jnp.cumsum(is_exp, dtype=jnp.int32) - is_exp
        # unsort via kv sort (scatter is slower on this backend); when
        # both prefixes fit 16 bits they ride one uint32 word so the
        # unsort is a single 2-operand sort
        if M < (1 << 16):
            packed = (pref_ins.astype(jnp.uint32) << 16) \
                | pref_exp.astype(jnp.uint32)
            _, packed_u = jax.lax.sort((pay_s, packed), num_keys=1)
            pq = packed_u[2 * M:]
            cnt_hi = (pq >> 16).astype(jnp.int32).reshape(M, S)
            cnt_t = (pq & 0xFFFF).astype(jnp.int32).reshape(M, S)
        else:
            _, ins_u, exp_u = jax.lax.sort(
                (pay_s, pref_ins, pref_exp), num_keys=1)
            cnt_hi = ins_u[2 * M:].reshape(M, S)
            cnt_t = exp_u[2 * M:].reshape(M, S)

        # queue cap: only bites when some pixel holds > queue_size
        # events in the window (hot pixels); skip the [M, S] table
        # gather otherwise
        def with_cap(_):
            seg_end_table = jnp.cumsum(hist[:-1], dtype=jnp.int32)
            g_hi = _take(seg_end_table, jnp.clip(qpix, 0, B * HW - 1))
            return jnp.where(inb, g_hi, 0) - queue_size

        cap_lo = jax.lax.cond(
            hist[:-1].max() > queue_size, with_cap,
            lambda _: jnp.zeros_like(cnt_t), operand=None)
        lo = jnp.maximum(cap_lo, cnt_t)
        cnt = jnp.where(inb, jnp.maximum(cnt_hi - lo, 0), 0)     # [M, S]

        src_flat, any_hit, code_sel = _select_first_k(
            cnt, cnt_hi, order, K, M, cell_code)
        src = src_flat - jnp.repeat(
            jnp.arange(B, dtype=jnp.int32) * N, N)[:, None]
        return src, any_hit, code_sel

    # ---- slab FIFO fast path (fast_path="slab") -------------------------
    # The window rides the serving engine's packed-slab formulation
    # (graph/slab.py) as a lax.scan of insert-then-search chunks: the
    # per-pixel FIFO table evolves chunk by chunk (so each event's
    # depth-Q view reflects its own insertion time — a single
    # window-end table was measured to trip the deep flag on every
    # clustered window), per-sample vids fit uint16 natively, and the
    # dt bound is one small per-sample merge join over the time-sorted
    # events.  Replaces the merge join's 4.15M-record sort + unsort
    # pair (~22 ms at flagship scale).  Exactness: any event whose
    # depth-Q table view could hide an in-dt candidate trips the deep
    # flag and the whole window falls back to sort_core via lax.cond
    # (with queue_size >= Q the flag subsumes the reference queue cap:
    # a candidate at depth >= Q is either out-of-dt below a
    # below-threshold row[Q-1] or flagged), so the selection stays
    # bit-identical to graph/reference.py unconditionally.
    if fast_path == "slab" and N < 0xFFFF and queue_size >= _SLAB_Q:
        geom = make_geom(height, width, R, 8, offs)
        Q = _SLAB_Q
        Hp, Wp = height + 2 * R, geom.Wbp
        NROW = B * Hp * Wp
        CH = min(chunk if chunk > 0 else 8192, N)
        nc = -(-N // CH)
        Npad = nc * CH

        # dt lower bound as a vid threshold (events are time-sorted per
        # sample): vmin_e = #same-sample events with t < t_e - dt, via
        # one (sample, time, tie) merge join; a query at t == t_ins
        # sorts FIRST (inclusive dt window, ev_graph.cu:64-66).
        # Invalid inserts ride t=+BIG so they never precede a valid
        # query of their own sample yet keep each sample's insert count
        # at exactly N for the cross-sample offset.
        b_of_e = jnp.repeat(jnp.arange(B, dtype=jnp.int32), N)
        t_big = np.int32(2 ** 30)
        t_ins = jnp.where(mask_f, t_f, t_big)
        sb_all = jnp.concatenate([b_of_e, b_of_e])
        tt_all = jnp.concatenate([t_ins, t_f - delta_t_us])
        tie2 = jnp.concatenate([
            jnp.ones((M,), jnp.int32), jnp.zeros((M,), jnp.int32)])
        pay2 = jnp.arange(2 * M, dtype=jnp.int32)
        _, _, tie2_s, pay2_s = jax.lax.sort(
            (sb_all, tt_all, tie2, pay2), num_keys=3)
        pref2 = jnp.cumsum(tie2_s, dtype=jnp.int32) - tie2_s
        _, pref2_u = jax.lax.sort((pay2_s, pref2), num_keys=1)
        vmin = (pref2_u[M:] - b_of_e * N).reshape(B, N)          # [B, N]

        def chunked(a, fill):
            """[B, N] -> [nc, B, CH] chunk-major scan inputs."""
            if Npad > N:
                pad = jnp.full((B, Npad - N), fill, a.dtype)
                a = jnp.concatenate([a, pad], axis=1)
            return a.reshape(B, nc, CH).transpose(1, 0, 2)

        vid_bn = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[None], (B, N))
        inputs = (chunked(x, 0), chunked(y, 0), chunked(t, 0),
                  chunked(mask, False), chunked(vid_bn, 0),
                  chunked(vmin, 0))
        Ec = B * CH
        b_of_c = jnp.repeat(jnp.arange(B, dtype=jnp.int32), CH)
        qs = jnp.arange(Q, dtype=jnp.int32)

        def chunk_step(table, inp):
            xc, yc, tc, mc, vc, vmc = (a.reshape(Ec) for a in inp)
            # FIFO insert (whole chunk first: insert-then-search,
            # ev_graph.cu:130-166): one row-gather + one one-hot-dot
            # shift + one row-scatter per touched pixel
            spix = jnp.where(
                mc, b_of_c * (Hp * Wp) + (yc + R) * Wp + (xc + R),
                np.int32(NROW))
            idx_e = jnp.arange(Ec, dtype=jnp.int32)
            sp_s, _, vid_s = jax.lax.sort((spix, idx_e, vc), num_keys=2)
            first = jnp.concatenate(
                [jnp.ones((1,), bool), sp_s[1:] != sp_s[:-1]])
            is_last = jnp.concatenate(
                [sp_s[1:] != sp_s[:-1], jnp.ones((1,), bool)])
            run_start = jax.lax.associative_scan(
                jnp.maximum, jnp.where(first, idx_e, 0))
            ecnt = jnp.minimum(idx_e - run_start + 1, Q)
            take_new = qs[None, :] < ecnt[:, None]
            got = fifo_payload([vid_s.astype(jnp.uint16)], Q)[..., 0]
            orow = jnp.take_along_axis(
                table, jnp.clip(sp_s, 0, NROW - 1)[:, None], axis=0)
            old = fifo_shift(orow, ecnt, Q)[..., 0]
            new_row = jnp.where(take_new, got, old)
            target = jnp.where(is_last, sp_s, np.int32(NROW))
            table = table.at[target].set(new_row, mode="drop")

            rows, align = packed_gather(geom, table, B, Q, xc, yc, b_of_c)
            rows = jax.lax.optimization_barrier(rows)
            hit, code, picked, miss, _ = packed_select(
                geom, rows, vc, vmc, mc, align, Q=Q, K=K,
                sent=int(_SLAB_SENT))
            return table, (picked, hit, code, jnp.any(miss))

        table0 = jnp.full((NROW, Q), _SLAB_SENT)
        _, (picked_s, hit_s, code_s, miss_s) = jax.lax.scan(
            chunk_step, table0, inputs)

        def unchunk(a):
            """[nc, B*CH, K-1] -> [M, K-1] original event order."""
            a = a.reshape(nc, B, CH, K - 1).transpose(1, 0, 2, 3)
            return a.reshape(B, Npad, K - 1)[:, :N].reshape(M, K - 1)

        ok = jnp.logical_not(jnp.any(miss_s))
        src, any_hit, code_sel = jax.lax.cond(
            ok,
            lambda _: (unchunk(picked_s), unchunk(hit_s),
                       unchunk(code_s)),
            sort_core, operand=None)
    else:
        src, any_hit, code_sel = sort_core(None)
    valid = any_hit & mask_f[:, None]

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
