"""Packed-slab FIFO search: shared geometry + selection math.

This is the round-4/5 measured-best formulation of the reference's
spiral queue search (reference: src/dagr/graph/ev_graph.cu:15-128):
per-pixel FIFO rows are packed ``pack`` x-adjacent pixels per table
row (the slice gather costs per gathered ROW — scripts/microbench9.py:
81 rows -> 18 at pack=8), candidacy/first-older/deep flags are reduced
alignment-obliviously over all sub-rows and packed into ONE
base-(Q+1) integer column for the alignment roll
(scripts/microbench13b/c/d.py: the 3-column trio roll and every
"clever" finish variant lose to this), and per-selection values ride
one-hot ``dot_general`` at ``Precision.HIGH`` (exact integer transport
below ~2^17).

Used by BOTH engines:

* ``streaming/serve.py`` — chunked multi-stream serving (v16/v
  payloads, rebased or delta vid spaces handled by the caller);
* ``graph/build.py::build_graph`` — the single-shot sync window, where
  the whole window is ONE insert-then-search chunk: raw vids fit
  uint16 (N < 2^16), the dt bound is one small merge join over the
  time-sorted events, and any pixel holding more than Q events falls
  back to the exact sort-merge builder via ``lax.cond`` (so the
  result stays bit-identical to graph/reference.py unconditionally).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SlabGeom(NamedTuple):
    """Static packed-table geometry for one (H, W, R, pack) config."""
    height: int
    width: int
    radius: int
    pack: int
    xb: int            # x-blocks per gather slice
    Wb: int            # blocks per padded row
    Wbp: int           # padded row width in pixels (= Wb * pack)
    n_dy: int          # 2R + 1
    NS: int            # spiral cells = n_dy^2
    rm_of_spiral: np.ndarray   # [NS] row-major pos of spiral cell i
    idx0_spiral: np.ndarray    # [NS] packed sub-row base per spiral cell
    cell_code: np.ndarray      # [NS] (dx+R) + 64*(dy+R) per spiral cell


def make_geom(height: int, width: int, radius: int, pack: int,
              offs: np.ndarray) -> SlabGeom:
    """``offs``: [NS, 2] (dx, dy) spiral offsets (graph/reference.py)."""
    R = radius
    n_dy = 2 * R + 1
    assert pack >= 1
    xb = 1 + -(-2 * R // pack)
    Wb = max(-(-(width + 2 * R) // pack), (width - 1) // pack + xb)
    rm = ((offs[:, 1] + R) * n_dy + (offs[:, 0] + R)).astype(np.int32)
    assert np.array_equal(np.sort(rm), np.arange(offs.shape[0]))
    idx0 = ((offs[:, 1] + R) * (xb * pack)
            + (offs[:, 0] + R)).astype(np.int32)
    code = ((offs[:, 0] + R) + 64 * (offs[:, 1] + R)).astype(np.int32)
    return SlabGeom(height, width, radius, pack, xb, Wb, Wb * pack,
                    n_dy, n_dy * n_dy, rm, idx0, code)


def fifo_payload(cols, Q: int) -> jnp.ndarray:
    """New-slot payload columns for a chunk FIFO push:
    ``out[i, q, j] = cols[j][max(i - q, 0)]`` over the pixel-sorted
    event order — slot q of row i holds the q-th-newest event of its
    pixel run (the caller masks slots beyond the run).

    The direct form is an E*Q minor-axis width-1 gather (measured ~6x
    slower than slices on this backend — CLAUDE.md); since the index
    map is a pure SHIFT, pad each column once and take Q static slices
    instead (~13.8 -> ~9.8 ms insert stage at slabv S=8 c8192,
    scripts/bench_serve.py)."""
    E = cols[0].shape[0]
    outs = []
    for v in cols:
        vp = jnp.concatenate([jnp.broadcast_to(v[:1], (Q - 1,)), v])
        outs.append(jnp.stack(
            [jax.lax.slice_in_dim(vp, Q - 1 - q, Q - 1 - q + E)
             for q in range(Q)], axis=1))
    return jnp.stack(outs, axis=-1)                   # [E, Q, len(cols)]


def fifo_shift(orow: jnp.ndarray, ecnt: jnp.ndarray, Q: int) -> jnp.ndarray:
    """Shift a gathered FIFO row down by ``ecnt`` slots (the CUDA queue
    push, reference ev_graph.cu:130-166) and return the shifted payload
    columns ``[E, Q, NP]`` (NP = payloads per slot).

    Minor-axis ``take_along_axis`` at this shape measures 503 ns/event
    on this backend vs 13 ns/event for a one-hot ``dot_general``
    (scripts/microbench5.py) — so the shift rides the MXU.  int32
    payloads are split into 16-bit halves before the f32 dot (each half
    < 2**16 is exactly representable and the one-hot contraction sums a
    single term), so the transport is exact over the FULL int32 range
    incl. sentinels; uint16 payloads ride one f32 column directly."""
    E = orow.shape[0]
    NP = orow.shape[1] // Q
    qs = jnp.arange(Q, dtype=jnp.int32)
    oshift = jnp.clip(qs[None, :] - ecnt[:, None], 0, Q - 1)
    oh = (oshift[:, :, None] == qs[None, None, :]).astype(jnp.float32)
    r = orow.reshape(E, NP, Q)
    if orow.dtype == jnp.uint16:
        # uint16 payloads are < 2^16: one f32 column per payload is
        # exact under Precision.HIGH (integer transport through the
        # bf16-split dot is exact to ~2^17 — round-4 advisor; all u16
        # values sit safely below) with no hi/lo split — half the dot
        picked = jax.lax.dot_general(
            oh, r.astype(jnp.float32),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32)              # [E, Q, NP]
        return picked.astype(jnp.uint16)
    hi = jax.lax.shift_right_arithmetic(r, 16).astype(jnp.float32)
    lo = (r & 0xFFFF).astype(jnp.float32)
    parts = jnp.concatenate([hi, lo], axis=1)                # [E, 2*NP, Q]
    # Precision >= HIGH is REQUIRED for exactness: the TPU default runs
    # f32 dots as single-pass bf16 (8 mantissa bits), which rounds any
    # 16-bit half >= 256 — the long-stream staleness certificate caught
    # exactly this (diag_serve_cover.py).
    picked = jax.lax.dot_general(
        oh, parts, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGH,
        preferred_element_type=jnp.float32)                  # [E, Q, 2*NP]
    picked = picked.astype(jnp.int32)
    return (picked[..., :NP] << 16) | picked[..., NP:]       # [E, Q, NP]


def packed_gather(geom: SlabGeom, table2d: jnp.ndarray, n_streams: int,
                  Q: int, x: jnp.ndarray, y: jnp.ndarray,
                  s: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One (1, 2R+1, xb, pack*Q) slice per event from the per-pixel
    FIFO ``table2d`` [n_streams * Hp * Wbp, Q] (padded row layout).
    Returns (rows [E, NC, Q], align [E])."""
    R, pk, xb, Wb = geom.radius, geom.pack, geom.xb, geom.Wb
    Hp = geom.height + 2 * R
    E = x.shape[0]
    ys = jnp.clip(y, 0, geom.height - 1)
    xs = jnp.clip(x, 0, geom.width - 1)
    bx = jnp.clip(xs // pk, 0, Wb - xb)
    starts = jnp.stack([s, ys, bx, jnp.zeros_like(s)], axis=1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2, 3))
    rows = jax.lax.gather(
        table2d.reshape(n_streams, Hp, Wb, pk * Q), starts, dn,
        slice_sizes=(1, geom.n_dy, xb, pk * Q),
        mode=jax.lax.GatherScatterMode.CLIP,
    ).reshape(E, geom.n_dy * xb * pk, Q)
    return rows, xs - bx * pk


def packed_select(
    geom: SlabGeom,
    rows: jnp.ndarray,        # [E, NC, Q] uint16 (sent) or int32 (-1)
    ve: jnp.ndarray,          # i32 [E] query vid (rows' vid space)
    vmin: jnp.ndarray,        # i32 [E] dt threshold vid (>= 0)
    cvE: jnp.ndarray,         # bool [E]
    align: jnp.ndarray,       # i32 [E] x % pack
    *,
    Q: int,
    K: int,
    sent: Optional[int] = None,   # uint16 sentinel value, or None (i32/-1)
    fetch: Optional[jnp.ndarray] = None,  # [E, NC, Q] f32 value transport
    counts_only: bool = False,
):
    """First-(K-1) selection in (spiral cell, FIFO recency) priority —
    the reference kernel's contract (ev_graph.cu:48-77), dt candidacy
    as the vid threshold ``vmin`` (valid when per-stream time is
    monotone in vid).

    Returns ``(any_hit [E, K-1], code_sel [E, K-1], picked_v [E, K-1]
    i32 in rows' vid space, miss [E] bool deep-in-dt flags,
    (cnt_sp, fo_sp))``; with ``counts_only`` only the last two entries
    are meaningful (bench early-exit)."""
    E, NC = rows.shape[0], rows.shape[1]
    n_dy, WW = geom.n_dy, geom.xb * geom.pack
    NS = geom.NS
    if sent is not None:
        # uint16 payload: every compare runs DIRECTLY in uint16 — the
        # big [E, NC, Q] block is never widened to int32.  The sentinel
        # is excluded from candidacy by rows < ve (ve < the sentinel by
        # the caller's range contract) and masked explicitly in the
        # fo / deep terms; vmin >= 0 subsumes the old v >= 0 term.
        veu = ve.astype(jnp.uint16)[:, None, None]
        vminu = vmin.astype(jnp.uint16)[:, None, None]
        not_sent = rows != np.uint16(sent)
        cand = (rows >= vminu) & (rows < veu)
        fo_b = (rows >= veu) & not_sent
        deep_b = (rows[..., Q - 1] >= vminu[..., 0]) \
            & not_sent[..., Q - 1]
        # NO int32 widening of the big block: a selected (any_hit)
        # entry is never the sentinel, and callers mask picked_v by
        # any_hit, so the transport can ride the raw uint16 values
        # (all < 2^16, exact at HIGH) — dropping the [E, NC, Q] i32
        # temp that used to shadow every select step
        v = rows
    else:
        v = rows
        veq = ve[:, None, None]
        cand = (v >= vmin[:, None, None]) & (v >= 0) & (v < veq)
        fo_b = v >= veq
        deep_b = v[..., Q - 1] >= vmin[:, None]
    # (cnt, fo, deep) pack into ONE base-(Q+1) integer column so the
    # alignment roll moves a third of the naive 3-column bytes; cnt,
    # fo <= Q so the packing is exact
    PB = Q + 1
    pk = (jnp.sum(cand, axis=-1).astype(jnp.int32)
          + PB * jnp.sum(fo_b, axis=-1).astype(jnp.int32)
          + PB * PB * deep_b.astype(jnp.int32))
    pk = pk.reshape(E, n_dy, WW, 1)
    # left-shift the packed-x axis by align (valid because align + dx
    # + R <= pack - 1 + 2R < WW, so used positions never wrap); binary
    # decomposition = log2(pack) conditional static rolls
    sh = 1
    while sh < geom.pack:
        bit = (align & sh) != 0
        pk = jnp.where(bit[:, None, None, None],
                       jnp.roll(pk, -sh, axis=2), pk)
        sh <<= 1
    pk_rm = pk[:, :, :n_dy, 0].reshape(E, NS)
    pk_sp = pk_rm[:, jnp.asarray(geom.rm_of_spiral, jnp.int32)]
    cnt_sp = pk_sp % PB
    fo_sp = (pk_sp // PB) % PB
    miss = (pk_sp >= PB * PB) & cvE[:, None]
    if counts_only:
        return None, None, None, miss, (cnt_sp, fo_sp)

    cum = jnp.cumsum(cnt_sp, axis=-1)
    ks = jnp.arange(K - 1, dtype=jnp.int32)
    at_sel = jnp.logical_not(cum[:, :, None] <= ks) \
        & ((cum - cnt_sp)[:, :, None] <= ks)
    any_hit = (cum[:, -1:] > ks) & cvE[:, None]
    # 4-col transport dot: every value < 2^16, so Precision.HIGH
    # (bf16x3) is exact; at_sel is one-hot over cells per k
    jcol = (jnp.asarray(geom.idx0_spiral, jnp.float32)[None, :]
            + align[:, None].astype(jnp.float32))
    cols = jnp.stack([
        fo_sp.astype(jnp.float32),
        jnp.broadcast_to(
            jnp.asarray(geom.cell_code, jnp.float32)[None, :], (E, NS)),
        (cum - cnt_sp).astype(jnp.float32),
        jcol,
    ], axis=2)                                             # [E, NS, 4]
    picked = jax.lax.dot_general(
        at_sel.astype(jnp.float32), cols,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGH,
        preferred_element_type=jnp.float32)                # [E, K-1, 4]
    fo_sel = picked[..., 0].astype(jnp.int32)
    code_sel = picked[..., 1].astype(jnp.int32)
    cum_prev = picked[..., 2].astype(jnp.int32)
    j_sel = picked[..., 3].astype(jnp.int32)
    # selected FIFO rows by iota-compare one-hot dot over NC, then the
    # depth pick (mul-sum over the Q one-hot: every restructuring —
    # take/roll/q-shards/transpose/flat-projection — measured equal or
    # worse, scripts/microbench13c/d.py)
    oh_j = (jnp.arange(NC, dtype=jnp.int32)[None, None, :]
            == j_sel[:, :, None]).astype(jnp.float32)      # [E, K-1, NC]
    if fetch is None:
        fetch = v.astype(jnp.float32)
    rowv = jax.lax.dot_general(
        oh_j, fetch,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGH,
        preferred_element_type=jnp.float32)                # [E, K-1, Q]
    depth = jnp.clip(fo_sel + ks[None, :] - cum_prev, 0, Q - 1)
    ohd = (jnp.arange(Q, dtype=jnp.int32)[None, None, :]
           == depth[..., None]).astype(jnp.float32)
    picked_v = jnp.sum(rowv * ohd, axis=-1).astype(jnp.int32)
    return any_hit, code_sel, picked_v, miss, (cnt_sp, fo_sp)
