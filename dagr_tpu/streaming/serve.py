"""Multi-stream serving engine: S lockstep event streams per chip.

The north-star serving metric (BASELINE.md: Mevents/s/chip streaming
inference) needs many independent camera streams per chip.  Round 2
served streams by ``vmap``-ping the single-stream engine
(streaming/engine.py) and measured per-stream cost to be LINEAR in the
stream count — the batched lowering of the per-step store sort and the
8 per-stream state puts amortize nothing (the same anti-pattern as
vmap-over-batch in the sync builder).  This engine is the rebuild:

* **The store shrinks to a ring of the last NR events per stream.**
  Graph edges only ever reach ``delta_t`` back in time
  (reference: ev_graph.cu:64-66), so the search never needs the full
  50k-event window store the round-2 engine sorted every step — a ring
  covering the dt horizon (with a per-step coverage certificate, see
  below) carries identical information at a fraction of the records.
* **Streams fold into the pixel key** (``s*H*W + pix``), the exact
  trick that fixed the sync builder (graph/build.py folds batch into
  the pixel id) — ONE sort/search serves all streams.
* **Lockstep chunks, packed state.**  All streams ingest the same
  chunk size each step, so every per-node table is one
  ``[S, NR, F]`` array written with ONE ``dynamic_update_slice``
  (round 2's engine did 8+ separate per-stream puts).
* **Stream-batched dense tail.**  The pooled pyramid + head run once
  with batch = S instead of being vmapped S times.

Two search implementations are provided (``search_mode``):

* ``"sort"`` (default) — the insert/expire lex merge join of the sync
  builder (graph/build.py) applied to the ring: one
  ``S*(2*NR + C*81)``-record sort yields every (event, spiral-cell)
  count, then the builder's own fused compare-and-reduce
  ``_select_first_k`` picks the K-1 neighbors.  ``lax.sort`` is this
  backend's one reliably-linear primitive (~2.8 ns/record at any
  scale; scripts/microbench2.py).
* ``"queue"`` — per-pixel FIFO rows of (vid, t) pairs searched by wide
  row-gathers, the CUDA design (ev_graph.cu:15-128) mapped onto
  gathers.  Measured: row-gathers are fast only while the table stays
  under the backend's fast-memory knee (~10 MB); the S=8 queue table
  (79 MB) gathers at ~35 ns/index (scripts/microbench3.py), so this
  mode loses beyond a stream or two.  Kept as the measured
  alternative and as a second oracle of the search semantics.
* ``"slab"`` — the queue design re-laid-out for this backend's slice
  gather: the FIFO table is padded to ``[S, H+2R, W+2R, 2Q]`` and ONE
  ``lax.gather`` with ``slice_sizes=(1, 2R+1, 2R+1, 2Q)`` fetches an
  event's ENTIRE spiral neighborhood in a single slice — measured 209
  ns/event at full serving scale (E=65536, 83 MB table,
  scripts/microbench4.py) where the 81 per-cell row-gathers of
  ``"queue"`` mode cost ~2.8 us/event.  Selection picks then ride
  one-hot ``dot_general`` (~3 ns/pick) instead of minor-axis
  ``take_along_axis``.  Same FIFO semantics, same certificates.

Exactness: identical selection semantics to the sync builder (spiral
order x recency, dt inclusive, self excluded, queue-size cap) — the
step additionally returns a ``coverage_ok`` certificate that is True
whenever the bounded state provably lost nothing (an event evicted
from the ring while still inside some query's dt window is the only
loss mode; it requires more than NR events to arrive within delta_t).

Queue-depth sizing (queue/slab modes): insert-then-search runs at
CHUNK granularity (the CUDA kernel's per-event semantics batched), so
an event's search sees its chunk's FUTURE events already in the FIFO —
they are excluded from selection (vid < vid_e) but they still occupy
slots.  Exactness therefore needs Q >= (in-dt arrivals) + (same-chunk
later arrivals) at the hottest pixel, NOT just the in-dt count: at the
bench density (45k ev/s/stream, clustered) Q=8 with c4096 chunks
genuinely loses in-dt neighbors at hot pixels (certificate fires;
numpy-oracle-confirmed, scripts/diag_slabv_oracle.py) while Q=16 is
certified clean.  The ``deep_in_dt`` certificate catches exactly this,
so a too-shallow Q is always detected, never silent.
The serve-vs-sync consistency test pins the whole pipeline to the
sync forward at < 1e-4, the same standard as streaming/consistency.py.

Window semantics are the reference's bounded-window protocol: state is
reset per time window (reset=True per sample, reference:
asynchronous/__init__.py + ev_tgn.py:45-57); the infinite-stream ring
mode lives in streaming/engine.py.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from dagr_tpu.config import DagrConfig
from dagr_tpu.core.types import EventGraph, NodeSet, GRID_OFFSETS
from dagr_tpu.graph.build import _select_first_k, _take
from dagr_tpu.graph.reference import spiral_offsets
from dagr_tpu.graph.slab import (
    fifo_payload, fifo_shift, make_geom, packed_select)
from dagr_tpu.models.blocks import activation_fn
from dagr_tpu.models.functional import bn_eval, layer_eval, scale_head_eval
from dagr_tpu.ops.pool import pool_nodeset
from dagr_tpu.ops.spline import bilinear_basis

T_EMPTY = np.int32(-(2 ** 30))    # time sentinel: fails every dt test
TIE_EXPIRE = np.int32(2 ** 28)    # expire records sort after everything
DV_CLIP = np.int32(2 ** 20)       # vid-delta transport clip (exact in f32)


@struct.dataclass
class ServeState:
    num: jnp.ndarray        # i32 [] events ingested per stream (lockstep)
    xin: jnp.ndarray        # f32 [S, NR, 1 + 2] (feat, px_norm, py_norm) ring
    x1: jnp.ndarray         # f32 [S, NR, C1] conv_block1 activations ring
    cell_cnt: jnp.ndarray   # i32 [S, G1]
    pos_sum: jnp.ndarray    # f32 [S, G1, 3]
    tmax: jnp.ndarray       # f32 [S, G1]
    coverage_ok: jnp.ndarray  # bool [] exactness certificate
    # --- window_mode == "grow" (bounded-window protocol) --------------
    cell_max: Optional[jnp.ndarray] = None   # f32 [S, G1, C1] monotone max
    adj: Optional[jnp.ndarray] = None        # bool [S, G1, 9] monotone OR
    # --- window_mode == "ring" (infinite stream, capacity NR) ---------
    cells_ring: Optional[jnp.ndarray] = None  # i32 [S, NR] cell or G1
    posn_ring: Optional[jnp.ndarray] = None   # f32 [S, NR, 3]
    valid_ring: Optional[jnp.ndarray] = None  # bool [S, NR]
    x2r: Optional[jnp.ndarray] = None         # f32 [S, NR, C1] Layer1 out
    adj_death: Optional[jnp.ndarray] = None   # i32 [S, G1, 9] max src vid
    # --- search_mode == "sort": event ring columns --------------------
    pix_ring: Optional[jnp.ndarray] = None   # i32 [S*NR] folded pixel or DEAD
    t_ring: Optional[jnp.ndarray] = None     # i32 [S, NR]
    vid_ring: Optional[jnp.ndarray] = None   # i32 [S*NR]
    # --- search_mode == "queue": per-pixel FIFO rows ------------------
    # ("slab" reuses this field with the padded [S*Hp*Wp, 2Q] layout)
    queue: Optional[jnp.ndarray] = None      # i32 [S*HW + 2, 2Q]


class MultiStreamServer:
    """Chunked lockstep inference over ``n_streams`` independent event
    streams.  Contract: every step ingests ``[S, C, ...]`` chunks whose
    valid entries form a prefix of EQUAL length across streams (pad the
    tail chunk identically); times are window-relative microseconds."""

    def __init__(self, cfg: DagrConfig, height: int, width: int,
                 n_streams: int, chunk: int, search_mode: str = "sort",
                 queue_depth: int = 16, ring: Optional[int] = None,
                 tail_every: int = 1, queue_payload: str = "vt",
                 window_mode: str = "grow", slab_pack: int = 1,
                 pol_payload: Optional[bool] = None,
                 feat_values: Tuple[float, float] = (0.0, 1.0)):
        assert search_mode in ("sort", "queue", "slab")
        # slab_pack > 1: pack that many x-adjacent pixels per slab table
        # row.  The slab slice gather costs per gathered ROW, not per
        # byte (scripts/microbench9.py: 81 rows 10.2 ms -> 18 rows
        # 1.9 ms at pack=8), so packing shrinks the spiral fetch to
        # 9 x ceil coverage blocks.  Insert is unchanged (the packed
        # table is a pure RESHAPE view of the per-pixel [nrow, Q]
        # layout); selection maps cell (dy, dx) to packed sub-row
        # (dy+R)*(xb*pack) + (x%pack) + (dx+R) — alignment-affine, so
        # per-cell reductions run on all sub-rows and one width-3 row
        # gather lands them in spiral order (see _pick_neighbors_packed).
        assert slab_pack >= 1
        if slab_pack > 1:
            assert search_mode == "slab" and queue_payload in ("v", "v16"), (
                "slab_pack > 1 is implemented for the vid-only payloads "
                "('v16'; 'v' where the rebase range cannot cover the "
                "ring, e.g. infinite-stream ring mode)")
        # "grow": bounded-window protocol — level-1 aggregates grow
        # monotonically, state is reset per time window (reference
        # reset=True, asynchronous/__init__.py + ev_tgn.py:45-57).
        # "ring": infinite-stream sliding window — the ring capacity NR
        # is the store (reference delete_nodes, ev_graph.py:121-136):
        # overwritten slots LEAVE the level-1 aggregates.  Sums (count,
        # pos) subtract the evicted slots; t-max stays monotone (events
        # evict oldest-first, so a cell with count > 0 always has its
        # newest event live); feature-max is recomputed from the x2
        # ring on fresh tail steps (max cannot subtract); adjacency
        # keeps, per (cell, offset), the max source vid over edges —
        # an edge dies exactly when its source slot is overwritten, so
        # bit = (max_src_vid >= num - NR) is EXACT incremental
        # liveness with no per-edge re-gather (the engine.py ring
        # oracle pays an 800k-row liveness gather per step instead).
        assert window_mode in ("grow", "ring")
        self.window_mode = window_mode
        # "vt": FIFO slots carry (vid, t) pairs.  "v" (slab only): slots
        # carry vid alone — HALF the table, slice-gather and shift
        # traffic.  Exact because per-stream time is monotone in vid, so
        # the dt candidacy test  t_g >= t_e - delta_t  is EQUIVALENT to
        # vid_g >= vmin_e  with  vmin_e = #events of the stream with
        # t < t_e - delta_t — computed per chunk by one small merge
        # join against the t-ring (S*(NR+C) records vs the 81-fanout
        # search sort).  Events evicted from the t-ring are certified
        # older than every live threshold (cover[0], same condition as
        # sort mode), so the ring count reconstructs the global count.
        # "v16": the "v" design with slots narrowed to uint16 REBASED
        # vids (rel = vid - base, base advanced every P = REB*chunk
        # events by a cond-gated table pass that clamps dying entries
        # to the sentinel).  Exactness: a clamped entry has vid < base
        # <= num - NR, i.e. it left the t-ring at least a full rebase
        # period ago — and cover[0] (the eviction certificate) already
        # certifies every t-ring-evicted event to be older than all
        # live and future dt thresholds (thresholds are monotone), so
        # the clamp never removes a true candidate while the
        # certificate holds; if it ever fired, coverage_ok is already
        # False.  Round-4 motivation (scripts/microbench7.py): the slab
        # slice gather is TABLE-SIZE bound (~10 MB knee), not
        # payload-byte bound, and the candidate pass is byte-bound —
        # u16 halves both axes.
        assert queue_payload in ("vt", "v", "v16")
        assert queue_payload == "vt" or search_mode == "slab"
        self.queue_payload = queue_payload
        self.rel16 = queue_payload == "v16"
        self.REL_SENT = np.uint16(2 ** 16 - 1)
        # detection cadence: the pooled pyramid + head (the per-step
        # fixed cost) runs every Nth chunk; graph/conv/aggregate state
        # stays exact every step, skipped steps return raw=0 with
        # info["raw_fresh"]=False.  N=1 == the sync-equivalent default.
        assert tail_every >= 1
        self.tail_every = tail_every
        # slab mode: gather per-stream slabs (True) vs one 4D gather
        # over the folded table (False); a bench-measured layout choice
        self.split_gather = False
        # event-conv source gather: per-stream slabs (True) keep each
        # feature-ring table under the backend's ~10 MB gather knee
        # (scripts/microbench3.py); neighbor indices never cross
        # streams, so the split is exact
        self.split_conv_gather = False
        self.cfg = cfg
        self.height, self.width = height, width
        self.S = n_streams
        self.chunk = chunk
        self.search_mode = search_mode
        self.Q = queue_depth
        # ring: must cover all events within delta_t (certified per
        # step); multiple of chunk so slice writes never straddle the
        # wrap, and >= 2 chunks so the previous chunk stays visible.
        # window_mode "ring": NR is additionally the sliding-window
        # CAPACITY (the reference's max n_nodes store), so it defaults
        # to cfg.n_nodes rounded up to the chunk size
        if window_mode == "ring":
            nr = ring or max(cfg.n_nodes, 2 * chunk)
        else:
            nr = ring or max(8192, 2 * chunk)
        self.NR = ((nr + chunk - 1) // chunk) * chunk
        assert self.NR >= 2 * chunk
        if self.rel16:
            # v16 rebase period == the ring size (both are the chunk
            # rounding of the same horizon): clamped entries are then
            # always already ring-evicted (the clamp-exactness argument
            # needs P >= NR), and deriving P from NR keeps the two in
            # sync by construction (round-4 advisor).  Max stored rel
            # is 2P - 1, which must stay below the uint16 sentinel.
            self.P = self.NR
            assert 2 * self.P < 2 ** 16 - 1, (
                "v16 payload needs 2*rebase_period < 65535; use a "
                "smaller chunk/ring or the 'v' payload")
        if queue_payload == "v":
            # 'v' payload (packed or not): selected vid DELTAS ride a
            # one-hot dot at Precision.HIGH.  A winning candidate has
            # vid_e - vid <= NR + chunk (in-dt implies vid >= vmin >=
            # num - NR, and vid_e < num + chunk), and integer transport
            # through the bf16-split dot is only guaranteed exact to
            # ~2^17 (round-4 advisor) — so tie the config to the real
            # bound instead of trusting DV_CLIP's 2^20 headroom.
            assert self.NR + chunk < 2 ** 17, (
                "'v'-payload packed slab transports vid deltas up to "
                "NR + chunk through a Precision.HIGH one-hot dot, which "
                "is exact only below ~2^17; shrink ring/chunk or use "
                "hi/lo 16-bit split transport")
        # ---- polarity-in-payload (round 5) ---------------------------
        # conv_block1's SOURCE features are (feat, px, py); (px, py)
        # are algebraic from the edge code (the sync path's nbr_dpos
        # trick) and feat is ONE BIT (binary polarity), so packing that
        # bit below the payload vid (slot = 2*vid_or_rel + pol) removes
        # conv1's E*K-row source gather entirely: every candidacy
        # compare works with doubled thresholds (the pol bit sits below
        # the vid ordering), the packed value rides the existing
        # selection transport, and the xin ring disappears from the
        # state.  Contract: chunk_feat must be binary with the two
        # static ``feat_values`` (certified per step in coverage_ok).
        self.feat_values = (float(feat_values[0]), float(feat_values[1]))
        pol_ok = (search_mode == "slab" and slab_pack > 1
                  and queue_payload in ("v", "v16"))
        if pol_ok and queue_payload == "v16":
            # packed entries are 2*rel + pol <= 4P - 1; they must stay
            # below the uint16 sentinel (0xFFFF).  P == NR is a chunk
            # multiple, so e.g. chunk 8192 (P 16384) misses by one —
            # use chunk 8160 (P 16320) for the pol-packed family.
            pol_ok = 4 * self.P <= 2 ** 16 - 2
        if pol_ok and queue_payload == "v":
            # transported selected values are 2*dv + 1 <= 2*(NR+chunk)+1
            pol_ok = 2 * (self.NR + chunk) + 1 < 2 ** 17
        if pol_payload is None:
            pol_payload = pol_ok
        assert not (pol_payload and not pol_ok), (
            "pol_payload needs the slab search with packed rows, a "
            "vid-only payload, and vid headroom for the polarity bit "
            "(v16: 4*P <= 2^16-2; v: 2*(NR+chunk)+1 < 2^17)")
        self.pol_payload = bool(pol_payload)
        ch = cfg.channels()
        self.c1 = ch[1]
        self.grids = cfg.grid_shapes()
        self.ny1, self.nx1 = self.grids[0]
        self.mv = cfg.cartesian_max_values(width)
        self.radius = cfg.radius_px(width)
        self.delta_t = cfg.delta_t_us()
        offs = np.array(spiral_offsets(self.radius), np.int32)   # [NS, 2]
        self.offs = offs
        self.NS = offs.shape[0]
        R = self.radius
        self.cell_code = (offs[:, 0] + R) + 64 * (offs[:, 1] + R)
        # slab mode: the spiral offsets tile the full (2R+1)^2 square,
        # so each spiral cell has a unique row-major slice position and
        # the mapping is a bijection (perm for counts, inverse for the
        # one-hot value picks)
        self.rm_of_spiral = (offs[:, 1] + R) * (2 * R + 1) + (offs[:, 0] + R)
        assert np.array_equal(np.sort(self.rm_of_spiral), np.arange(self.NS))
        self.spiral_of_rm = np.argsort(self.rm_of_spiral)
        # packed-slab geometry: xb x-blocks of `pack` pixels cover the
        # (2R+1)-wide x-window at any alignment; Wb blocks span the
        # padded width AND leave room for the rightmost window start
        self.pack = slab_pack
        if slab_pack > 1:
            # shared packed-slab geometry + selection math (also the
            # sync builder's fast path — graph/slab.py)
            self.geom = make_geom(height, width, R, slab_pack, offs)
            self.xb = self.geom.xb
            self.Wb = self.geom.Wb
            self.Wbp = self.geom.Wbp
            self.idx0_spiral = self.geom.idx0_spiral
        else:
            self.Wbp = width + 2 * R
        # benchmarking aid: early-exit the step after a named stage
        # ("search" | "select" | "conv" | "agg" | "full"); a python
        # attr, so each setting is its own trace
        self.bench_stage = "full"

    # ------------------------------------------------------------------
    def init_state(self) -> ServeState:
        S, Q, NR, G1 = self.S, self.Q, self.NR, self.ny1 * self.nx1
        HW = self.height * self.width
        if self.search_mode == "queue":
            queue = jnp.concatenate([
                jnp.full((S * HW + 2, Q), -1, jnp.int32),
                jnp.full((S * HW + 2, Q), T_EMPTY, jnp.int32),
            ], axis=1)
            rings = dict(pix_ring=None, t_ring=None, vid_ring=None,
                         queue=queue)
        elif self.search_mode == "slab":
            # padded per-stream FIFO table; border rows stay sentinel
            # forever, so out-of-frame spiral cells auto-fail candidacy
            # (Wbp == padded width, rounded up to the pack grid)
            R = self.radius
            nrow = S * (self.height + 2 * R) * self.Wbp
            if self.queue_payload == "v16":
                # rebased uint16 vids; the dt test rides the t-ring
                queue = jnp.full((nrow, Q), self.REL_SENT, jnp.uint16)
                t_ring = jnp.full((S, NR), T_EMPTY, jnp.int32)
            elif self.queue_payload == "v":
                # vid-only slots; the dt test rides the t-ring instead
                queue = jnp.full((nrow, Q), -1, jnp.int32)
                t_ring = jnp.full((S, NR), T_EMPTY, jnp.int32)
            else:
                queue = jnp.concatenate([
                    jnp.full((nrow, Q), -1, jnp.int32),
                    jnp.full((nrow, Q), T_EMPTY, jnp.int32),
                ], axis=1)
                t_ring = None
            rings = dict(pix_ring=None, t_ring=t_ring, vid_ring=None,
                         queue=queue)
        else:
            rings = dict(
                pix_ring=jnp.full((S * NR,), np.int32(S * HW), jnp.int32),
                t_ring=jnp.full((S, NR), T_EMPTY, jnp.int32),
                vid_ring=jnp.full((S * NR,), -1, jnp.int32),
                queue=None,
            )
        if self.window_mode == "ring":
            win = dict(
                cells_ring=jnp.full((S, NR), G1, jnp.int32),
                posn_ring=jnp.zeros((S, NR, 3), jnp.float32),
                valid_ring=jnp.zeros((S, NR), bool),
                x2r=jnp.zeros((S, NR, self.c1), jnp.float32),
                # any value < num - NR reads as dead forever
                adj_death=jnp.full((S, G1, 9), T_EMPTY, jnp.int32),
            )
        else:
            win = dict(
                cell_max=jnp.full((S, G1, self.c1),
                                  jnp.finfo(jnp.float32).min),
                adj=jnp.zeros((S, G1, 9), bool),
            )
        return ServeState(
            num=jnp.zeros((), jnp.int32),
            # pol_payload reconstructs conv1 sources algebraically —
            # the xin ring is never read, so carry a 0-dim dummy (a
            # scalar stays replicated under serve_state_spec)
            xin=(jnp.zeros((), jnp.float32) if self.pol_payload
                 else jnp.zeros((S, NR, 3), jnp.float32)),
            x1=jnp.zeros((S, NR, self.c1), jnp.float32),
            cell_cnt=jnp.zeros((S, G1), jnp.int32),
            pos_sum=jnp.zeros((S, G1, 3), jnp.float32),
            tmax=jnp.full((S, G1), -jnp.inf, jnp.float32),
            coverage_ok=jnp.ones((), bool),
            **win,
            **rings,
        )

    # ------------------------------------------------------------------
    # search_mode == "sort": ring + insert/expire lex merge join
    # ------------------------------------------------------------------
    def _search_sort(self, state: ServeState, x, y, t, cv, vid_f,
                     pol=None):
        """Returns (state', src_tab [E, K-1] flat ring slots for feature
        gathers, any_hit, code_sel, src_vid, pol_sel, cover, chk)."""
        cfg = self.cfg
        S, C, NR = self.S, self.chunk, self.NR
        W, H = self.width, self.height
        HW = W * H
        E = S * C
        K = cfg.max_neighbors
        DEAD = np.int32(S * HW)
        n0 = state.num
        r0 = n0 % NR
        t_f = t.reshape(E)
        s_off = (jnp.arange(self.S, dtype=jnp.int32) * HW)[:, None]

        # coverage: events about to be evicted must be older than every
        # query's dt window (per stream)
        t_old = jax.lax.dynamic_slice(state.t_ring, (0, r0), (S, C))
        min_t = jnp.min(jnp.where(cv, t, np.int32(2 ** 30)), axis=1)
        # cover is a [2]-vector of named certificate parts (see step)
        cover = jnp.stack([
            ~jnp.any(t_old >= (min_t - self.delta_t)[:, None]),
            jnp.ones((), bool)])

        # append the chunk to the ring columns
        pix_c = jnp.where(cv, s_off + y * W + x, DEAD)           # [S, C]
        pix_ring = jax.lax.dynamic_update_slice(
            state.pix_ring.reshape(S, NR), pix_c, (0, r0)).reshape(-1)
        t_ring = jax.lax.dynamic_update_slice(state.t_ring, t, (0, r0))
        vid_ring = jax.lax.dynamic_update_slice(
            state.vid_ring.reshape(S, NR),
            jnp.broadcast_to(vid_f.reshape(S, C), (S, C)), (0, r0)
        ).reshape(-1)
        state = state.replace(pix_ring=pix_ring, t_ring=t_ring,
                              vid_ring=vid_ring)

        npts = S * NR
        # ring slots in (pixel, vid) order == (pixel, time) order
        _, _, order = jax.lax.sort(
            (pix_ring, vid_ring, jnp.arange(npts, dtype=jnp.int32)),
            num_keys=2)

        # queue-size cap predicate from the sorted pixels (cheap): max
        # per-pixel run length; the cap gather runs only when it bites
        pix_s = _take(pix_ring, order)
        idx_n = jnp.arange(npts, dtype=jnp.int32)
        first = jnp.concatenate(
            [jnp.ones((1,), bool), pix_s[1:] != pix_s[:-1]])
        run_start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(first, idx_n, 0))
        is_pad = pix_s >= DEAD
        max_run = jnp.max(jnp.where(is_pad, 0, idx_n - run_start + 1))

        # spiral query pixels
        offs = self.offs
        xn = x[..., None] + offs[None, None, :, 0]               # [S, C, NS]
        yn = y[..., None] + offs[None, None, :, 1]
        inb = ((xn >= 0) & (xn < W) & (yn >= 0) & (yn < H)
               & cv[..., None])
        qpix = jnp.where(inb, s_off[..., None] + yn * W + xn, DEAD)
        qpix_f = qpix.reshape(E * self.NS)

        # insert/expire/query lex merge join (graph/build.py:146-194):
        # prefix_ins at a query = global data position of (pix, t_e,
        # vid_e); prefix_ins - prefix_exp = #data within the dt window.
        # Tie at equal (pixel, time): insert j < query e iff vid_j <
        # vid_e; expires last (dt inclusive, ev_graph.cu:64-66).
        t_rf = state.t_ring.reshape(-1)
        pix_all = jnp.concatenate([pix_ring, pix_ring, qpix_f])
        t_all = jnp.concatenate([
            t_rf, t_rf + self.delta_t, jnp.repeat(t_f, self.NS)])
        tie_all = jnp.concatenate([
            vid_ring * 2 + 1,
            TIE_EXPIRE + jnp.arange(npts, dtype=jnp.int32),
            jnp.repeat(vid_f * 2, self.NS),
        ])
        payload = jnp.arange(pix_all.shape[0], dtype=jnp.int32)
        _, _, tie_s, pay_s = jax.lax.sort(
            (pix_all, t_all, tie_all, payload), num_keys=3)
        is_exp = (tie_s >= TIE_EXPIRE).astype(jnp.int32)
        is_ins = (tie_s & 1) * (1 - is_exp)
        pref_ins = jnp.cumsum(is_ins, dtype=jnp.int32) - is_ins
        pref_exp = jnp.cumsum(is_exp, dtype=jnp.int32) - is_exp
        _, ins_u, exp_u = jax.lax.sort(
            (pay_s, pref_ins, pref_exp), num_keys=1)
        cnt_hi = ins_u[2 * npts:].reshape(E, self.NS)
        cnt_t = exp_u[2 * npts:].reshape(E, self.NS)

        # queue-size cap (reference ev_tgn.py:24: depth 128); the seg-end
        # gather is paid only when some pixel actually overflows
        def with_cap(_):
            hist = jnp.zeros(S * HW + 1, jnp.int32).at[
                jnp.minimum(pix_ring, DEAD)].add(
                (pix_ring < DEAD).astype(jnp.int32))
            seg_end = jnp.cumsum(hist[:-1], dtype=jnp.int32)
            g_hi = _take(seg_end, jnp.clip(qpix_f, 0, S * HW - 1))
            return jnp.where(inb.reshape(E, self.NS),
                             g_hi.reshape(E, self.NS), 0) \
                - cfg.max_queue_size

        cap_lo = jax.lax.cond(
            max_run > cfg.max_queue_size, with_cap,
            lambda _: jnp.zeros_like(cnt_t), operand=None)
        lo = jnp.maximum(cap_lo, cnt_t)
        cnt = jnp.where(inb.reshape(E, self.NS),
                        jnp.maximum(cnt_hi - lo, 0), 0)

        if self.bench_stage == "search":
            return (state, None, None, None, None, None, cover,
                    (cnt, cnt_hi))

        src_tab, any_hit, code_sel = _select_first_k(
            cnt, cnt_hi, order, K, npts, self.cell_code)
        any_hit = any_hit & cv.reshape(E)[:, None]
        src_vid = _take(vid_ring, jnp.clip(src_tab, 0, npts - 1))
        return (state, src_tab, any_hit, code_sel, src_vid, None,
                cover, None)

    # ------------------------------------------------------------------
    @staticmethod
    def _chunk_fifo_payload(cols, Q):
        """Shared with the sync slab builder — see
        ``graph.slab.fifo_payload``."""
        return fifo_payload(cols, Q)

    @staticmethod
    def _fifo_shift(orow, ecnt, Q):
        """Shared with the sync slab builder — see
        ``graph.slab.fifo_shift``."""
        return fifo_shift(orow, ecnt, Q)

    # ------------------------------------------------------------------
    # search_mode == "queue": per-pixel FIFO rows + wide row-gathers
    # ------------------------------------------------------------------
    def _search_queue(self, state: ServeState, x, y, t, cv, vid_f,
                      pol=None):
        cfg = self.cfg
        S, C, Q, NR = self.S, self.chunk, self.Q, self.NR
        W, H = self.width, self.height
        HW = W * H
        E = S * C
        K = cfg.max_neighbors
        DEAD_Q = np.int32(S * HW)
        DEAD_W = np.int32(S * HW + 1)
        t_f = t.reshape(E)
        s_off = (jnp.arange(S, dtype=jnp.int32) * HW)[:, None]

        # insert the whole chunk (insert-then-search, ev_graph.cu:130-166)
        spix = jnp.where(cv, s_off + y * W + x, DEAD_W).reshape(E)
        idx_e = jnp.arange(E, dtype=jnp.int32)
        sp_s, _, vid_s, t_s = jax.lax.sort(
            (spix, idx_e, vid_f, t_f), num_keys=2)
        first = jnp.concatenate(
            [jnp.ones((1,), bool), sp_s[1:] != sp_s[:-1]])
        is_last = jnp.concatenate(
            [sp_s[1:] != sp_s[:-1], jnp.ones((1,), bool)])
        run_start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(first, idx_e, 0))
        ecnt = jnp.minimum(idx_e - run_start + 1, Q)
        qs = jnp.arange(Q, dtype=jnp.int32)
        take_new = qs[None, :] < ecnt[:, None]
        got = self._chunk_fifo_payload([vid_s, t_s], Q)      # [E, Q, 2]
        orow = jnp.take_along_axis(state.queue, sp_s[:, None], axis=0)
        old = self._fifo_shift(orow, ecnt, Q)
        new_row = jnp.concatenate([
            jnp.where(take_new, got[..., 0], old[..., 0]),
            jnp.where(take_new, got[..., 1], old[..., 1]),
        ], axis=1)
        target = jnp.where(is_last, sp_s, DEAD_W)
        queue = state.queue.at[target].set(new_row)
        state = state.replace(queue=queue)

        # spiral search by row-gather
        offs = self.offs
        xn = x[..., None] + offs[None, None, :, 0]
        yn = y[..., None] + offs[None, None, :, 1]
        inb = ((xn >= 0) & (xn < W) & (yn >= 0) & (yn < H)
               & cv[..., None])
        qpix = jnp.where(inb, s_off[..., None] + yn * W + xn, DEAD_Q)
        rows = jnp.take_along_axis(
            queue, qpix.reshape(-1)[:, None], axis=0
        ).reshape(E, self.NS, 2 * Q)
        return self._finish_queue_search(state, rows, t_f, vid_f, cv,
                                         row_major=False)

    def _finish_queue_search(self, state, rows, t_f, vid_f, cv, row_major,
                             vmin=None, evict_ok=None, base=None,
                             align=None):
        """Shared tail of the FIFO-row searches: selection + the
        staleness certificate + the vid -> feature-ring-slot map."""
        S, C, Q, NR = self.S, self.chunk, self.Q, self.NR
        E = S * C
        K = self.cfg.max_neighbors
        if align is not None:
            any_hit, code_sel, src_vid, pol_sel, cover_d, chk = \
                self._pick_neighbors_packed(
                    rows, vid_f, cv, vmin=vmin, base=base, align=align)
        else:
            vid_g = rows[..., :Q]
            t_g = rows[..., Q:] if rows.shape[-1] == 2 * Q else None
            any_hit, code_sel, src_vid, cover_d, chk = self._pick_neighbors(
                vid_g, t_g, t_f, vid_f, cv, row_major=row_major, vmin=vmin,
                base=base)
            pol_sel = None
        if evict_ok is not None:
            cover_d = cover_d & evict_ok          # t-ring eviction cert
        if self.bench_stage == "search":
            return state, None, None, None, None, None, jnp.stack(
                [cover_d, jnp.ones((), bool)]), chk
        # feature-ring staleness certificate
        cover = jnp.stack([
            cover_d,
            ~jnp.any(any_hit & (vid_f[:, None] - src_vid >= NR))])
        # ring feature index from the vid
        s_base = (jnp.arange(S, dtype=jnp.int32) * NR)[:, None, None]
        src_tab = (s_base + (src_vid % NR).reshape(S, C, K - 1)
                   ).reshape(E, K - 1)
        return (state, src_tab, any_hit, code_sel, src_vid, pol_sel,
                cover, None)

    def _pick_neighbors(self, vid_g, t_g, t_f, vid_f, cv, row_major,
                        vmin=None, base=None):
        """First-(K-1) selection in (spiral cell, recency) priority from
        per-cell FIFO rows — the builder's compare-and-reduce over
        per-cell candidate counts, with value transport by one-hot
        ``dot_general`` (~3 ns/pick measured, scripts/microbench4.py)
        instead of minor-axis ``take_along_axis`` picks.

        ``vid_g``/``t_g`` are [E, NS, Q] rows in spiral-cell order when
        ``row_major`` is False, else in row-major slice order (the slab
        gather's layout).  With ``vmin`` (vid-only payload) the dt test
        is the equivalent vid threshold and ``t_g`` is unused (None).
        Returns ``(any_hit, code_sel, src_vid, cover, bench_chk)``.
        """
        Q = self.Q
        K = self.cfg.max_neighbors
        E = vid_g.shape[0]
        cvE = cv.reshape(E)
        if base is not None:
            # uint16 rebased payload: map everything into rel space
            # (rel = vid - base < 2P < 2^16) so the comparisons, the dv
            # transport, and the clip below all run UNCHANGED — the
            # sentinel becomes -1, matching the wide payloads.  The
            # where/convert is elementwise and fuses into the consumers.
            vid_g = jnp.where(vid_g == self.REL_SENT, jnp.int32(-1),
                              vid_g.astype(jnp.int32))
            vid_f = vid_f - base
            vmin = vmin - base
        vid_e = vid_f[:, None, None]
        if vmin is None:
            t_e = t_f[:, None, None]
            in_dt = t_g >= t_e - self.delta_t
            deep_in_dt = t_g[..., Q - 1] >= (t_f[:, None] - self.delta_t)
        else:
            # per-stream t monotone in vid: t >= t_e - delta_t == vid
            # >= vmin_e; sentinel slots (vid -1) fail via vid_g >= 0
            in_dt = vid_g >= vmin[:, None, None]
            deep_in_dt = vid_g[..., Q - 1] >= vmin[:, None]
        cand = in_dt & (vid_g >= 0) & (vid_g < vid_e)
        first_older = jnp.sum(vid_g >= vid_e, axis=-1)
        cnt = jnp.sum(cand, axis=-1).astype(jnp.int32)
        # coverage: if the DEEPEST kept entry is still inside the dt
        # window, deeper (dropped) entries might have been too;
        # sentinel rows (out-of-frame cells / empty pixels) can never
        # fire this, so no in-bounds mask is needed
        miss = deep_in_dt & cvE[:, None]
        cover = ~jnp.any(miss)
        if row_major:
            sp = jnp.asarray(self.rm_of_spiral, jnp.int32)
            cnt_sp = cnt[:, sp]
            fo_sp = first_older[:, sp]
        else:
            cnt_sp, fo_sp = cnt, first_older
        if self.bench_stage == "search":
            return None, None, None, cover, (cnt_sp, fo_sp)

        cum = jnp.cumsum(cnt_sp, axis=-1)
        ks = jnp.arange(K - 1, dtype=jnp.int32)
        le = cum[:, :, None] <= ks[None, None, :]
        at_sel = jnp.logical_not(le) & ((cum - cnt_sp)[:, :, None] <= ks)
        any_hit = (cum[:, -1:] > ks) & cvE[:, None]
        # ALL per-selection values ride ONE one-hot dot_general: the
        # dv rows plus (first_older, cell_code, cum_prev) — cum_prev
        # (== sum of cnt over cells with cum <= k) is exactly
        # (cum - cnt) AT the selected crossing cell, so it transports
        # like any other per-cell value.  Exact: at_sel is one-hot over
        # cells so each output sums a single term; Precision.HIGH
        # because the TPU default single-pass bf16 dot rounds values
        # above 2^8.  HIGH integer transport is exact to ~2^17 (round-4
        # advisor): winning dv values are <= NR + chunk, which __init__
        # asserts < 2^17 for the 'v' payload; DV_CLIP only bounds
        # never-selected stale entries.
        sel = at_sel
        code_cells = self.cell_code
        if row_major:
            sel = at_sel[:, jnp.asarray(self.spiral_of_rm, jnp.int32), :]
            code_cells = self.cell_code[self.spiral_of_rm]
        # per-cell value columns in ROW order of vid_g (native layout)
        cumcnt = cum - cnt_sp
        if row_major:
            # (cum - cnt) back to row-major so it concatenates with dv
            inv = jnp.asarray(self.spiral_of_rm, jnp.int32)
            cumcnt = cumcnt[:, inv]
            fo_cols = first_older
        else:
            fo_cols = fo_sp
        dv = jnp.clip(vid_f[:, None, None] - vid_g, -DV_CLIP, DV_CLIP
                      ).astype(jnp.float32)
        NSc = dv.shape[1]
        cols = jnp.concatenate([
            dv,
            fo_cols[..., None].astype(jnp.float32),
            jnp.broadcast_to(
                jnp.asarray(code_cells, jnp.float32)[None, :, None],
                (E, NSc, 1)),
            cumcnt[..., None].astype(jnp.float32),
        ], axis=2)                                            # [E, NS, Q+3]
        picked = jax.lax.dot_general(
            sel.astype(jnp.float32), cols,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32)             # [E, K-1, Q+3]
        rowdv = picked[..., :Q]
        fo_sel = picked[..., Q].astype(jnp.int32)
        code_sel = picked[..., Q + 1].astype(jnp.int32)
        cum_prev = picked[..., Q + 2].astype(jnp.int32)
        w = ks[None, :] - cum_prev
        depth = jnp.clip(fo_sel + w, 0, Q - 1)
        oh = jnp.arange(Q, dtype=jnp.int32)[None, None, :] \
            == depth[..., None]
        dv_pick = jnp.sum(jnp.where(oh, rowdv, 0.0), axis=-1)
        src_vid = vid_f[:, None] - dv_pick.astype(jnp.int32)
        if base is not None:
            src_vid = src_vid + base        # rel space -> global vids
        src_vid = jnp.where(any_hit, src_vid, 0)
        return any_hit, code_sel, src_vid, cover, None

    def _pick_neighbors_packed(self, rows, vid_f, cv, vmin, base, align):
        """First-(K-1) selection from a PACKED slab fetch — thin
        payload-space adapter over ``graph.slab.packed_select`` (the
        shared measured-best formulation; see its docstring and
        scripts/microbench10/13b/13c/13d.py for the primitive-choice
        evidence).  ``rows`` is ``[E, NC, Q]`` uint16 rel-vids (v16
        payload, ``base`` set) or int32 vids ('v' payload); event
        ``e``'s spiral cell ``i`` lives at sub-row ``idx0_spiral[i] +
        align[e]`` (alignment-affine, see graph/slab.py).

        Same selection contract as the builder (ev_graph.cu:48-77):
        spiral cell order x FIFO recency, dt via the vid threshold
        ``vmin``."""
        Q = self.Q
        K = self.cfg.max_neighbors
        E = rows.shape[0]
        cvE = cv.reshape(E)
        pp = self.pol_payload
        # one materialization of the gathered slab: without the barrier
        # XLA may duplicate the gather into each consumer fusion
        rows = jax.lax.optimization_barrier(rows)
        if base is None:
            # 'v' payload: i32 vids, sentinel already -1, global space.
            # The transport dot carries clipped vid DELTAS (raw i32
            # vids grow without bound on long streams while HIGH
            # integer transport is only exact to ~2^17; winning deltas
            # are <= NR + chunk, asserted < 2^17 in __init__).
            # pol_payload: slots hold 2*vid + pol — every compare keeps
            # its meaning with DOUBLED thresholds (the pol bit sits
            # below the vid ordering: 2v+p < 2ve <=> v < ve), and the
            # transported delta becomes (2*ve + 1) - (2*v + p)
            # = 2*dv + (1 - p), decoded by one shift
            ve, vm = vid_f, vmin
            if pp:
                ve, vm = 2 * ve, 2 * vm
                fetch = jnp.clip((ve + 1)[:, None, None] - rows,
                                 -DV_CLIP, DV_CLIP).astype(jnp.float32)
            else:
                fetch = jnp.clip(ve[:, None, None] - rows,
                                 -DV_CLIP, DV_CLIP).astype(jnp.float32)
            sent = None
        else:
            # rel space: payload entries are < 2P (pol: < 4P) < 2^16;
            # uint16 compares + raw value transport (exact at HIGH)
            ve, vm = vid_f - base, vmin - base
            if pp:
                ve, vm = 2 * ve, 2 * vm
            fetch = None
            sent = int(self.REL_SENT)
        if self.bench_stage == "search":
            _, _, _, miss, chk = packed_select(
                self.geom, rows, ve, vm, cvE, align, Q=Q, K=K,
                sent=sent, counts_only=True)
            return None, None, None, None, ~jnp.any(miss), chk
        any_hit, code_sel, picked_v, miss, _ = packed_select(
            self.geom, rows, ve, vm, cvE, align, Q=Q, K=K, sent=sent,
            fetch=fetch)
        cover = ~jnp.any(miss)
        pol_sel = None
        if base is None:
            if pp:
                # picked_v = 2*dv + (1 - pol); selected entries have
                # dv >= 1, so the decode shift never sees a negative
                pol_sel = 1 - (picked_v & 1)
                picked_v = picked_v >> 1
            src_vid = vid_f[:, None] - picked_v
        else:
            if pp:
                pol_sel = picked_v & 1
                picked_v = picked_v >> 1
            src_vid = picked_v + base
        src_vid = jnp.where(any_hit, src_vid, 0)
        return any_hit, code_sel, src_vid, pol_sel, cover, None

    # ------------------------------------------------------------------
    # search_mode == "slab": padded FIFO table + one slice gather/event
    # ------------------------------------------------------------------
    def _search_slab(self, state: ServeState, x, y, t, cv, vid_f,
                     pol=None):
        """FIFO search re-laid-out for the backend's slice gather: the
        queue table is padded to ``[S, H+2R, W+2R, 2Q]`` and ONE
        ``lax.gather`` slice per event fetches its entire spiral
        neighborhood (209 ns/event measured at full serving scale,
        scripts/microbench4.py) — same CUDA FIFO semantics
        (ev_graph.cu:15-128) as ``queue`` mode, same certificates."""
        S, C, Q, NR = self.S, self.chunk, self.Q, self.NR
        W, H = self.width, self.height
        R = self.radius
        Hp, Wp = H + 2 * R, self.Wbp
        E = S * C
        NROW = S * Hp * Wp
        t_f = t.reshape(E)
        s_hp = (jnp.arange(S, dtype=jnp.int32) * (Hp * Wp))[:, None]

        base = None
        if self.rel16:
            # uint16 rebased vids: base advances by P every P events; a
            # cond-gated table pass (taken once per P/C steps) subtracts
            # P and clamps entries falling below the new base to the
            # sentinel (certified dead: they left the t-ring >= one full
            # rebase period ago — see __init__'s payload note)
            P = np.int32(self.P)
            base = jnp.maximum(state.num // P - 1, 0) * P
            # pol_payload packs the polarity bit below the rel vid
            # (slot = 2*rel + pol), so the rebase threshold/step double
            # — the pol bit rides along unchanged
            Pu = np.uint16(2 * self.P if self.pol_payload else self.P)
            queue_r = jax.lax.cond(
                (state.num % P == 0) & (state.num >= 2 * P),
                lambda q: jnp.where((q == self.REL_SENT) | (q < Pu),
                                    self.REL_SENT, q - Pu),
                lambda q: q, state.queue)
            state = state.replace(queue=queue_r)

        # FIFO insert (whole chunk first: insert-then-search,
        # ev_graph.cu:130-166); one row-gather + one row-scatter per
        # touched pixel, invalid/non-last rows dropped via OOB targets
        spix = jnp.where(
            cv, s_hp + (y + R) * Wp + (x + R), NROW).reshape(E)
        idx_e = jnp.arange(E, dtype=jnp.int32)
        pol_f = (pol.reshape(E).astype(jnp.int32)
                 if self.pol_payload else jnp.zeros((E,), jnp.int32))
        sp_s, _, vid_s, t_s, pol_s = jax.lax.sort(
            (spix, idx_e, vid_f, t_f, pol_f), num_keys=2)
        first = jnp.concatenate(
            [jnp.ones((1,), bool), sp_s[1:] != sp_s[:-1]])
        is_last = jnp.concatenate(
            [sp_s[1:] != sp_s[:-1], jnp.ones((1,), bool)])
        run_start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(first, idx_e, 0))
        ecnt = jnp.minimum(idx_e - run_start + 1, Q)
        qs = jnp.arange(Q, dtype=jnp.int32)
        take_new = qs[None, :] < ecnt[:, None]
        vid_only = self.queue_payload != "vt"
        if self.rel16:
            rel_s = vid_s - base
            if self.pol_payload:
                rel_s = rel_s * 2 + pol_s         # < 4P <= 2^16 - 2
            got = self._chunk_fifo_payload(
                [rel_s.astype(jnp.uint16)], Q)            # [E, Q, 1]
        elif self.pol_payload:
            got = self._chunk_fifo_payload([vid_s * 2 + pol_s], Q)
        else:
            got = self._chunk_fifo_payload(
                [vid_s] if vid_only else [vid_s, t_s], Q)  # [E, Q, NP]
        NP = got.shape[2]
        orow = jnp.take_along_axis(
            state.queue, jnp.clip(sp_s, 0, NROW - 1)[:, None], axis=0)
        old = self._fifo_shift(orow, ecnt, Q)
        new_row = jnp.concatenate(
            [jnp.where(take_new, got[..., j], old[..., j])
             for j in range(NP)], axis=1)
        target = jnp.where(is_last, sp_s, NROW)
        queue = state.queue.at[target].set(new_row, mode="drop")
        state = state.replace(queue=queue)

        vmin = None
        if vid_only:
            # dt candidacy as a vid threshold: vmin_e = #events of the
            # stream with t < t_e - delta_t.  The t-ring holds the last
            # NR times; evicted events are certified older than every
            # live threshold (cover below), so the reconstruction
            # (n_total - NR) + #ring slots with t < thr  is exact —
            # unfilled sentinel slots (T_EMPTY) count as old and cancel
            # the negative base when n_total < NR.
            n0 = state.num
            r0 = n0 % NR
            thr = t_f - self.delta_t                             # [E]
            # eviction certificate BEFORE overwriting the ring slots
            # (a slot that carries a forward-filled padding time is a
            # copy of a real event's time, so a fire on it is merely
            # conservative — it implies the same fire condition as its
            # real neighbor under ring pressure)
            t_old = jax.lax.dynamic_slice(state.t_ring, (0, r0), (S, C))
            min_t = jnp.min(jnp.where(cv, t, np.int32(2 ** 30)), axis=1)
            cover_evict = ~jnp.any(
                t_old >= (min_t - self.delta_t)[:, None])
            # INVALID (padding) entries forward-fill the last real time
            # (per-stream cummax, seeded from the previous ring slot):
            # the ring then stays NON-DECREASING in vid order, which is
            # exactly what makes {t < thr} a vid prefix — a constant
            # pad sentinel (old or fresh) breaks prefix-ness whenever
            # the dt boundary lands across a padded gap (tested:
            # test_slabv_padded_and_empty_chunks_match_vt)
            seed = jax.lax.dynamic_slice(
                state.t_ring, (0, (r0 - 1) % NR), (S, 1))
            tfill = jnp.concatenate(
                [seed, jnp.where(cv, t, T_EMPTY)], axis=1)
            tfill = jax.lax.associative_scan(
                jnp.maximum, tfill, axis=1)[:, 1:]
            t_ring = jax.lax.dynamic_update_slice(
                state.t_ring, tfill, (0, r0))
            state = state.replace(t_ring=t_ring)
            # merge join: per-stream ring times (inserts) vs per-event
            # thresholds (queries); a query at t == t_ins sorts FIRST
            # so equal-time events stay candidates (dt inclusive,
            # ev_graph.cu:64-66)
            npts = S * NR
            s_ins = jnp.repeat(jnp.arange(S, dtype=jnp.int32), NR)
            s_q = jnp.repeat(jnp.arange(S, dtype=jnp.int32), C)
            s_all = jnp.concatenate([s_ins, s_q])
            t_all = jnp.concatenate([t_ring.reshape(-1), thr])
            tie_all = jnp.concatenate([
                jnp.ones((npts,), jnp.int32), jnp.zeros((E,), jnp.int32)])
            payload = jnp.arange(npts + E, dtype=jnp.int32)
            _, _, tie_s2, pay_s2 = jax.lax.sort(
                (s_all, t_all, tie_all, payload), num_keys=3)
            is_ins2 = tie_s2
            pref2 = jnp.cumsum(is_ins2, dtype=jnp.int32) - is_ins2
            _, pref_u = jax.lax.sort((pay_s2, pref2), num_keys=1)
            j_sort = pref_u[npts:] - jnp.repeat(
                jnp.arange(S, dtype=jnp.int32) * NR, C)
            vmin = (n0 + C - NR) + j_sort                        # [E]
        else:
            cover_evict = jnp.ones((), bool)

        if self.bench_stage == "insert":
            # queue lives in the returned (donated) state, so the
            # scatter above survives DCE without extra anchors
            return (state, None, None, None, None, None,
                    jnp.stack([cover_evict, jnp.ones((), bool)]), ())

        # one (2R+1, 2R+1, 2Q) slice per event; pad rows make every
        # out-of-frame cell a sentinel, and the slice always fits the
        # padded extent, so no per-cell bounds logic survives here
        ys = jnp.clip(y, 0, H - 1).reshape(E)
        xs = jnp.clip(x, 0, W - 1).reshape(E)
        QW = NP * Q                              # payload words per slot row
        if self.pack > 1:
            # packed view: Wb blocks of `pack` pixel sub-rows per y-row;
            # one (2R+1, xb, pack*Q) slice covers the spiral window at
            # any alignment (microbench9: 18 rows, ~5x cheaper than the
            # 81-row unpacked slice at pack=8)
            pk, xb, Wb = self.pack, self.xb, self.Wb
            ss = jnp.repeat(jnp.arange(S, dtype=jnp.int32), C)
            bx = jnp.clip(xs // pk, 0, Wb - xb)
            starts = jnp.stack([ss, ys, bx, jnp.zeros_like(ss)], axis=1)
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
                start_index_map=(0, 1, 2, 3))
            rows = jax.lax.gather(
                queue.reshape(S, Hp, Wb, pk * QW), starts, dn,
                slice_sizes=(1, 2 * R + 1, xb, pk * QW),
                mode=jax.lax.GatherScatterMode.CLIP,
            ).reshape(E, (2 * R + 1) * xb * pk, QW)  # packed sub-rows
            align = xs - bx * pk                     # == x % pack, valid evs
            if self.bench_stage == "gather":
                return (state, None, None, None, None, None,
                        jnp.stack([cover_evict, jnp.ones((), bool)]),
                        (rows,))
            return self._finish_queue_search(
                state, rows, t_f, vid_f, cv, row_major=True, vmin=vmin,
                evict_ok=cover_evict, base=base, align=align)
        if self.split_gather:
            # per-stream slabs behind optimization_barrier: each
            # ~10 MB table stays under the backend's gather knee
            # (scripts/microbench3.py: 3.4 vs 37 ns/idx) — events are
            # stream-major so per-stream slices concatenate in order
            q4 = queue.reshape(S, Hp, Wp, QW)
            dn3 = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                start_index_map=(0, 1, 2))
            outs = []
            for s in range(S):
                slab = jax.lax.optimization_barrier(q4[s])
                st3 = jnp.stack([
                    ys[s * C:(s + 1) * C], xs[s * C:(s + 1) * C],
                    jnp.zeros((C,), jnp.int32)], axis=1)
                outs.append(jax.lax.gather(
                    slab, st3, dn3,
                    slice_sizes=(2 * R + 1, 2 * R + 1, QW),
                    mode=jax.lax.GatherScatterMode.CLIP))
            rows = jnp.concatenate(outs).reshape(E, self.NS, QW)
        else:
            ss = jnp.repeat(jnp.arange(S, dtype=jnp.int32), C)
            starts = jnp.stack([ss, ys, xs, jnp.zeros_like(ss)], axis=1)
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
                start_index_map=(0, 1, 2, 3))
            rows = jax.lax.gather(
                queue.reshape(S, Hp, Wp, QW), starts, dn,
                slice_sizes=(1, 2 * R + 1, 2 * R + 1, QW),
                mode=jax.lax.GatherScatterMode.CLIP,
            ).reshape(E, self.NS, QW)              # row-major cell order
        if self.bench_stage == "gather":
            return (state, None, None, None, None, None,
                    jnp.stack([cover_evict, jnp.ones((), bool)]), (rows,))
        # one materialization of the gathered slab: without the barrier
        # XLA duplicates the (expensive) gather into each consumer
        # fusion of the candidate pass (scripts/microbench10.py dup
        # probe; the in-chain "search" stage delta shrank accordingly)
        rows = jax.lax.optimization_barrier(rows)
        return self._finish_queue_search(
            state, rows, t_f, vid_f, cv, row_major=True, vmin=vmin,
            evict_ok=None if vmin is None else cover_evict, base=base)

    # ------------------------------------------------------------------
    def step(self, params, batch_stats, state: ServeState,
             chunk_pos_px, chunk_feat, chunk_valid, debug: bool = False
             ) -> Tuple[ServeState, jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Ingest one lockstep chunk ([S, C, 3] i32 / [S, C, F] f32 /
        [S, C] bool) and return (state, raw [S, A, 5+ncls], info)."""
        cfg = self.cfg
        S, C, NR = self.S, self.chunk, self.NR
        W, H, T = self.width, self.height, cfg.time_window_us
        E = S * C
        G1 = self.ny1 * self.nx1
        K = cfg.max_neighbors
        act = activation_fn(cfg.activation)
        bb, sb = params["backbone"], batch_stats["backbone"]

        x = chunk_pos_px[..., 0]
        y = chunk_pos_px[..., 1]
        t = chunk_pos_px[..., 2]
        cv = chunk_valid
        n0 = state.num
        r0 = n0 % NR
        vid = n0 + jnp.arange(C, dtype=jnp.int32)
        vid_f = jnp.broadcast_to(vid[None], (S, C)).reshape(E)

        def bail(st, *keep):
            # keep the stage's outputs alive so XLA can't DCE them
            chk = jnp.float32(0) + sum(
                jnp.sum(k).astype(jnp.float32) for k in keep)
            raw = jnp.zeros((S, 1, 5 + cfg.num_classes), jnp.float32) + chk
            return st, raw, {"coverage_ok": st.coverage_ok}

        pol = None
        if self.pol_payload:
            # polarity bit for the FIFO payload + its binary-feature
            # certificate: the algebraic conv1 reconstruction is exact
            # only when every valid feat is one of the two static
            # feat_values, so a violating chunk fails coverage_ok
            # instead of silently corrupting features
            f_lo, f_hi = self.feat_values
            f0 = chunk_feat[..., 0]
            feat_ok = ~jnp.any(cv & (f0 != f_lo) & (f0 != f_hi))
            state = state.replace(
                coverage_ok=state.coverage_ok & feat_ok)
            pol = cv & (f0 == f_hi)
        search = {"sort": self._search_sort,
                  "queue": self._search_queue,
                  "slab": self._search_slab}[self.search_mode]
        (state, src_tab, any_hit, code_sel, src_vid, pol_sel, cover,
         chk) = search(state, x, y, t, cv, vid_f, pol)
        # cover[0]: bounded-state cert (ring eviction / queue depth);
        # cover[1]: feature-ring staleness cert (queue/slab modes)
        state = state.replace(
            num=n0 + C, coverage_ok=state.coverage_ok & cover.all())
        if self.bench_stage in ("insert", "gather", "search"):
            return bail(state, *chk)
        if self.bench_stage == "select":
            return bail(state, src_tab, any_hit, code_sel)

        # ---- event-level convs over the chunk's edges ----------------
        # self edge first (slot 0, ev_graph.cu:44-46), then the picks
        self_tab = ((jnp.arange(S, dtype=jnp.int32) * NR)[:, None]
                    + r0 + jnp.arange(C, dtype=jnp.int32)[None, :]
                    ).reshape(E, 1)
        nbr_tab = jnp.concatenate([self_tab, src_tab], axis=1)   # [E, K]
        nbr_mask = jnp.concatenate([cv.reshape(E)[:, None], any_hit], axis=1)
        R = self.radius
        dxe = (code_sel % 64 - R).astype(jnp.float32) / np.float32(W)
        dye = (code_sel // 64 - R).astype(jnp.float32) / np.float32(H)
        dpos = jnp.concatenate([
            jnp.zeros((E, 1, 2), jnp.float32),
            jnp.stack([dxe, dye], axis=-1),
        ], axis=1)                                              # [E, K, 2]
        attr = dpos / (2.0 * self.mv[0]) + 0.5
        basis = bilinear_basis(
            jnp.clip(attr, 0.0, 1.0), cfg.kernel_size)          # [E, K, P]

        pos_norm = chunk_pos_px.astype(jnp.float32) / jnp.array(
            [W, H, T], jnp.float32)                             # [S, C, 3]
        xin_c = jnp.concatenate(
            [chunk_feat, jnp.where(cv[..., None], pos_norm[..., :2], 0.0)],
            axis=-1)                                            # [S, C, 3]

        ring_idx = jnp.clip(nbr_tab, 0, S * NR - 1).reshape(E * K)

        p1 = bb["conv_block1"]
        s1 = sb["conv_block1"]

        def conv_math(x_src, w_tap, w_root, x_dst):
            b_m = basis * nbr_mask[..., None]
            # batched dot on the MXU (2x the fused multiply+sum here)
            g = jax.lax.dot_general(
                b_m, x_src, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)           # [E, P, cin]
            P, cin, cout = w_tap.shape
            out = jnp.dot(g.reshape(E, P * cin), w_tap.reshape(P * cin, cout),
                          preferred_element_type=jnp.float32)
            return out + jnp.dot(x_dst, w_root,
                                 preferred_element_type=jnp.float32)

        def conv(table_flat, w_tap, w_root, x_dst):
            if self.split_conv_gather:
                # per-stream slab gathers: table [S*NR, F] -> S slabs of
                # [NR, F] behind optimization_barrier, each under the
                # gather knee; events are stream-major and neighbors
                # never cross streams, so local indices partition evenly
                tab3 = table_flat.reshape(S, NR, -1)
                loc = (ring_idx % NR).reshape(S, C * K)
                outs = []
                for s in range(S):
                    slab = jax.lax.optimization_barrier(tab3[s])
                    outs.append(jnp.take_along_axis(
                        slab, loc[s][:, None], axis=0))
                x_src = jnp.concatenate(outs).reshape(E, K, -1)
            else:
                x_src = jnp.take_along_axis(
                    table_flat, ring_idx[:, None], axis=0
                ).reshape(E, K, -1)
            return conv_math(x_src, w_tap, w_root, x_dst)

        xin_dst = xin_c.reshape(E, 3)
        if self.pol_payload:
            # conv1 sources WITHOUT the E*K-row ring gather: (px, py)
            # are algebraic from the edge code (the sync path's
            # nbr_dpos trick — px_src = px_dst + dx/W to ~1 ulp) and
            # feat is the transported polarity bit mapped back to its
            # static value; the self edge (slot 0) uses the event's own
            # exact row.  b_m masks invalid slots, so reconstructed
            # garbage never contributes.
            f_lo, f_hi = self.feat_values
            feat_src = f_lo + pol_sel.astype(jnp.float32) * (f_hi - f_lo)
            pxk = pos_norm[..., 0].reshape(E)[:, None] + dxe
            pyk = pos_norm[..., 1].reshape(E)[:, None] + dye
            x_src1 = jnp.concatenate([
                xin_dst[:, None, :],
                jnp.stack([feat_src, pxk, pyk], axis=-1)], axis=1)
            h1 = conv_math(x_src1,
                           p1["conv_block1"]["conv"]["weight"],
                           p1["conv_block1"]["conv"]["root"], xin_dst)
            xin = state.xin          # dummy ring, never read
        else:
            # write the chunk into the feature ring, then gather
            # sources — same-chunk sources read the just-written rows
            xin = jax.lax.dynamic_update_slice(
                state.xin, xin_c, (0, r0, 0))
            h1 = conv(xin.reshape(S * NR, 3),
                      p1["conv_block1"]["conv"]["weight"],
                      p1["conv_block1"]["conv"]["root"], xin_dst)
        h1 = act(bn_eval(
            h1, p1["conv_block1"]["norm"], s1["conv_block1"]["norm"]))
        h1 = jnp.where(cv.reshape(E)[:, None], h1, 0.0)
        x1 = jax.lax.dynamic_update_slice(
            state.x1, h1.reshape(S, C, -1), (0, r0, 0))

        h2 = conv(x1.reshape(S * NR, self.c1),
                  p1["conv_block2"]["conv"]["weight"],
                  p1["conv_block2"]["conv"]["root"], h1)
        h2 = bn_eval(h2, p1["conv_block2"]["norm"], s1["conv_block2"]["norm"])
        sk = xin_dst @ p1["conv_block2"]["lin"]["kernel"]
        sk = bn_eval(sk, p1["conv_block2"]["norm_skip"],
                     s1["conv_block2"]["norm_skip"])
        x2 = act(h2 + sk)
        x2 = jnp.where(cv.reshape(E)[:, None], x2, 0.0)
        state = state.replace(xin=xin, x1=x1)

        if self.bench_stage == "conv":
            return bail(state, x2)

        # ---- level-1 monotone aggregates (streams fold into the
        # segment id; mirrors engine.step's grow branch) ---------------
        px = jnp.clip(pos_norm[..., 0], 0.0, 0.9999999)
        py = jnp.clip(pos_norm[..., 1], 0.0, 0.9999999)
        cx = jnp.clip((px * self.nx1).astype(jnp.int32), 0, self.nx1 - 1)
        cy = jnp.clip((py * self.ny1).astype(jnp.int32), 0, self.ny1 - 1)
        cell = cx + self.nx1 * cy                               # [S, C]
        sgrid = jnp.arange(S, dtype=jnp.int32)[:, None] * G1
        seg = jnp.where(cv, sgrid + cell, S * G1).reshape(E)
        seg_sum = lambda v, s=seg: jax.ops.segment_sum(
            v, s, num_segments=S * G1 + 1)[:S * G1]
        seg_max = lambda v, s=seg: jax.ops.segment_max(
            v, s, num_segments=S * G1 + 1)[:S * G1]
        big_neg = jnp.finfo(jnp.float32).min
        cvE = cv.reshape(E)
        ring_win = self.window_mode == "ring"
        if ring_win:
            # sliding window: the slots about to be overwritten LEAVE
            # the sums (read them BEFORE the ring writes below); count
            # and pos-sum are exactly decomposable, t-max stays valid
            # monotonically (eviction is oldest-first per stream, so a
            # cell with count > 0 keeps its newest — the arg-max —
            # event live), and the feature max is recomputed from the
            # x2 ring inside the dense tail (fresh steps only)
            ev_cells = jax.lax.dynamic_slice(
                state.cells_ring, (0, r0), (S, C))
            ev_valid = jax.lax.dynamic_slice(
                state.valid_ring, (0, r0), (S, C))
            ev_posn = jax.lax.dynamic_slice(
                state.posn_ring, (0, r0, 0), (S, C, 3))
            seg_ev = jnp.where(
                ev_valid, sgrid + ev_cells, S * G1).reshape(E)
            sub_cnt = seg_sum(
                ev_valid.reshape(E).astype(jnp.int32), seg_ev)
            sub_pos = seg_sum(jnp.where(
                ev_valid[..., None], ev_posn, 0.0).reshape(E, 3), seg_ev)
            cell_cnt = (state.cell_cnt - sub_cnt.reshape(S, G1)
                        + seg_sum(cvE.astype(jnp.int32)).reshape(S, G1))
            pos_sum = (state.pos_sum - sub_pos.reshape(S, G1, 3)
                       + seg_sum(jnp.where(
                           cvE[:, None], pos_norm.reshape(E, 3), 0.0)
                       ).reshape(S, G1, 3))
            cell_max = None
        else:
            new_max = seg_max(jnp.where(cvE[:, None], x2, big_neg)
                              ).reshape(S, G1, -1)
            cell_cnt = state.cell_cnt + seg_sum(
                cvE.astype(jnp.int32)).reshape(S, G1)
            cell_max = jnp.maximum(state.cell_max, new_max)
            pos_sum = state.pos_sum + seg_sum(
                jnp.where(cvE[:, None], pos_norm.reshape(E, 3), 0.0)
            ).reshape(S, G1, 3)
        tmax = jnp.maximum(state.tmax, seg_max(
            jnp.where(cvE, pos_norm.reshape(E, 3)[:, 2], -jnp.inf)
        ).reshape(S, G1))

        # adjacency OR-in from the chunk's edges; source cells derive
        # from the spiral code by the same float path as ops/pool.py's
        # nbr_dpos branch (bit-identical cell assignment, no gathers)
        sxn = (x[..., None] + jnp.round(
            dxe.reshape(S, C, K - 1) * W)).astype(jnp.float32) / W
        syn = (y[..., None] + jnp.round(
            dye.reshape(S, C, K - 1) * H)).astype(jnp.float32) / H
        scx = jnp.clip((jnp.clip(sxn, 0.0, 0.9999999)
                        * self.nx1).astype(jnp.int32), 0, self.nx1 - 1)
        scy = jnp.clip((jnp.clip(syn, 0.0, 0.9999999)
                        * self.ny1).astype(jnp.int32), 0, self.ny1 - 1)
        ddx = scx - cx[..., None]
        ddy = scy - cy[..., None]
        in_st = (jnp.abs(ddx) <= 1) & (jnp.abs(ddy) <= 1)
        o = (ddy + 1) * 3 + (ddx + 1)
        ev = any_hit.reshape(S, C, K - 1) & cv[..., None] & in_st \
            & (o != 4)                                      # no self offset
        at_o = o[..., None] == jnp.arange(9, dtype=o.dtype)   # [S,C,K-1,9]
        if ring_win:
            # per (dst cell, offset): max source vid over the chunk's
            # edges.  An edge dies exactly when its source slot is
            # overwritten (src_vid < num - NR; the dst, being newer,
            # always outlives it), so the liveness bit at tail time is
            # just a compare — no per-edge re-gather ever
            sv = src_vid.reshape(S, C, K - 1)
            dval = jnp.max(jnp.where(
                at_o & ev[..., None], sv[..., None], T_EMPTY),
                axis=2).reshape(E, 9)                           # [E, 9]
            adj_death = jnp.maximum(
                state.adj_death, seg_max(dval).reshape(S, G1, 9))

            # ring writes (the eviction reads above already happened)
            cells_ring = jax.lax.dynamic_update_slice(
                state.cells_ring, jnp.where(cv, cell, G1), (0, r0))
            posn_ring = jax.lax.dynamic_update_slice(
                state.posn_ring,
                jnp.where(cv[..., None], pos_norm, 0.0), (0, r0, 0))
            valid_ring = jax.lax.dynamic_update_slice(
                state.valid_ring, cv, (0, r0))
            x2r = jax.lax.dynamic_update_slice(
                state.x2r, x2.reshape(S, C, -1), (0, r0, 0))
            state = state.replace(
                cell_cnt=cell_cnt, pos_sum=pos_sum, tmax=tmax,
                adj_death=adj_death, cells_ring=cells_ring,
                posn_ring=posn_ring, valid_ring=valid_ring, x2r=x2r,
            )
        else:
            bits = jnp.any(at_o & ev[..., None], axis=2
                           ).reshape(E, 9)                      # [E, 9]
            hit = seg_max(bits.astype(jnp.int32)).reshape(S, G1, 9) > 0
            adj = state.adj | hit

            state = state.replace(
                cell_cnt=cell_cnt, cell_max=cell_max, pos_sum=pos_sum,
                tmax=tmax, adj=adj,
            )

        if self.bench_stage == "agg":
            return bail(state)

        if self.tail_every == 1:
            raw = self._dense_tail(params, batch_stats, state)
            fresh = jnp.ones((), bool)
        else:
            # run the head on the LAST step of every tail_every group
            # (state is complete up to and including this chunk)
            fresh = ((n0 // C) % self.tail_every) == (self.tail_every - 1)
            raw = jax.lax.cond(
                fresh,
                lambda s: self._dense_tail(params, batch_stats, s),
                lambda s: jnp.zeros(
                    (S, self._n_anchors(), 5 + cfg.num_classes),
                    jnp.float32),
                state)
        info: Dict[str, jnp.ndarray] = {"coverage_ok": state.coverage_ok,
                                        "cover_parts": cover,
                                        "raw_fresh": fresh}
        if debug:
            info["nbr_vid"] = jnp.concatenate(
                [vid_f[:, None], src_vid], axis=1).reshape(S, C, K)
            info["nbr_mask"] = nbr_mask.reshape(S, C, K)
        return state, raw, info

    # ------------------------------------------------------------------
    def _n_anchors(self) -> int:
        """Rows of the raw head output per stream (head scales are the
        last ``num_scales`` pyramid grids — see _dense_tail)."""
        gs = [self.grids[2], self.grids[3]][-self.cfg.num_scales:]
        return sum(ny * nx for ny, nx in gs)

    # ------------------------------------------------------------------
    def _level1_nodeset(self, state: ServeState) -> NodeSet:
        """Batched (B = S) mirror of engine._level1_nodeset — the same
        float path so serve == engine == sync at every stage."""
        cfg = self.cfg
        S = self.S
        G1 = self.ny1 * self.nx1
        cmask = state.cell_cnt > 0                              # [S, G1]
        if self.window_mode == "ring":
            # feature max over the LIVE ring (max cannot subtract
            # evicted contributions): one segment pass over the x2
            # ring, on fresh tail steps only (tail_every skips it)
            NR = self.NR
            big_neg = jnp.finfo(jnp.float32).min
            segr = jnp.where(
                state.valid_ring,
                jnp.arange(S, dtype=jnp.int32)[:, None] * G1
                + state.cells_ring, S * G1).reshape(S * NR)
            cell_max = jax.ops.segment_max(
                jnp.where(state.valid_ring.reshape(S * NR)[:, None],
                          state.x2r.reshape(S * NR, -1), big_neg),
                segr, num_segments=S * G1 + 1)[:S * G1].reshape(S, G1, -1)
        else:
            cell_max = state.cell_max
        feat = jnp.where(cmask[..., None], jnp.where(
            cell_max > jnp.finfo(jnp.float32).min / 2,
            cell_max, 0.0), 0.0)
        pos = state.pos_sum / jnp.maximum(state.cell_cnt[..., None], 1)
        pxy = jnp.floor((pos[..., :2] + 1e-5) * jnp.array(
            [self.width, self.height], jnp.float32))
        pxy = pxy / jnp.array([self.width, self.height], jnp.float32)
        pos = jnp.concatenate([pxy, pos[..., 2:]], axis=-1)
        pos = jnp.where(cmask[..., None], pos, 0.0)

        cid = jnp.arange(G1, dtype=jnp.int32)
        ccx, ccy = cid % self.nx1, cid // self.nx1
        offs = jnp.array(GRID_OFFSETS, jnp.int32)
        nx_ = ccx[:, None] + offs[None, :, 1]
        ny_ = ccy[:, None] + offs[None, :, 0]
        inb = (nx_ >= 0) & (nx_ < self.nx1) & (ny_ >= 0) & (ny_ < self.ny1)
        nbr = jnp.clip(nx_ + self.nx1 * ny_, 0, G1 - 1)         # [G1, 9]
        nbr_b = jnp.broadcast_to(nbr[None], (S, G1, 9))
        # neighbor-cell validity / t_max are shifted canvases (padded
        # slices) — the [S, G1*9]-row gathers were tail launch overhead
        from dagr_tpu.ops.spline import stencil_srcs

        src_ok = stencil_srcs(
            cmask.reshape(S, self.ny1, self.nx1, 1)).reshape(S, G1, 9)
        if self.window_mode == "ring":
            # edge alive iff its newest source event still occupies its
            # ring slot (see step's adj_death construction)
            adj = state.adj_death >= state.num - self.NR
        else:
            adj = state.adj
        nbr_mask = adj & inb[None] & src_ok & cmask[..., None]
        if cfg.keep_temporal_ordering:
            tmax_nbr = stencil_srcs(
                state.tmax.reshape(S, self.ny1, self.nx1, 1)
            ).reshape(S, G1, 9)
            nbr_mask = nbr_mask & (state.tmax[..., None] > tmax_nbr)
        return NodeSet(
            feat=feat, pos=pos, mask=cmask,
            graph=EventGraph(nbr=nbr_b, nbr_mask=nbr_mask),
            tmax=state.tmax, grid_hw=(self.ny1, self.nx1),
        )

    def _dense_tail(self, params, batch_stats, state: ServeState):
        """Levels 2-5 + head, batch = S (mirrors engine._dense_tail's
        non-flop path; the serve-vs-sync consistency test pins them
        equal)."""
        cfg = self.cfg
        bb, sb = params["backbone"], batch_stats["backbone"]
        hd, sh = params["head"], batch_stats["head"]
        act = cfg.activation

        def with_rel(ns):
            rel = jnp.where(ns.mask[..., None], ns.pos[..., :2], 0.0)
            return ns.replace(feat=jnp.concatenate([ns.feat, rel], axis=-1))

        ns = self._level1_nodeset(state)
        if self.bench_stage == "tail1":
            return jnp.zeros((self.S, 1, 5 + cfg.num_classes),
                             jnp.float32) + jnp.sum(ns.feat)
        outs = []
        for li, name in enumerate(["layer2", "layer3", "layer4", "layer5"]):
            ns = with_rel(ns)
            ns = layer_eval(bb[name], sb[name], ns, self.mv[li + 1], act)
            if name == "layer4":
                outs.append(ns)
            if li < 3:
                g = self.grids[li + 1]
                ns = pool_nodeset(
                    ns, grid_ny=g[0], grid_nx=g[1],
                    width=self.width, height=self.height,
                    aggr="mean" if li == 2 else cfg.pooling_aggr,
                    keep_temporal_ordering=cfg.keep_temporal_ordering,
                )
            # bench sub-stages: exit after layer li+2 (+ its pool)
            if self.bench_stage == f"tail{li + 2}":
                return jnp.zeros((self.S, 1, 5 + cfg.num_classes),
                                 jnp.float32) + jnp.sum(ns.feat)
        outs.append(ns)
        outs = outs[-cfg.num_scales:]

        raws = []
        n_scales = cfg.num_scales
        mvs = self.mv[-n_scales:] if n_scales > 1 else (self.mv[4],)
        for k, o in enumerate(outs):
            cls_o, reg_o, obj_o = scale_head_eval(
                hd[f"scale{k + 1}"], sh[f"scale{k + 1}"], o, mvs[k], act)
            out = jnp.concatenate([reg_o, obj_o, cls_o], axis=-1)
            raws.append(out.reshape(self.S, -1, out.shape[-1]))
        return jnp.concatenate(raws, axis=1)

    # ------------------------------------------------------------------
    def make_step(self, params, batch_stats, debug: bool = False):
        """Jitted step(state, pos_px [S,C,3], feat [S,C,F], valid [S,C]);
        the state argument is donated so the rings update in place."""

        @functools.partial(jax.jit, donate_argnums=(0,))
        def _step(state, pos_px, feat, valid):
            return self.step(params, batch_stats, state, pos_px, feat,
                             valid, debug=debug)

        return _step

    def make_chain(self, params, batch_stats, n_steps: int,
                   decode: bool = False):
        """Jitted scan over ``n_steps`` stacked chunks — amortizes the
        per-call tunnel overhead for honest device timing.  Returns
        (state, raw_last, coverage_ok_all).

        ``decode=True`` runs the full detect path (decode + confidence
        filter + class-aware NMS, models/dagr.py:detect) on every FRESH
        step inside the chain — event->DETECTION throughput at protocol
        parity with the sync bench; skipped (tail_every) steps bypass
        the decoder via the same freshness cond."""
        if decode:
            from dagr_tpu.models.dagr import detect

        def _decode(raw):
            det = detect(raw, self.cfg, self.height, self.width)
            return det["boxes"], det["scores"]

        @functools.partial(jax.jit, donate_argnums=(0,))
        def _chain(state, pos_px, feat, valid):
            def body(s, pfv):
                s, raw, info = self.step(params, batch_stats, s, *pfv)
                out = raw
                if decode:
                    if self.tail_every == 1:
                        out = _decode(raw)
                    else:
                        out = jax.lax.cond(
                            info["raw_fresh"], _decode,
                            lambda r: jax.tree.map(
                                jnp.zeros_like,
                                jax.eval_shape(_decode, r)), raw)
                return s, (out, info["coverage_ok"])
            state, (outs, cover) = jax.lax.scan(
                body, state, (pos_px, feat, valid))
            return state, jax.tree.map(lambda a: a[-1], outs), cover.all()

        return _chain


def chunk_streams(pos_px: np.ndarray, feat: np.ndarray, chunk: int):
    """Split [S, n, 3] lockstep streams into padded [S, C, ...] chunks
    (valid prefixes have equal length across streams by construction)."""
    S, n = pos_px.shape[:2]
    out = []
    for i0 in range(0, max(n, 1), chunk):
        i1 = min(i0 + chunk, n)
        c = i1 - i0
        p = np.zeros((S, chunk, 3), np.int32)
        f = np.zeros((S, chunk, feat.shape[-1]), np.float32)
        v = np.zeros((S, chunk), bool)
        p[:, :c] = pos_px[:, i0:i1]
        f[:, :c] = feat[:, i0:i1]
        v[:, :c] = True
        out.append((p, f, v))
    return out
