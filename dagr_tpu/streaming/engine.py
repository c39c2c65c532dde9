"""Streaming (asynchronous) inference engine.

TPU-native recast of the reference's per-event asynchronous runtime
(reference: src/dagr/asynchronous/ — make_model_asynchronous and the
per-op incremental updates in conv.py / max_pool.py / linear.py /
batch_norm.py).  The reference mutates torch modules in place and
chases changed-node index sets; none of that jits.  Here (SURVEY.md §7)
the recursion becomes **masked micro-batch recomputation over
persistent state**:

* New events arrive in fixed-size chunks.  The event store, the
  per-node conv_block1 activations, and the level-1 pooling aggregates
  (count / max / pos-sum / t-max / stencil adjacency) live in a
  ``StreamState`` pytree of static shapes.
* The event level (the 50k-node bulk of the compute) is updated only
  for the new chunk: the src<=dst edge invariant
  (reference: model/layers/ev_tgn.py:53-55) guarantees existing nodes'
  event-level activations never change, so chunk-only updates are
  EXACT, and level-1 max/mean aggregates grow monotonically.
* The pooled pyramid (<= 2.2k cells) plus detection head is recomputed
  densely every chunk — on TPU this is a handful of tiny matmuls,
  cheaper than any bookkeeping, and makes streaming outputs equal the
  sync forward by construction (the reference only promises 1e-3,
  evaluate_flops.py:139-146).
* Sparse-equivalent FLOPs are accounted analytically from the touched
  masks with the reference's formulas
  (reference: asynchronous/flops/conv.py:4-37) so the async-efficiency
  numbers stay comparable, while wall-clock latency is the real metric.

One window = one ``reset`` (fresh state), mirroring reset=True
(reference: asynchronous/__init__.py + ev_tgn.py:45-57).
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from dagr_tpu.config import DagrConfig
from dagr_tpu.core.types import EventGraph, NodeSet, GRID_OFFSETS, GRID_SELF_OFFSET
from dagr_tpu.graph.build import search_edges_into_store
from dagr_tpu.models.functional import (
    bn_eval, layer_eval, scale_head_eval, spline_conv_gather,
)
from dagr_tpu.models.blocks import activation_fn
from dagr_tpu.ops.pool import pool_nodeset


@struct.dataclass
class StreamState:
    num: jnp.ndarray          # i32 [] events ingested (= next virtual id)
    pos_px: jnp.ndarray       # i32 [N, 3]
    pos: jnp.ndarray          # f32 [N, 3] normalized
    feat: jnp.ndarray         # f32 [N, F] polarity features
    valid: jnp.ndarray        # bool [N]
    vid: jnp.ndarray          # i32 [N] virtual event id per slot (ring)
    cells: jnp.ndarray        # i32 [N] level-1 cell id per node
    x1: jnp.ndarray           # f32 [N, C1] conv_block1 activations
    x2: jnp.ndarray           # f32 [N, C1] Layer1 outputs (ring recompute)
    nbr_slots: jnp.ndarray    # i32 [N, K] source slots of each node's edges
    nbr_vid: jnp.ndarray      # i32 [N, K] source vids (liveness check)
    nbr_valid: jnp.ndarray    # bool [N, K]
    cell_cnt: jnp.ndarray     # i32 [G1]
    cell_max: jnp.ndarray     # f32 [G1, C1]
    pos_sum: jnp.ndarray      # f32 [G1, 3]
    tmax: jnp.ndarray         # f32 [G1]
    adj: jnp.ndarray          # bool [G1, 9]
    edges_total: jnp.ndarray  # i32 [] edges accumulated (stats)


class StreamingDetector:
    """Chunked streaming inference over one event stream (batch = 1)."""

    def __init__(self, cfg: DagrConfig, height: int, width: int,
                 chunk: Optional[int] = None, count_flops: bool = True,
                 window_mode: str = "grow"):
        """window_mode:
        * "grow" — append-only store for one bounded window; reset the
          state per window (the evaluate_flops protocol).
        * "ring" — sliding window over an infinite stream: when the
          ``n_nodes`` capacity is full, new events evict the oldest
          (reference: graph/ev_graph.py:121-136, delete_nodes).  Level-1
          aggregates and pooled adjacency are recomputed from the live
          store each step (max-pooling cannot "subtract" evicted
          contributions), so ring steps cost more than grow steps.
        """
        assert window_mode in ("grow", "ring")
        self.cfg = cfg
        self.height, self.width = height, width
        self.chunk = min(chunk or cfg.stream_chunk, cfg.n_nodes)
        self.count_flops = count_flops
        self.window_mode = window_mode
        self.capacity = cfg.n_nodes
        ch = cfg.channels()
        self.c1 = ch[1]
        self.grids = cfg.grid_shapes()
        self.ny1, self.nx1 = self.grids[0]
        self.mv = cfg.cartesian_max_values(width)
        self.radius = cfg.radius_px(width)
        self.delta_t = cfg.delta_t_us()

    # ------------------------------------------------------------------
    def init_state(self) -> StreamState:
        N = self.capacity
        G1 = self.ny1 * self.nx1
        ch = self.cfg.channels()
        K = self.cfg.max_neighbors
        return StreamState(
            num=jnp.zeros((), jnp.int32),
            pos_px=jnp.zeros((N, 3), jnp.int32),
            pos=jnp.zeros((N, 3), jnp.float32),
            feat=jnp.zeros((N, 1), jnp.float32),
            valid=jnp.zeros((N,), bool),
            vid=jnp.full((N,), -1, jnp.int32),
            cells=jnp.full((N,), G1, jnp.int32),
            x1=jnp.zeros((N, ch[1]), jnp.float32),
            x2=jnp.zeros((N, ch[1]), jnp.float32),
            nbr_slots=jnp.zeros((N, K), jnp.int32),
            nbr_vid=jnp.full((N, K), -1, jnp.int32),
            nbr_valid=jnp.zeros((N, K), bool),
            cell_cnt=jnp.zeros((G1,), jnp.int32),
            # level-1 cells aggregate Layer1 outputs (ch[1] wide)
            cell_max=jnp.full((G1, ch[1]), jnp.finfo(jnp.float32).min),
            pos_sum=jnp.zeros((G1, 3), jnp.float32),
            tmax=jnp.full((G1,), -jnp.inf, jnp.float32),
            adj=jnp.zeros((G1, 9), bool),
            edges_total=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------
    def step(self, params, batch_stats, state: StreamState,
             chunk_pos_px, chunk_feat, chunk_valid
             ) -> Tuple[StreamState, jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Ingest one chunk (valid entries form a prefix) and produce
        the current raw head outputs [1, A, 5 + ncls] plus
        sparse-equivalent FLOP counts."""
        cfg = self.cfg
        W, H, T = self.width, self.height, cfg.time_window_us
        C = chunk_pos_px.shape[0]
        N = self.capacity
        G1 = self.ny1 * self.nx1
        act = cfg.activation
        bb = params["backbone"]
        sb = batch_stats["backbone"]

        ring = self.window_mode == "ring"
        n0 = state.num
        vids = n0 + jnp.arange(C, dtype=jnp.int32)          # virtual ids
        if ring:
            slots = vids % N
            cv = chunk_valid
        else:
            slots = vids
            cv = chunk_valid & (slots < N)

        pos_norm_c = chunk_pos_px.astype(jnp.float32) / jnp.array(
            [W, H, T], jnp.float32)

        if ring:
            # scatter writes; invalid entries dropped via OOB index
            w_slots = jnp.where(cv, slots, N)

            def put(table, values):
                return table.at[w_slots].set(values.astype(table.dtype))
        else:
            def put(table, values):
                return jax.lax.dynamic_update_slice_in_dim(
                    table, values.astype(table.dtype), n0, axis=0)

        state = state.replace(
            pos_px=put(state.pos_px, chunk_pos_px),
            pos=put(state.pos, pos_norm_c),
            feat=put(state.feat, chunk_feat),
            valid=put(state.valid, cv) if not ring
            else state.valid.at[w_slots].set(True),
            vid=put(state.vid, vids),
            num=(n0 + cv.sum().astype(jnp.int32)) if ring
            else jnp.minimum(n0 + cv.sum().astype(jnp.int32), N),
        )

        # ---- graph: new edges into the store (insert-then-search) ----
        nbr_rest, mask_rest = search_edges_into_store(
            state.pos_px[:, 0], state.pos_px[:, 1], state.pos_px[:, 2],
            state.valid,
            chunk_pos_px[:, 0], chunk_pos_px[:, 1], chunk_pos_px[:, 2],
            vids, cv,
            width=W, height=H, radius=self.radius,
            delta_t_us=self.delta_t, max_neighbors=cfg.max_neighbors,
            queue_size=cfg.max_queue_size,
            store_vid=state.vid if ring else None,
        )
        slots_c = jnp.clip(slots, 0, N - 1)
        nbr = jnp.concatenate([slots_c[:, None], nbr_rest], axis=1)  # [C, K]
        nbr_mask = jnp.concatenate([cv[:, None], mask_rest], axis=1)

        # ---- event level: update only the chunk (exact, see module doc)
        x_in_table = jnp.concatenate(
            [state.feat, jnp.where(state.valid[:, None], state.pos[:, :2], 0.0)],
            axis=1)                                               # [N, 3]
        x_in_dst = jnp.take_along_axis(x_in_table, slots_c[:, None], axis=0)
        p1 = bb["conv_block1"]
        s1 = sb["conv_block1"]

        h1 = spline_conv_gather(
            x_in_table, state.pos, pos_norm_c, x_in_dst, nbr, nbr_mask,
            p1["conv_block1"]["conv"]["weight"],
            p1["conv_block1"]["conv"]["root"], None, max_value=self.mv[0])
        h1 = activation_fn(act)(bn_eval(
            h1, p1["conv_block1"]["norm"], s1["conv_block1"]["norm"]))
        h1 = jnp.where(cv[:, None], h1, 0.0)
        state = state.replace(x1=put(state.x1, h1))

        h2 = spline_conv_gather(
            state.x1, state.pos, pos_norm_c, h1, nbr, nbr_mask,
            p1["conv_block2"]["conv"]["weight"],
            p1["conv_block2"]["conv"]["root"], None, max_value=self.mv[0])
        h2 = bn_eval(h2, p1["conv_block2"]["norm"], s1["conv_block2"]["norm"])
        sk = x_in_dst @ p1["conv_block2"]["lin"]["kernel"]
        sk = bn_eval(sk, p1["conv_block2"]["norm_skip"],
                     s1["conv_block2"]["norm_skip"])
        x2 = activation_fn(act)(h2 + sk)
        x2 = jnp.where(cv[:, None], x2, 0.0)
        state = state.replace(x2=put(state.x2, x2))

        # cache the chunk's edges (needed for ring recompute; cheap)
        nbr_vid_c = jnp.take_along_axis(
            state.vid, jnp.clip(nbr, 0, N - 1).reshape(-1), axis=0
        ).reshape(C, -1)
        state = state.replace(
            nbr_slots=put(state.nbr_slots, nbr),
            nbr_vid=put(state.nbr_vid, nbr_vid_c),
            nbr_valid=put(state.nbr_valid, nbr_mask),
            edges_total=state.edges_total + nbr_mask.sum().astype(jnp.int32),
        )

        px = jnp.clip(pos_norm_c[:, 0], 0.0, 0.9999999)
        py = jnp.clip(pos_norm_c[:, 1], 0.0, 0.9999999)
        cx = jnp.clip((px * self.nx1).astype(jnp.int32), 0, self.nx1 - 1)
        cy = jnp.clip((py * self.ny1).astype(jnp.int32), 0, self.ny1 - 1)
        cell_c = jnp.where(cv, cx + self.nx1 * cy, G1)
        state = state.replace(cells=put(state.cells, cell_c))

        seg_max_c = lambda v: jax.ops.segment_max(
            v, cell_c, num_segments=G1 + 1)[:G1]
        seg_sum_c = lambda v: jax.ops.segment_sum(
            v, cell_c, num_segments=G1 + 1)[:G1]
        touched = seg_sum_c(cv.astype(jnp.int32)) > 0

        big_neg = jnp.finfo(jnp.float32).min
        if not ring:
            # ---- monotone aggregate update (append-only window) -------
            new_max = seg_max_c(jnp.where(cv[:, None], x2, big_neg))
            state = state.replace(
                cell_cnt=state.cell_cnt + seg_sum_c(cv.astype(jnp.int32)),
                cell_max=jnp.maximum(state.cell_max, new_max),
                pos_sum=state.pos_sum + seg_sum_c(
                    jnp.where(cv[:, None], pos_norm_c, 0.0)),
                tmax=jnp.maximum(state.tmax, seg_max_c(
                    jnp.where(cv, pos_norm_c[:, 2], -jnp.inf))),
            )
            # adjacency from the chunk's new edges (pooled-edge OR-in,
            # reference async analogue: max_pool.py:203-243)
            src_cells = jnp.take_along_axis(
                state.cells, jnp.clip(nbr, 0, N - 1).reshape(-1), axis=0
            ).reshape(C, -1)
            scx, scy = src_cells % self.nx1, src_cells // self.nx1
            dx = scx - cx[:, None]
            dy = scy - cy[:, None]
            in_st = (jnp.abs(dx) <= 1) & (jnp.abs(dy) <= 1)
            o = (dy + 1) * 3 + (dx + 1)
            ev = nbr_mask & cv[:, None] & in_st & (o != GRID_SELF_OFFSET) \
                & (src_cells < G1)
            # K-axis pre-reduce, then segment per ROW (see ops/pool.py)
            bits = jnp.any(
                (o[..., None] == jnp.arange(9, dtype=o.dtype))
                & ev[..., None], axis=1)                      # [C, 9]
            hit = jax.ops.segment_max(
                bits.astype(jnp.int32), cell_c,
                num_segments=G1 + 1)[:G1] > 0
            state = state.replace(adj=state.adj | hit)
        else:
            # ---- sliding window: recompute aggregates from the live
            # store (eviction invalidates monotone max/sum caches;
            # reference delete_nodes analogue, ev_graph.py:121-136) ----
            live = state.valid
            seg = jnp.where(live, state.cells, G1)
            seg_max = lambda v: jax.ops.segment_max(
                v, seg, num_segments=G1 + 1)[:G1]
            seg_sum = lambda v: jax.ops.segment_sum(
                v, seg, num_segments=G1 + 1)[:G1]
            state = state.replace(
                cell_cnt=seg_sum(live.astype(jnp.int32)),
                cell_max=seg_max(jnp.where(live[:, None], state.x2, big_neg)),
                pos_sum=seg_sum(jnp.where(live[:, None], state.pos, 0.0)),
                tmax=seg_max(jnp.where(live, state.pos[:, 2], -jnp.inf)),
            )
            # adjacency from all LIVE stored edges: an edge survives iff
            # its source slot still holds the same event (vid match).
            # vid+cells ride ONE row gather: width-1 gathers cost ~6x
            # more per index on this backend (scripts/microbench2.py)
            src_slots = jnp.clip(state.nbr_slots, 0, N - 1)
            vc = jnp.stack([state.vid, state.cells], axis=1)   # [N, 2]
            got = jnp.take_along_axis(
                vc, src_slots.reshape(-1)[:, None], axis=0)
            src_live = got[:, 0].reshape(N, -1) == state.nbr_vid
            src_cells = got[:, 1].reshape(N, -1)
            dcx = state.cells % self.nx1
            dcy = jnp.minimum(state.cells // self.nx1, self.ny1 - 1)
            dx = src_cells % self.nx1 - dcx[:, None]
            dy = jnp.minimum(src_cells // self.nx1, self.ny1 - 1) \
                - dcy[:, None]
            in_st = (jnp.abs(dx) <= 1) & (jnp.abs(dy) <= 1)
            o = (dy + 1) * 3 + (dx + 1)
            ev = state.nbr_valid & live[:, None] & src_live & in_st \
                & (o != GRID_SELF_OFFSET) & (src_cells < G1) \
                & (state.cells < G1)[:, None]
            # K-axis pre-reduce, then segment N ROWS by dst cell — the
            # per-item scatter over N*K flat ids was the ring-mode
            # hotspot (~5.5 ms per step; see ops/pool.py note)
            bits = jnp.any(
                (o[..., None] == jnp.arange(9, dtype=o.dtype))
                & ev[..., None], axis=1)                      # [N, 9]
            adj = jax.ops.segment_max(
                bits.astype(jnp.int32), jnp.minimum(state.cells, G1),
                num_segments=G1 + 1)[:G1] > 0
            state = state.replace(adj=adj)

        raw, flops = self._dense_tail(params, batch_stats, state,
                                      nbr_mask, cv, touched)
        return state, raw, flops

    # ------------------------------------------------------------------
    def _level1_nodeset(self, state: StreamState) -> NodeSet:
        cfg = self.cfg
        G1 = self.ny1 * self.nx1
        cmask = state.cell_cnt > 0
        feat = jnp.where(cmask[:, None], jnp.where(
            state.cell_max > jnp.finfo(jnp.float32).min / 2,
            state.cell_max, 0.0), 0.0)
        pos = state.pos_sum / jnp.maximum(state.cell_cnt[:, None], 1)
        pxy = jnp.floor((pos[:, :2] + 1e-5) * jnp.array(
            [self.width, self.height], jnp.float32))
        pxy = pxy / jnp.array([self.width, self.height], jnp.float32)
        pos = jnp.concatenate([pxy, pos[:, 2:]], axis=1)
        pos = jnp.where(cmask[:, None], pos, 0.0)

        cid = jnp.arange(G1, dtype=jnp.int32)
        ccx, ccy = cid % self.nx1, cid // self.nx1
        offs = jnp.array(GRID_OFFSETS, jnp.int32)
        nx_ = ccx[:, None] + offs[None, :, 1]
        ny_ = ccy[:, None] + offs[None, :, 0]
        inb = (nx_ >= 0) & (nx_ < self.nx1) & (ny_ >= 0) & (ny_ < self.ny1)
        nbr = jnp.clip(nx_ + self.nx1 * ny_, 0, G1 - 1)
        # neighbor-cell validity / t_max are shifted canvases (padded
        # slices, ops/spline.py:stencil_srcs) — cheaper than any gather
        from dagr_tpu.ops.spline import stencil_srcs

        src_ok = stencil_srcs(
            cmask.reshape(1, self.ny1, self.nx1, 1)).reshape(nbr.shape)
        nbr_mask = state.adj & inb & src_ok & cmask[:, None]
        if cfg.keep_temporal_ordering:
            tmax_nbr = stencil_srcs(
                state.tmax.reshape(1, self.ny1, self.nx1, 1)
            ).reshape(nbr.shape)
            nbr_mask = nbr_mask & (state.tmax[:, None] > tmax_nbr)

        return NodeSet(
            feat=feat[None], pos=pos[None], mask=cmask[None],
            graph=EventGraph(nbr=nbr[None], nbr_mask=nbr_mask[None]),
            tmax=state.tmax[None], grid_hw=(self.ny1, self.nx1),
        )

    def _dense_tail(self, params, batch_stats, state: StreamState,
                    chunk_nbr_mask, cv, touched1, collect=None):
        """Levels 2-5 + head, dense recompute (mirrors
        reference net.py:131-190 + dagr.py:192-236 eval path).

        ``collect`` — optional dict; when given, every stage's
        activations are recorded into it under the sync_activations
        naming (pool1..4 / layer2..5 / head_scale* / raw) so the
        consistency harness can diff EVERY stage, matching the
        reference's hook-every-module protocol
        (reference: asynchronous/evaluate_flops.py:25-74,240-261)."""
        cfg = self.cfg
        bb, sb = params["backbone"], batch_stats["backbone"]
        hd, sh = params["head"], batch_stats["head"]
        act = cfg.activation
        ch = cfg.channels()

        def with_rel(ns):
            rel = jnp.where(ns.mask[..., None], ns.pos[..., :2], 0.0)
            return ns.replace(feat=jnp.concatenate([ns.feat, rel], axis=-1))

        ns = self._level1_nodeset(state)
        if collect is not None:
            collect["pool1"] = ns.feat
        outs = []
        flops: Dict[str, jnp.ndarray] = {}

        if self.count_flops:
            # sparse-equivalent FLOPs: event level (reference formulas,
            # asynchronous/flops/conv.py:4-24)
            e0 = chunk_nbr_mask.sum()
            n0 = cv.sum()
            cin0 = ch[0] + 2
            flops["conv_block1.conv_block1"] = (
                e0 * (2 * cin0 - 1) * ch[1] + n0 * ch[1] * (2 * cin0 - 1))
            flops["conv_block1.conv_block2"] = (
                e0 * (2 * ch[1] - 1) * ch[1] + n0 * (
                    ch[1] * (2 * ch[1] - 1)        # root
                    + ch[1] * (2 * cin0 - 1)))     # skip linear

        changed = touched1                     # bool [G1]
        changed_snaps = []
        level_names = ["layer2", "layer3", "layer4", "layer5"]
        for li, name in enumerate(level_names):
            ns = with_rel(ns)
            if self.count_flops:
                # sparse-equivalent counts: 2 convs dilate the changed set
                nbrm = ns.graph.nbr_mask[0]
                nbrs = ns.graph.nbr[0]
                for conv_i in range(2):
                    aff = changed | (changed[nbrs] & nbrm).any(-1)
                    e = (nbrm & aff[:, None]).sum()
                    cin = ns.feat.shape[-1] if conv_i == 0 else ch[li + 2]
                    cout = ch[li + 2]
                    f = e * (2 * cin - 1) * cout \
                        + aff.sum() * cout * (2 * cin - 1)
                    flops[f"{name}.conv_block{conv_i + 1}"] = f
                    changed = aff
            ns = layer_eval(bb[name], sb[name], ns, self.mv[li + 1], act)
            if collect is not None:
                collect[name] = ns.feat
            if name == "layer4":
                outs.append(ns)
                if self.count_flops:
                    changed_snaps.append((changed, ns))
            if li < 3:
                g = self.grids[li + 1]
                ns = pool_nodeset(
                    ns, grid_ny=g[0], grid_nx=g[1],
                    width=self.width, height=self.height,
                    aggr="mean" if li == 2 else cfg.pooling_aggr,
                    keep_temporal_ordering=cfg.keep_temporal_ordering,
                )
                if collect is not None:
                    collect[f"pool{li + 2}"] = ns.feat
                if self.count_flops:
                    # pooled changed set: parent cells of changed cells
                    ny0, nx0 = self.grids[li][0], self.grids[li][1]
                    c0 = jnp.arange(ny0 * nx0)
                    parent = (c0 % nx0) // 2 + g[1] * ((c0 // nx0) // 2)
                    changed = jax.ops.segment_max(
                        changed.astype(jnp.int32), parent,
                        num_segments=g[0] * g[1]) > 0
        outs.append(ns)
        if self.count_flops:
            changed_snaps.append((changed, ns))
            changed_snaps = changed_snaps[-cfg.num_scales:]
        outs = outs[-cfg.num_scales:]

        raws = []
        n_scales = cfg.num_scales
        mvs = self.mv[-n_scales:] if n_scales > 1 else (self.mv[4],)
        for k, o in enumerate(outs):
            if self.count_flops:
                # head convs (reference logs every async SplineConv,
                # including the head's, via asy_flops_log)
                ch_k, ns_k = changed_snaps[k]
                nbrm = ns_k.graph.nbr_mask[0]
                nbrs = ns_k.graph.nbr[0]
                n_reg = max(ch[-cfg.num_scales:])
                cin = ns_k.feat.shape[-1]
                plan = [("stem", cin, n_reg), ("cls_conv", n_reg, n_reg),
                        ("reg_conv", n_reg, n_reg),
                        ("preds", n_reg, cfg.num_classes + 5)]
                aff = ch_k
                for pname, ci, co in plan:
                    if pname != "preds":
                        aff = aff | (aff[nbrs] & nbrm).any(-1)
                    e = (nbrm & aff[:, None]).sum()
                    flops[f"head.scale{k + 1}.{pname}"] = (
                        e * (2 * ci - 1) * co + aff.sum() * co * (2 * ci - 1))
            cls_o, reg_o, obj_o = scale_head_eval(
                hd[f"scale{k + 1}"], sh[f"scale{k + 1}"], o, mvs[k], act)
            out = jnp.concatenate([reg_o, obj_o, cls_o], axis=-1)
            if collect is not None:
                collect[f"head_scale{k + 1}"] = out
            raws.append(out.reshape(1, -1, out.shape[-1]))
        raw = jnp.concatenate(raws, axis=1)
        if collect is not None:
            collect["raw"] = raw
        flops["total"] = (
            sum(jax.tree.leaves(flops)) if flops else jnp.zeros((), jnp.int32)
        )
        return raw, flops

    # ------------------------------------------------------------------
    def tail_activations(self, params, batch_stats,
                         state: StreamState) -> Dict[str, jnp.ndarray]:
        """Re-run the dense tail on the current state, collecting every
        stage (pool1..4, layer2..5, head_scale*, raw) for the
        consistency harness.  Not part of the hot step."""
        acts: Dict[str, jnp.ndarray] = {}
        cf, self.count_flops = self.count_flops, False
        try:
            self._dense_tail(
                params, batch_stats, state,
                jnp.zeros((1, self.cfg.max_neighbors), bool),
                jnp.zeros((1,), bool),
                jnp.zeros((self.ny1 * self.nx1,), bool),
                collect=acts,
            )
        finally:
            self.count_flops = cf
        return acts

    # ------------------------------------------------------------------
    def make_step(self, params, batch_stats):
        """Returns a jitted step(state, pos_px, feat, valid).  The state
        argument is donated so the persistent tables update in place."""

        @functools.partial(jax.jit, donate_argnums=(0,))
        def _step(state, pos_px, feat, valid):
            return self.step(params, batch_stats, state, pos_px, feat, valid)

        return _step

    # ------------------------------------------------------------------
    def init_states(self, n_streams: int) -> StreamState:
        """Stacked state for ``n_streams`` independent event streams."""
        one = self.init_state()
        return jax.tree.map(
            lambda a: jnp.broadcast_to(a, (n_streams,) + a.shape).copy(), one)

    def make_step_multistream(self, params, batch_stats):
        """vmapped step over stacked streams: each chip serves many
        independent cameras (streaming inference is embarrassingly
        parallel, SURVEY.md §5); batching streams amortizes per-op
        overheads.  step(states, pos_px [S,C,3], feat [S,C,F],
        valid [S,C]) -> (states, raw [S,1,A,*], flops)."""

        def one(state, pos_px, feat, valid):
            return self.step(params, batch_stats, state, pos_px, feat, valid)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def _step(states, pos_px, feat, valid):
            return jax.vmap(one)(states, pos_px, feat, valid)

        return _step


def chunk_events(pos_px: np.ndarray, feat: np.ndarray, chunk: int):
    """Split one sample's [n, 3] events into padded chunks."""
    n = len(pos_px)
    out = []
    for i0 in range(0, max(n, 1), chunk):
        i1 = min(i0 + chunk, n)
        c = i1 - i0
        p = np.zeros((chunk, 3), np.int32)
        f = np.zeros((chunk, feat.shape[-1]), np.float32)
        v = np.zeros((chunk,), bool)
        p[:c] = pos_px[i0:i1]
        f[:c] = feat[i0:i1]
        v[:c] = True
        out.append((p, f, v))
    return out
