"""Per-layer sync <-> streaming activation equivalence harness.

Native port of the reference's consistency checker
(reference: src/dagr/asynchronous/evaluate_flops.py:25-74,240-261 —
forward hooks on every module compare dense-sync vs async activations,
max abs diff <= 1e-3).  Here both paths are pure functions, so we
evaluate the same named stages explicitly and diff them.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from dagr_tpu.config import DagrConfig
from dagr_tpu.core.types import EventBatch, NodeSet
from dagr_tpu.graph.build import build_graph
from dagr_tpu.models.functional import layer_eval, scale_head_eval
from dagr_tpu.ops.pool import pool_nodeset


def sync_activations(
    params, batch_stats, events: EventBatch, cfg: DagrConfig,
    height: int, width: int,
) -> Dict[str, np.ndarray]:
    """Eval-mode forward collecting per-stage activations (the
    functional mirror of Net.forward, reference net.py:108-190)."""
    bb, sb = params["backbone"], batch_stats["backbone"]
    hd, sh = params["head"], batch_stats["head"]
    mv = cfg.cartesian_max_values(width)
    grids = cfg.grid_shapes()
    acts: Dict[str, np.ndarray] = {}

    graph = build_graph(
        events.pos_px(), events.mask, width=width, height=height,
        radius=cfg.radius_px(width), delta_t_us=cfg.delta_t_us(),
        max_neighbors=cfg.max_neighbors, queue_size=cfg.max_queue_size,
    )
    rel = jnp.where(events.mask[..., None], events.pos[..., :2], 0.0)
    ns = NodeSet(
        feat=jnp.concatenate([events.feat, rel], -1),
        pos=events.pos, mask=events.mask, graph=graph,
    )
    ns = layer_eval(bb["conv_block1"], sb["conv_block1"], ns, mv[0],
                    cfg.activation, cfg.node_chunk)
    acts["conv_block1"] = np.asarray(
        jnp.where(ns.mask[..., None], ns.feat, 0.0))

    outs = []
    for li, name in enumerate(["layer2", "layer3", "layer4", "layer5"]):
        g = grids[li]
        ns = pool_nodeset(
            ns, grid_ny=g[0], grid_nx=g[1], width=width, height=height,
            aggr="mean" if li == 3 else cfg.pooling_aggr,
            keep_temporal_ordering=cfg.keep_temporal_ordering,
        )
        acts[f"pool{li + 1}"] = np.asarray(ns.feat)
        rel = jnp.where(ns.mask[..., None], ns.pos[..., :2], 0.0)
        ns = ns.replace(feat=jnp.concatenate([ns.feat, rel], -1))
        ns = layer_eval(bb[name], sb[name], ns, mv[li + 1],
                        cfg.activation, cfg.node_chunk)
        acts[name] = np.asarray(ns.feat)
        if name == "layer4":
            outs.append(ns)
    outs.append(ns)

    outs = outs[-cfg.num_scales:]
    mvs = mv[-len(outs):]
    raws = []
    for k, o in enumerate(outs):
        cls_o, reg_o, obj_o = scale_head_eval(
            hd[f"scale{k + 1}"], sh[f"scale{k + 1}"], o, mvs[k],
            cfg.activation, cfg.node_chunk)
        out = jnp.concatenate([reg_o, obj_o, cls_o], -1)
        acts[f"head_scale{k + 1}"] = np.asarray(out)
        raws.append(out.reshape(out.shape[0], -1, out.shape[-1]))
    acts["raw"] = np.asarray(jnp.concatenate(raws, axis=1))
    return acts


def check_consistency(
    model_variables, events: EventBatch, cfg: DagrConfig,
    height: int, width: int, chunk: int = 1024, tol: float = 1e-3,
) -> Tuple[bool, Dict[str, float]]:
    """Run the streaming engine over one window and compare every stage
    against the sync forward.  Returns (ok, per-stage max-abs-diff).

    Mirrors the reference protocol (evaluate_flops.py:139-146): the
    window is split into (all-but-last-chunk, last chunk); the final
    streaming state must reproduce the sync activations.
    """
    from dagr_tpu.streaming.engine import StreamingDetector, chunk_events

    params = model_variables["params"]
    stats = model_variables["batch_stats"]
    sync = sync_activations(params, stats, events, cfg, height, width)

    eng = StreamingDetector(cfg, height, width, chunk=chunk,
                            count_flops=False)
    step = eng.make_step(params, stats)
    st = eng.init_state()
    pos_px = np.asarray(events.pos_px()[0])
    feat = np.asarray(events.feat[0])
    nv = int(np.asarray(events.mask[0]).sum())
    raw = None
    for c in chunk_events(pos_px[:nv], feat[:nv], eng.chunk):
        st, raw, _ = step(st, *c)

    diffs: Dict[str, float] = {}
    # event level: per-node conv_block1-layer outputs (x2 cache)
    n = min(nv, cfg.n_nodes)
    diffs["conv_block1"] = float(np.abs(
        np.asarray(st.x2)[:n] - sync["conv_block1"][0, :n]).max())
    # every dense-tail stage: pools 1-4, layers 2-5, each head scale,
    # and the concatenated raw outputs — the full hook-every-module
    # breadth of the reference harness
    # (reference: asynchronous/evaluate_flops.py:25-74,240-261)
    stream = eng.tail_activations(params, stats, st)
    for name, a in stream.items():
        ref = sync[name]
        a = np.asarray(a).reshape(ref.shape)
        diffs[name] = float(np.abs(a - ref).max())
    ok = all(v <= tol for v in diffs.values())
    return ok, diffs
