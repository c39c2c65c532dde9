"""Cumulative per-stage timing of the sync forward on the real chip.
Uses the functional mirror (same code path as streaming/consistency).

Run: python scripts/bench_stages.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

T = 6


def main():
    import jax
    import jax.numpy as jnp

    from dagr_tpu.config import DagrConfig
    from dagr_tpu.core.types import NodeSet
    from dagr_tpu.data.synthetic import random_events
    from dagr_tpu.graph.build import build_graph
    from dagr_tpu.models.dagr import DAGR, detect
    from dagr_tpu.models.functional import layer_eval, scale_head_eval
    from dagr_tpu.ops.pool import pool_nodeset

    cfg = DagrConfig()
    H, W = 240, 320
    NV = 45_000
    model = DAGR(cfg, height=H, width=W)
    rng = np.random.default_rng(0)
    evs = [random_events(rng, 1, cfg.n_nodes, width=W, height=H, n_valid=NV)
           for _ in range(T)]
    stack = jax.tree.map(lambda *a: jnp.stack(a), *evs)
    variables = model.init(jax.random.key(0), evs[0], train=False)
    params, stats = variables["params"], variables["batch_stats"]
    bb, sb = params["backbone"], stats["backbone"]
    hd, sh = params["head"], stats["head"]
    mv = cfg.cartesian_max_values(W)
    grids = cfg.grid_shapes()

    def upto(stage):
        def fwd(ev):
            graph = build_graph(
                ev.pos_px(), ev.mask, width=W, height=H,
                radius=cfg.radius_px(W), delta_t_us=cfg.delta_t_us(),
                max_neighbors=cfg.max_neighbors,
                queue_size=cfg.max_queue_size)
            if stage == "build":
                return graph.nbr.sum().astype(jnp.float32)
            rel = jnp.where(ev.mask[..., None], ev.pos[..., :2], 0.0)
            ns = NodeSet(feat=jnp.concatenate([ev.feat, rel], -1),
                         pos=ev.pos, mask=ev.mask, graph=graph)
            ns = layer_eval(bb["conv_block1"], sb["conv_block1"], ns, mv[0],
                            cfg.activation, cfg.node_chunk)
            if stage == "conv_block1":
                return ns.feat.sum()
            for li, name in enumerate(["layer2", "layer3", "layer4",
                                       "layer5"]):
                g = grids[li]
                ns = pool_nodeset(
                    ns, grid_ny=g[0], grid_nx=g[1], width=W, height=H,
                    aggr="mean" if li == 3 else cfg.pooling_aggr,
                    keep_temporal_ordering=cfg.keep_temporal_ordering)
                if stage == f"pool{li + 1}":
                    return ns.feat.sum()
                rel = jnp.where(ns.mask[..., None], ns.pos[..., :2], 0.0)
                ns = ns.replace(feat=jnp.concatenate([ns.feat, rel], -1))
                ns = layer_eval(bb[name], sb[name], ns, mv[li + 1],
                                cfg.activation, cfg.node_chunk)
                if stage == name:
                    return ns.feat.sum()
                if name == "layer4":
                    out3 = ns
            raws = []
            for k, o in enumerate([out3, ns][-cfg.num_scales:]):
                cls_o, reg_o, obj_o = scale_head_eval(
                    hd[f"scale{k + 1}"], sh[f"scale{k + 1}"], o,
                    mv[-cfg.num_scales:][k], cfg.activation, cfg.node_chunk)
                raws.append(jnp.concatenate([reg_o, obj_o, cls_o], -1)
                            .reshape(1, -1, 5 + cfg.num_classes))
            raw = jnp.concatenate(raws, 1)
            if stage == "head":
                return raw.sum()
            det = detect(raw, cfg, H, W)
            return det["scores"].sum()

        def run(stack, bump):
            def step(c, ev):
                # unfoldable perturbation: ties every iteration's data to
                # the per-call bump so the runtime's replay cache can't
                # serve a previous call's result
                ev = ev.replace(feat=jnp.where(c < -1e9, 0.0, ev.feat))
                return c + fwd(ev), ()
            c, _ = jax.lax.scan(step, bump, stack)
            return c
        return jax.jit(run)

    probe = jax.jit(lambda x: x + 1)
    _ = np.asarray(probe(jnp.zeros((), jnp.float32)))
    t0 = time.perf_counter()
    _ = np.asarray(probe(jnp.ones((), jnp.float32)))
    ovh = time.perf_counter() - t0

    stages = (sys.argv[1:] or
              ["build", "conv_block1", "pool1", "layer2", "pool2", "layer3",
               "pool3", "layer4", "pool4", "layer5", "head", "detect"])
    for st in stages:
        f = upto(st)
        for i in range(2):
            _ = np.asarray(f(stack, jnp.float32(i)))
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(f(stack, jnp.float32(i + 5)))
            ts.append(time.perf_counter() - t0)
        per = (min(ts) - ovh) / T * 1e3
        print(f"{st:12s} cum {per:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
