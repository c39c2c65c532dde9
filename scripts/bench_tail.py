"""Dense-tail component timing at serving batch (B = S streams):
level_basis / layer_eval / pool_nodeset / scale_head_eval on dummy
pooled-level data, chained honestly.  Finds where the serve step's
fixed per-chunk tail cost lives.

Run: python scripts/bench_tail.py [S]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

T = 16


def main():
    import jax
    import jax.numpy as jnp

    from dagr_tpu.config import DagrConfig
    from dagr_tpu.core.types import EventGraph, NodeSet
    from dagr_tpu.data.synthetic import random_events
    from dagr_tpu.models.dagr import DAGR
    from dagr_tpu.models.functional import layer_eval, scale_head_eval
    from dagr_tpu.ops.pool import pool_nodeset
    from dagr_tpu.ops.spline import level_basis

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = DagrConfig()
    H, W = 240, 320
    model = DAGR(cfg, height=H, width=W)
    rng = np.random.default_rng(0)
    ev = random_events(rng, 1, cfg.n_nodes, width=W, height=H, n_valid=45000)
    variables = model.init(jax.random.key(0), ev, train=False)
    bb, sb = variables["params"]["backbone"], variables["batch_stats"]["backbone"]
    hd, sh = variables["params"]["head"], variables["batch_stats"]["head"]
    grids = cfg.grid_shapes()
    mv = cfg.cartesian_max_values(W)
    ch = cfg.channels()

    probe = jax.jit(lambda x: x + 1)
    _ = np.asarray(probe(jnp.zeros((), jnp.float32)))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(probe(jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    ovh = min(ts)
    print(f"S={S} overhead {ovh*1e3:.1f} ms", flush=True)

    def make_ns(gi, cin):
        ny, nx = grids[gi]
        G = ny * nx
        feat = jnp.asarray(rng.random((S, G, cin), np.float32))
        px = (jnp.arange(G) % nx).astype(jnp.float32) / nx
        py = (jnp.arange(G) // nx).astype(jnp.float32) / ny
        pos = jnp.broadcast_to(
            jnp.stack([px, py, jnp.full((G,), 0.5)], -1)[None], (S, G, 3))
        mask = jnp.asarray(rng.random((S, G)) < 0.8)
        nbr = jnp.broadcast_to(
            jnp.zeros((G, 9), np.int32)[None], (S, G, 9)).astype(jnp.int32)
        nbr_mask = jnp.asarray(rng.random((S, G, 9)) < 0.5)
        return NodeSet(feat=feat, pos=pos, mask=mask,
                       graph=EventGraph(nbr=nbr, nbr_mask=nbr_mask),
                       tmax=jnp.zeros((S, G)), grid_hw=(ny, nx))

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        _ = jax.tree.map(np.asarray, f(jnp.float32(0), *args))
        best = np.inf
        for i in range(3):
            t0 = time.perf_counter()
            _ = jax.tree.map(np.asarray, f(jnp.float32(i + 1), *args))
            best = min(best, time.perf_counter() - t0 - ovh)
        print(f"{name}: {best/T*1e3:.3f} ms", flush=True)

    def chain(op):
        def fn(bump, ns):
            def body(c, i):
                ns2 = ns.replace(feat=jnp.where(c < -1e9, 0.0, ns.feat) + c)
                out = op(ns2)
                leaf = jax.tree.leaves(out)[0]
                return c + leaf.reshape(-1)[0], leaf.sum()
            c, s = jax.lax.scan(body, bump, jnp.arange(T))
            return s
        return fn

    ns2 = make_ns(0, ch[1] + 2)       # layer2 input: 16 + rel(2) @ G1
    ns3 = make_ns(1, ch[2] + 2)
    ns4 = make_ns(2, ch[3] + 2)
    ns5 = make_ns(3, ch[4] + 2)

    timeit("basis  L2", chain(lambda ns: level_basis(ns, max_value=mv[1])), ns2)
    timeit("layer2 (G1 2240)", chain(
        lambda ns: layer_eval(bb["layer2"], sb["layer2"], ns, mv[1],
                              cfg.activation)), ns2)
    timeit("layer3 (G2 560)", chain(
        lambda ns: layer_eval(bb["layer3"], sb["layer3"], ns, mv[2],
                              cfg.activation)), ns3)
    timeit("layer4 (G3 140)", chain(
        lambda ns: layer_eval(bb["layer4"], sb["layer4"], ns, mv[3],
                              cfg.activation)), ns4)
    timeit("layer5 (G4 35)", chain(
        lambda ns: layer_eval(bb["layer5"], sb["layer5"], ns, mv[4],
                              cfg.activation)), ns5)
    npool = make_ns(0, ch[2])
    timeit("pool1->2", chain(
        lambda ns: pool_nodeset(ns, grid_ny=grids[1][0], grid_nx=grids[1][1],
                                width=W, height=H, aggr="max")), npool)
    nhead = make_ns(2, ch[3])
    timeit("head scale1 (G3)", chain(
        lambda ns: scale_head_eval(hd["scale1"], sh["scale1"], ns, mv[3],
                                   cfg.activation)), nhead)
    nhead2 = make_ns(3, ch[4])
    timeit("head scale2 (G4)", chain(
        lambda ns: scale_head_eval(hd["scale2"], sh["scale2"], ns, mv[4],
                                   cfg.activation)), nhead2)


if __name__ == "__main__":
    main()
