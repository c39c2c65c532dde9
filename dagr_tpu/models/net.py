"""GNN backbone: 5 spline-conv Layers over a 4-level voxel pyramid.

TPU-native equivalent of the reference Net
(reference: src/dagr/model/networks/net.py:31-190).  Differences are
representational only: ragged PyG graphs become masked node tables,
pooled levels are dense cell grids (node id == cell id), and the
events->graph step is the static-shape builder from
dagr_tpu/graph/build.py instead of the CUDA sliding-window kernels.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from dagr_tpu.config import DagrConfig
from dagr_tpu.core.types import EventBatch, EventGraph, NodeSet
from dagr_tpu.graph.build import build_graph
from dagr_tpu.models.blocks import Layer
from dagr_tpu.ops.pool import pool_nodeset


class Net(nn.Module):
    """Backbone producing ``num_scales`` pooled feature levels.

    Returns NodeSets on grids G3 (out3) and G4 (out4)
    (reference: net.py:108-190); the head reshapes them to dense
    canvases.
    """

    cfg: DagrConfig
    height: int
    width: int

    @property
    def channels(self) -> Tuple[int, ...]:
        return self.cfg.channels()

    @property
    def out_channels(self) -> Tuple[int, int]:
        c = self.channels
        return (c[-2], c[-1])

    def strides(self) -> Tuple[int, ...]:
        return self.cfg.strides(self.height)

    @nn.compact
    def __call__(
        self,
        events: EventBatch,
        image_feat: Optional[List[jnp.ndarray]] = None,
        train: bool = False,
        graph: Optional[EventGraph] = None,
    ) -> List[NodeSet]:
        cfg = self.cfg
        ch = self.channels
        mv = cfg.cartesian_max_values(self.width)
        grids = cfg.grid_shapes()          # [(ny, nx)] x 4
        chunk = cfg.node_chunk

        if graph is None:
            graph = build_graph(
                events.pos_px(), events.mask,
                width=self.width, height=self.height,
                radius=cfg.radius_px(self.width),
                delta_t_us=cfg.delta_t_us(),
                max_neighbors=cfg.max_neighbors,
                queue_size=cfg.max_queue_size,
                fast_path=getattr(cfg, "graph_fast_path", "sort"),
            )

        ns = NodeSet(
            feat=events.feat, pos=events.pos, mask=events.mask, graph=graph
        )

        def with_rel_delta(ns: NodeSet) -> NodeSet:
            # x <- [x, (x, y)]  (reference: net.py:124-125,137-138,...)
            rel = jnp.where(ns.mask[..., None], ns.pos[..., :2], 0.0)
            return ns.replace(feat=jnp.concatenate([ns.feat, rel], axis=-1))

        def sample_image(ns: NodeSet, level: int) -> NodeSet:
            if image_feat is None:
                return ns
            from dagr_tpu.models.cnn import sample_features  # lazy import
            sampled = sample_features(
                ns.pos, ns.mask, image_feat[level], self.width, self.height
            )
            return ns.replace(
                feat=jnp.concatenate([ns.feat, sampled], axis=-1)
            )

        img_ch = 0 if image_feat is None else [f.shape[-1] for f in image_feat]

        def in_ch(level):
            base = ch[level]
            if image_feat is not None:
                base += img_ch[level]
            return base + 2

        pool_kw = dict(
            width=self.width, height=self.height,
            keep_temporal_ordering=cfg.keep_temporal_ordering,
        )

        ns = sample_image(ns, 0)
        ns = with_rel_delta(ns)
        ns = Layer(in_ch(0), ch[1], mv[0], cfg.activation,
                   cfg.kernel_size, chunk, name="conv_block1")(ns, train)

        ns = sample_image(ns, 1)
        ns = pool_nodeset(ns, grid_ny=grids[0][0], grid_nx=grids[0][1],
                          aggr=cfg.pooling_aggr, **pool_kw)
        ns = with_rel_delta(ns)
        ns = Layer(in_ch(1), ch[2], mv[1], cfg.activation,
                   cfg.kernel_size, chunk, name="layer2")(ns, train)

        ns = sample_image(ns, 2)
        ns = pool_nodeset(ns, grid_ny=grids[1][0], grid_nx=grids[1][1],
                          aggr=cfg.pooling_aggr, **pool_kw)
        ns = with_rel_delta(ns)
        ns = Layer(in_ch(2), ch[3], mv[2], cfg.activation,
                   cfg.kernel_size, chunk, name="layer3")(ns, train)

        ns = sample_image(ns, 3)
        ns = pool_nodeset(ns, grid_ny=grids[2][0], grid_nx=grids[2][1],
                          aggr=cfg.pooling_aggr, **pool_kw)
        ns = with_rel_delta(ns)
        ns = Layer(in_ch(3), ch[4], mv[3], cfg.activation,
                   cfg.kernel_size, chunk, name="layer4")(ns, train)

        out3 = ns

        ns = sample_image(ns, 4)
        # pool4 always uses mean aggregation (reference: net.py:97)
        ns = pool_nodeset(ns, grid_ny=grids[3][0], grid_nx=grids[3][1],
                          aggr="mean", **pool_kw)
        ns = with_rel_delta(ns)
        ns = Layer(in_ch(4), ch[5], mv[4], cfg.activation,
                   cfg.kernel_size, chunk, name="layer5")(ns, train)

        out4 = ns
        return [out3, out4][-cfg.num_scales:]
