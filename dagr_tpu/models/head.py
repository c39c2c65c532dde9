"""YOLOX-style detection head on graph features.

TPU-native equivalent of GNNHead
(reference: src/dagr/model/networks/dagr.py:125-313, which subclasses
the external YOLOX repo's YOLOXHead).  Per scale: a stem ConvBlock,
cls/reg ConvBlocks, and SplineConv prediction layers whose node-table
outputs reshape for free into the dense ``B x ny x nx x C`` canvases
the reference scatters into (SplineConvToDense, spline_conv.py:110-118).

Decode follows YOLOXHead.decode_outputs (reference: dagr.py:306-312 +
model/utils.py:119-132): xy = (pred + grid) * stride, wh =
exp(pred) * stride, anchors enumerated row-major per scale then
concatenated over scales.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dagr_tpu.config import DagrConfig
from dagr_tpu.core.types import NodeSet
from dagr_tpu.models.blocks import ConvBlock, SplineConvLayer


def fused_pred(layers, ns, *, max_value, kernel_size, node_chunk,
               basis=None):
    """Run several SplineConvLayers that share the same input NodeSet as
    ONE conv over concatenated output channels (parameter trees stay
    separate; only the compute fuses)."""
    from dagr_tpu.ops.spline import nodeset_conv

    ws, rs, bs = zip(*[l.tensors() for l in layers])
    w = jnp.concatenate(ws, axis=-1)
    r = jnp.concatenate(rs, axis=-1) if rs[0] is not None else None
    b = jnp.concatenate(bs) if bs[0] is not None else None
    return nodeset_conv(
        ns, w, r, b, basis,
        max_value=max_value, kernel_size=kernel_size, node_chunk=node_chunk,
    )


def make_grids_strides(
    hw: List[Tuple[int, int]], strides: List[int]
) -> Tuple[np.ndarray, np.ndarray]:
    """Anchor grid (x, y) and stride per anchor, concatenated over
    scales (reference: model/utils.py:119-132, init_grid_and_stride)."""
    gs, ss = [], []
    for (ny, nx), s in zip(hw, strides):
        yv, xv = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
        gs.append(np.stack([xv, yv], -1).reshape(-1, 2))
        ss.append(np.full((ny * nx, 1), s))
    return (
        np.concatenate(gs).astype(np.float32),
        np.concatenate(ss).astype(np.float32),
    )


class ScaleHead(nn.Module):
    """One scale's stem/cls/reg towers (reference: dagr.py:150-163,
    process_feature at :179-190)."""

    in_channels: int
    n_reg: int
    num_classes: int
    max_value: float
    activation: str = "relu"
    kernel_size: int = 5
    node_chunk: int = 2048

    @nn.compact
    def __call__(self, ns: NodeSet, train: bool = False):
        kw = dict(
            max_value=self.max_value, activation=self.activation,
            kernel_size=self.kernel_size, node_chunk=self.node_chunk,
        )
        # all six convs of this scale share the level's conv basis
        from dagr_tpu.ops.spline import level_basis

        basis = level_basis(ns, max_value=self.max_value,
                            kernel_size=self.kernel_size)
        ns = ConvBlock(self.in_channels, self.n_reg, name="stem",
                       **kw)(ns, train, basis)
        cls_feat = ConvBlock(self.n_reg, self.n_reg, name="cls_conv",
                             **kw)(ns, train, basis)
        reg_feat = ConvBlock(self.n_reg, self.n_reg, name="reg_conv",
                             **kw)(ns, train, basis)

        pred_kw = dict(
            max_value=self.max_value, kernel_size=self.kernel_size,
            use_bias=True, node_chunk=self.node_chunk,
        )
        cls_out = SplineConvLayer(
            self.n_reg, self.num_classes, name="cls_pred", **pred_kw
        )(cls_feat, basis)
        # reg and obj preds share reg_feat: one fused conv over the
        # concatenated output channels (parameter tree unchanged)
        reg_p = SplineConvLayer(self.n_reg, 4, name="reg_pred", **pred_kw)
        obj_p = SplineConvLayer(self.n_reg, 1, name="obj_pred", **pred_kw)
        regobj = fused_pred(
            [reg_p, obj_p], reg_feat,
            max_value=self.max_value, kernel_size=self.kernel_size,
            node_chunk=self.node_chunk, basis=basis,
        )
        reg_out, obj_out = regobj[..., :4], regobj[..., 4:]

        # graph -> dense canvas (reference: spline_conv.py:80-118): invalid
        # cells contribute zeros, exactly like the reference's zeroed canvas
        ny, nx = ns.grid_hw
        B = ns.feat.shape[0]

        def canvas(x):
            return jnp.where(ns.mask[..., None], x, 0.0).reshape(B, ny, nx, -1)

        return canvas(cls_out), canvas(reg_out), canvas(obj_out)


class GNNHead(nn.Module):
    """Multi-scale head; returns flat per-anchor outputs.

    Output layout matches YOLOX: [reg(4), obj(1), cls(num_classes)] per
    anchor, anchors row-major within a scale, scales concatenated
    (reference: dagr.py:284-290).
    """

    cfg: DagrConfig
    in_channels: Tuple[int, ...]
    strides: Tuple[int, ...]
    height: int
    width: int

    @nn.compact
    def __call__(
        self,
        xin: List[NodeSet],
        cnn_outs: Optional[List[jnp.ndarray]] = None,
        train: bool = False,
    ):
        cfg = self.cfg
        n_reg = max(self.in_channels)
        mvs = cfg.cartesian_max_values(self.width)[-len(xin):]

        outs = []
        for k, ns in enumerate(xin):
            cls_o, reg_o, obj_o = ScaleHead(
                self.in_channels[k], n_reg, cfg.num_classes, mvs[k],
                cfg.activation, cfg.kernel_size, cfg.node_chunk,
                name=f"scale{k + 1}",
            )(ns, train)
            if cnn_outs is not None:
                # hybrid fusion: add detached CNN logits (dagr.py:219-223)
                cls_c, reg_c, obj_c = cnn_outs[k]
                cls_o = cls_o + jnp.asarray(cls_c)
                reg_o = reg_o + jnp.asarray(reg_c)
                obj_o = obj_o + jnp.asarray(obj_c)
            B = cls_o.shape[0]
            out = jnp.concatenate([reg_o, obj_o, cls_o], axis=-1)
            outs.append(out.reshape(B, -1, out.shape[-1]))

        raw = jnp.concatenate(outs, axis=1)       # [B, A, 5 + C]
        return raw

    def hw(self, num_scales: int) -> List[Tuple[int, int]]:
        return list(self.cfg.grid_shapes()[-2:][-num_scales:])


def decode_outputs(
    raw: jnp.ndarray, grids: jnp.ndarray, strides: jnp.ndarray,
    apply_sigmoid: bool = True,
) -> jnp.ndarray:
    """Eval-time decode (reference: dagr.py:299-312): sigmoid obj/cls,
    then xy = (xy + grid) * stride, wh = exp(wh) * stride."""
    xy = (raw[..., :2] + grids) * strides
    wh = jnp.exp(raw[..., 2:4]) * strides
    rest = raw[..., 4:]
    if apply_sigmoid:
        rest = jnp.concatenate(
            [nn.sigmoid(raw[..., 4:5]),
             nn.sigmoid(raw[..., 5:])], axis=-1
        )
    return jnp.concatenate([xy, wh, rest], axis=-1)
