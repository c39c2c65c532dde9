"""DAGR detector: GNN backbone + YOLOX-style head, with pure train/eval
entry points.

TPU-native equivalent of the reference DAGR class
(reference: src/dagr/model/networks/dagr.py:14-103, which subclasses
the external YOLOX container).  The flax module returns raw per-anchor
outputs; decoding, loss, and NMS are pure functions so the whole
train/eval step jits (and pjit-shards) end to end.

The reference's cache_luts (dagr.py:37-72) has no counterpart: our
spline basis is evaluated vectorized at trace time from positions, which
is numerically the LUT path already (the LUT is just a memoized basis,
reference: spline_conv.py:16-47).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dagr_tpu.config import DagrConfig
from dagr_tpu.core.types import EventBatch
from dagr_tpu.models.head import GNNHead, decode_outputs, make_grids_strides
from dagr_tpu.models.net import Net
from dagr_tpu.models.yolox_loss import yolox_losses
from dagr_tpu.ops.nms import postprocess

CONF_THRESHOLD = 0.001   # reference: dagr.py:16
NMS_THRESHOLD = 0.65     # reference: dagr.py:17


class DAGR(nn.Module):
    cfg: DagrConfig
    height: int
    width: int

    def setup(self):
        self.backbone = Net(self.cfg, self.height, self.width)
        n = self.cfg.num_scales
        self.head = GNNHead(
            cfg=self.cfg,
            in_channels=self.backbone.out_channels[-n:],
            strides=tuple(self.cfg.strides(self.height)),
            height=self.height,
            width=self.width,
        )
        if self.cfg.use_image:
            from dagr_tpu.models.cnn import CNNFeatures, CNNHead

            self.cnn = CNNFeatures(
                arch=self.cfg.img_net,
                feature_channels=tuple(self.cfg.channels()[1:]),
                output_channels=(256, 256),
            )
            self.cnn_head = CNNHead(
                num_classes=self.cfg.num_classes,
                width=self.cfg.yolo_stem_width,
                num_scales=self.cfg.num_scales,
            )

    def __call__(
        self,
        events: EventBatch,
        image: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        """Returns raw head outputs [B, A, 5 + num_classes] (logits);
        with image fusion, returns (hybrid_raw, image_raw)
        (reference: dagr.py:192-290 — the CNN branch's logits are added
        detached to the event branch, and reported separately so the
        image network also learns on its own)."""
        if not (self.cfg.use_image and image is not None):
            outs = self.backbone(events, train=train)
            return self.head(outs, train=train)

        feats, cnn_outputs = self.cnn(image, train=train)
        # fusion consumes DETACHED cnn activations (net.py:118,
        # dagr.py:219-223); the CNN branch learns via its own loss only
        feats_d = [jax.lax.stop_gradient(f) for f in feats]

        sizes = self.cfg.grid_shapes()[-2:][-self.cfg.num_scales:]
        resized = [
            jax.image.resize(
                o, (o.shape[0], ny, nx, o.shape[-1]), method="nearest"
            )
            for o, (ny, nx) in zip(cnn_outputs, sizes)
        ]
        cnn_outs = self.cnn_head(resized, train=train)
        cnn_outs_d = [
            tuple(jax.lax.stop_gradient(t) for t in triple)
            for triple in cnn_outs
        ]

        outs = self.backbone(events, image_feat=feats_d, train=train)
        hybrid_raw = self.head(outs, cnn_outs=cnn_outs_d, train=train)

        raws = []
        for (cls_o, reg_o, obj_o) in cnn_outs:
            B = cls_o.shape[0]
            out = jnp.concatenate([reg_o, obj_o, cls_o], axis=-1)
            raws.append(out.reshape(B, -1, out.shape[-1]))
        image_raw = jnp.concatenate(raws, axis=1)
        return hybrid_raw, image_raw


def anchor_geometry(
    cfg: DagrConfig, height: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Grid and stride tables for decode/loss
    (reference: model/utils.py:119-132)."""
    hw = list(cfg.grid_shapes()[-2:][-cfg.num_scales:])
    strides = list(cfg.strides(height))
    return make_grids_strides(hw, strides)


def detection_loss(
    raw: jnp.ndarray, targets: jnp.ndarray, cfg: DagrConfig, height: int
) -> Dict[str, jnp.ndarray]:
    grids, strides = anchor_geometry(cfg, height)
    return yolox_losses(
        raw, jnp.asarray(grids), jnp.asarray(strides), targets,
        num_classes=cfg.num_classes,
    )


def detection_loss_fusion(
    hybrid_raw: jnp.ndarray,
    image_raw: jnp.ndarray,
    targets: jnp.ndarray,      # boxes at t1 (event window end)
    targets0: jnp.ndarray,     # boxes at t0 (image timestamp)
    cfg: DagrConfig,
    height: int,
    pretrain_cnn: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Dual loss: image-only (targets0) + hybrid (targets), summed
    component-wise (reference: dagr.py:238-271)."""
    li = detection_loss(image_raw, targets0, cfg, height)
    if pretrain_cnn:
        return li
    le = detection_loss(hybrid_raw, targets, cfg, height)
    out = {k: li[k] + le[k] for k in li if k != "num_fg"}
    out["num_fg"] = li["num_fg"]
    return out


def detect(
    raw: jnp.ndarray, cfg: DagrConfig, height: int, width: int,
    conf_thresh: float = CONF_THRESHOLD, nms_thresh: float = NMS_THRESHOLD,
) -> Dict[str, jnp.ndarray]:
    """Eval path: decode + confidence filter + class-aware NMS
    (reference: dagr.py:90-103)."""
    grids, strides = anchor_geometry(cfg, height)
    dec = decode_outputs(raw, jnp.asarray(grids), jnp.asarray(strides))
    return postprocess(
        dec, num_classes=cfg.num_classes, conf_thresh=conf_thresh,
        nms_thresh=nms_thresh, height=height, width=width,
    )
