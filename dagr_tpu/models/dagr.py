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

from typing import Dict, List, Optional, Tuple

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

    def __call__(
        self,
        events: EventBatch,
        image: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        """Returns raw head outputs [B, A, 5 + num_classes] (logits)."""
        image_feat = None
        cnn_outs = None
        if self.cfg.use_image and image is not None:
            image_feat, cnn_outs = self.cnn_branch(image, train)
        outs = self.backbone(events, image_feat=image_feat, train=train)
        return self.head(outs, cnn_outs=cnn_outs, train=train)

    def cnn_branch(self, image, train):
        raise NotImplementedError(
            "image fusion lands with models/cnn.py (build plan stage 5)"
        )


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
