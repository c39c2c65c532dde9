"""Fixed-size detection postprocessing: confidence filter + class-aware NMS.

Native equivalent of postprocess_network_output
(reference: src/dagr/model/utils.py:61-110) and the batched-NMS
coordinate trick (model/utils.py:25-33).  torchvision's dynamic-shape
``nms`` becomes a greedy O(K^2) suppression over a fixed top-K table —
K is tiny (DAGR has 175 anchors total), so the quadratic mask is free
on TPU and everything stays jittable.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp


def iou_xyxy(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of xyxy boxes a [N, 4] vs b [M, 4]."""
    tl = jnp.maximum(a[:, None, :2], b[None, :, :2])
    br = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = jnp.prod(jnp.maximum(br - tl, 0.0), axis=-1)
    area_a = jnp.prod(jnp.maximum(a[:, 2:] - a[:, :2], 0.0), axis=-1)
    area_b = jnp.prod(jnp.maximum(b[:, 2:] - b[:, :2], 0.0), axis=-1)
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-12)


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
             iou_thresh: float) -> jnp.ndarray:
    """Greedy NMS keep-mask over score-descending order; boxes xyxy [K, 4]."""
    K = boxes.shape[0]
    order = jnp.argsort(-scores)
    b = boxes[order]
    v = valid[order]
    iou = iou_xyxy(b, b)
    sup = iou > iou_thresh

    def body(i, keep):
        # suppressed if any kept higher-scoring box overlaps
        sup_i = jnp.any(keep & sup[:, i] & (jnp.arange(K) < i))
        return keep.at[i].set(v[i] & ~sup_i)

    keep_sorted = jax.lax.fori_loop(0, K, body, jnp.zeros(K, bool))
    keep = jnp.zeros(K, bool).at[order].set(keep_sorted)
    return keep


@functools.partial(
    jax.jit,
    static_argnames=("num_classes", "conf_thresh", "nms_thresh",
                     "height", "width", "max_out"),
)
def postprocess(
    pred: jnp.ndarray,       # [B, A, 5 + C] decoded: (cx, cy, w, h, obj, cls...)
    *,
    num_classes: int,
    conf_thresh: float = 0.001,
    nms_thresh: float = 0.65,
    height: int = 480,
    width: int = 640,
    max_out: int = 300,
) -> Dict[str, jnp.ndarray]:
    """Returns fixed-size {boxes [B,K,4] xyxy, scores [B,K],
    labels [B,K], valid [B,K]} sorted by score descending
    (reference: model/utils.py:61-110)."""
    B, A, _ = pred.shape
    K = min(max_out, A)

    xy = pred[..., :2] - pred[..., 2:4] / 2.0
    boxes = jnp.concatenate([xy, xy + pred[..., 2:4]], axis=-1)  # xyxy
    cls_conf = pred[..., 5:5 + num_classes].max(axis=-1)
    labels = pred[..., 5:5 + num_classes].argmax(axis=-1)
    scores = pred[..., 4] * cls_conf
    conf_ok = scores >= conf_thresh

    def one(b_boxes, b_scores, b_labels, b_ok):
        s = jnp.where(b_ok, b_scores, -1.0)
        top_s, idx = jax.lax.top_k(s, K)
        tb, tl = b_boxes[idx], b_labels[idx]
        tv = top_s >= conf_thresh
        # class-aware NMS via coordinate offset (model/utils.py:25-33)
        off = tl.astype(tb.dtype)[:, None] * (max(width, height) + 1.0)
        keep = nms_mask(tb + off, top_s, tv, nms_thresh)
        return tb, jnp.maximum(top_s, 0.0), tl, keep

    boxes, scores, labels, valid = jax.vmap(one)(boxes, scores, labels, conf_ok)
    return {"boxes": boxes, "scores": scores, "labels": labels, "valid": valid}
