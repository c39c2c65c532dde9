"""YOLOX detection loss with SimOTA label assignment, fully jittable.

Native reimplementation of the external YOLOX repo's
``YOLOXHead.get_losses`` / ``get_assignments`` / ``simota_matching``
(the reference pins that repo and calls get_losses at
src/dagr/model/networks/dagr.py:241-282; pin:
download_and_install_dependencies.sh:13-15).

The torch original is data-dependent (boolean indexing, per-gt topk
with variable k).  Here everything is fixed-shape and masked:

* the dynamic-k selection becomes a rank test — an anchor is matched
  to a gt iff its rank in that gt's cost row is < dynamic_k(gt);
* anchors claimed by multiple gts keep only the min-cost gt;
* all reductions run over the full [G, A] matrices with validity masks.

Anchor counts are tiny for DAGR's two scales (10*14 + 5*7 = 175), so
the dense [G, A] formulation costs nothing on TPU.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp


def pairwise_iou_cxcywh(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU between boxes a [G, 4] and b [A, 4] in (cx, cy, w, h)."""
    tl = jnp.maximum(
        (a[:, None, :2] - a[:, None, 2:] / 2),
        (b[None, :, :2] - b[None, :, 2:] / 2),
    )
    br = jnp.minimum(
        (a[:, None, :2] + a[:, None, 2:] / 2),
        (b[None, :, :2] + b[None, :, 2:] / 2),
    )
    area_a = jnp.prod(a[:, 2:], axis=-1)
    area_b = jnp.prod(b[:, 2:], axis=-1)
    valid = (tl < br).all(axis=-1)
    inter = jnp.prod(br - tl, axis=-1) * valid
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-12)


def _bce_logits(logits, targets):
    """Elementwise BCEWithLogits, numerically stable."""
    neg_abs = -jnp.abs(logits)
    return (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(neg_abs))
    )


def _bce_prob(p, t, eps=1e-8):
    p = jnp.clip(p, eps, 1.0 - eps)
    return -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))


def _assign_single(
    boxes,        # [A, 4] decoded cxcywh pixels
    obj_logit,    # [A]
    cls_logit,    # [A, C]
    targets,      # [G, 5] (class, cx, cy, w, h) pixels; zero rows = padding
    centers,      # [A, 2] anchor centers in pixels
    strides_a,    # [A]
    num_classes: int,
):
    """SimOTA assignment for one image.  Returns per-anchor targets."""
    G, A = targets.shape[0], boxes.shape[0]
    gt_valid = targets.sum(axis=1) > 0                       # YOLOX: nlabel
    gt_boxes = targets[:, 1:5]
    gt_cls = targets[:, 0].astype(jnp.int32)

    # ---- geometric prefilter (YOLOX get_in_boxes_info) -------------------
    half = gt_boxes[:, None, 2:] / 2.0
    d_box = jnp.concatenate(
        [centers[None] - (gt_boxes[:, None, :2] - half),
         (gt_boxes[:, None, :2] + half) - centers[None]], axis=-1
    )
    in_box = d_box.min(axis=-1) > 0.0                        # [G, A]
    cr = 2.5 * strides_a[None, :, None]                      # center_radius
    d_ctr = jnp.concatenate(
        [centers[None] - (gt_boxes[:, None, :2] - cr),
         (gt_boxes[:, None, :2] + cr) - centers[None]], axis=-1
    )
    in_ctr = d_ctr.min(axis=-1) > 0.0
    in_box = in_box & gt_valid[:, None]
    in_ctr = in_ctr & gt_valid[:, None]
    fg_pre = (in_box | in_ctr).any(axis=0)                   # [A]
    in_both = in_box & in_ctr

    # ---- cost matrix ------------------------------------------------------
    iou = pairwise_iou_cxcywh(gt_boxes, boxes)               # [G, A]
    pair_valid = gt_valid[:, None] & fg_pre[None, :]
    iou = jnp.where(pair_valid, iou, 0.0)
    iou_cost = -jnp.log(iou + 1e-8)

    p = jnp.sqrt(
        jax.nn.sigmoid(cls_logit) * jax.nn.sigmoid(obj_logit)[:, None]
    )                                                         # [A, C]
    onehot = jax.nn.one_hot(gt_cls, num_classes)             # [G, C]
    cls_cost = _bce_prob(p[None], onehot[:, None]).sum(-1)   # [G, A]

    BIG = 1e9
    cost = cls_cost + 3.0 * iou_cost + 100000.0 * (~in_both)
    cost = jnp.where(pair_valid, cost, BIG)

    # ---- dynamic-k via rank test (simota_matching) ------------------------
    k_cand = min(10, A)
    topk_ious = jax.lax.top_k(iou, k_cand)[0]                # [G, k]
    dyn_k = jnp.clip(topk_ious.sum(axis=1).astype(jnp.int32), 1, A)

    order = jnp.argsort(cost, axis=1)                        # ascending
    ranks = jnp.argsort(order, axis=1)                       # rank of each anchor
    match = (ranks < dyn_k[:, None]) & pair_valid            # [G, A]

    # conflict resolution: anchor claimed by >1 gt keeps min-cost gt
    n_claim = match.sum(axis=0)                              # [A]
    best_gt = jnp.argmin(jnp.where(match, cost, BIG), axis=0)
    keep = jax.nn.one_hot(best_gt, G, dtype=bool).T          # [G, A]
    match = jnp.where(n_claim[None, :] > 1, match & keep, match)

    fg = match.any(axis=0)                                   # [A]
    matched_gt = jnp.argmax(match, axis=0)                   # [A]
    pred_iou = (match * iou).sum(axis=0)                     # [A]

    reg_target = gt_boxes[matched_gt]                        # [A, 4]
    cls_target = (
        jax.nn.one_hot(gt_cls[matched_gt], num_classes)
        * pred_iou[:, None]
    )
    return fg, reg_target, cls_target, gt_valid.sum()


@functools.partial(jax.jit, static_argnames=("num_classes",))
def yolox_losses(
    raw: jnp.ndarray,       # [B, A, 5 + C] head outputs (logits)
    grids: jnp.ndarray,     # [A, 2]
    strides: jnp.ndarray,   # [A, 1]
    targets: jnp.ndarray,   # [B, G, 5] (class, cx, cy, w, h) pixels
    num_classes: int,
) -> Dict[str, jnp.ndarray]:
    """Total YOLOX loss (reg_weight 5.0 * IoU + obj + cls), normalized
    by the batch-total number of foreground anchors, matching
    YOLOXHead.get_losses."""
    xy = (raw[..., :2] + grids) * strides
    wh = jnp.exp(raw[..., 2:4]) * strides
    boxes = jnp.concatenate([xy, wh], axis=-1)               # [B, A, 4]
    obj_logit = raw[..., 4]
    cls_logit = raw[..., 5:]

    centers = (grids + 0.5) * strides                        # [A, 2]
    strides_a = strides[:, 0]

    fg, reg_t, cls_t, n_gts = jax.vmap(
        lambda b, o, c, t: _assign_single(
            b, o, c, t, centers, strides_a, num_classes
        )
    )(boxes, obj_logit, cls_logit, targets)

    num_fg = jnp.maximum(fg.sum(), 1)

    # IoU loss (YOLOX IOUloss, iou_type="iou": 1 - iou^2)
    iou = jax.vmap(
        lambda a, b: jax.vmap(
            lambda x, y: pairwise_iou_cxcywh(x[None], y[None])[0, 0]
        )(a, b)
    )(boxes, reg_t)
    loss_iou = (jnp.where(fg, 1.0 - iou ** 2, 0.0)).sum() / num_fg

    loss_obj = _bce_logits(obj_logit, fg.astype(raw.dtype)).sum() / num_fg

    loss_cls = (
        _bce_logits(cls_logit, cls_t) * fg[..., None]
    ).sum() / num_fg

    reg_weight = 5.0
    total = reg_weight * loss_iou + loss_obj + loss_cls
    return {
        "total_loss": total,
        "iou_loss": reg_weight * loss_iou,
        "conf_loss": loss_obj,
        "cls_loss": loss_cls,
        "l1_loss": jnp.zeros(()),
        "num_fg": fg.sum() / jnp.maximum(n_gts.sum(), 1),
    }
