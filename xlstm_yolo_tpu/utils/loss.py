"""Detection losses (BCE-cls + CIoU + DFL with TAL), fixed-shape JAX.

Re-design of ref:ultralytics/utils/loss.py:157-260 (v8DetectionLoss) and
:728-743 (E2EDetectLoss).  Targets arrive as padded per-image arrays
(gt_labels (B, M), gt_bboxes (B, M, 4) xyxy image units, mask_gt (B, M))
instead of the reference's ragged concatenated form, so the whole loss
jits with static shapes.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from xlstm_yolo_tpu.nn.head import dfl_decode
from xlstm_yolo_tpu.utils.metrics import bbox_iou
from xlstm_yolo_tpu.utils.tal import bbox2dist, dist2bbox, make_anchors, task_aligned_assign

f32 = jnp.float32


class LossItems(NamedTuple):
    box: jax.Array
    cls: jax.Array
    dfl: jax.Array


def _bce_logits(logits, targets):
    """Elementwise binary cross-entropy with logits (no reduction)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _dfl_loss(pred_dist, target, reg_max: int):
    """Distribution focal loss (parity: loss.py:65-90).

    pred_dist: (..., 4, reg_max) logits; target: (..., 4) in [0, reg_max-1).
    """
    target = jnp.clip(target, 0, reg_max - 1 - 0.01)
    tl = jnp.floor(target).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(f32) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist.astype(f32), axis=-1)
    ce_l = -jnp.take_along_axis(logp, tl[..., None], axis=-1)[..., 0]
    ce_r = -jnp.take_along_axis(logp, jnp.minimum(tr, reg_max - 1)[..., None], axis=-1)[..., 0]
    return (ce_l * wl + ce_r * wr).mean(-1)  # mean over the 4 sides


def v8_detection_loss(
    feats: Sequence[jax.Array],  # per-level (B, H, W, no) raw maps
    gt_labels: jax.Array,  # (B, M) int32
    gt_bboxes: jax.Array,  # (B, M, 4) xyxy image units
    mask_gt: jax.Array,  # (B, M) bool
    strides: Sequence[float],
    nc: int = 80,
    reg_max: int = 16,
    tal_topk: int = 10,
    box_gain: float = 7.5,
    cls_gain: float = 0.5,
    dfl_gain: float = 1.5,
):
    """One v8 detection loss over a feature pyramid.

    Returns (total_loss_scalar, LossItems) — total is already scaled by
    batch size (parity: loss.py:260 returns loss.sum() * batch_size).
    """
    B = feats[0].shape[0]
    no = nc + reg_max * 4
    flat = jnp.concatenate([f.reshape(B, -1, no) for f in feats], axis=1)  # (B, A, no)
    pred_distri, pred_scores = flat[..., : reg_max * 4], flat[..., reg_max * 4 :]

    feat_shapes = [f.shape[1:3] for f in feats]
    anchor_points, stride_t = make_anchors(feat_shapes, strides, 0.5)  # (A,2),(A,1)

    # decode boxes in feature units
    dist = dfl_decode(pred_distri, reg_max)  # (B, A, 4)
    pred_bboxes = dist2bbox(dist, anchor_points[None], xywh=False)  # (B, A, 4)

    assign = task_aligned_assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores.astype(f32))),
        jax.lax.stop_gradient(pred_bboxes * stride_t[None]),
        anchor_points * stride_t,
        gt_labels,
        gt_bboxes,
        mask_gt,
        topk=tal_topk,
        num_classes=nc,
        alpha=0.5,
        beta=6.0,
    )
    target_scores = assign.target_scores
    target_bboxes = assign.target_bboxes / stride_t[None]
    fg = assign.fg_mask  # (B, A)

    tss = jnp.maximum(target_scores.sum(), 1.0)

    # cls: BCE over all anchors/classes
    loss_cls = _bce_logits(pred_scores.astype(f32), target_scores).sum() / tss

    # box: CIoU weighted by assigned score mass, fg only (NaN-safe masking:
    # zero the metric, not the weight, so 0 * nan never appears)
    weight = target_scores.sum(-1) * fg  # (B, A)
    iou = bbox_iou(pred_bboxes, target_bboxes, xywh=False, kind="ciou")  # (B, A)
    iou = jnp.where(fg, iou, 1.0)
    loss_box = ((1.0 - iou) * weight).sum() / tss

    # dfl
    target_ltrb = bbox2dist(anchor_points[None], target_bboxes, reg_max - 1)  # (B, A, 4)
    dfl = _dfl_loss(pred_distri.reshape(B, -1, 4, reg_max), target_ltrb, reg_max)
    loss_dfl = (jnp.where(fg, dfl, 0.0) * weight).sum() / tss

    items = LossItems(loss_box * box_gain, loss_cls * cls_gain, loss_dfl * dfl_gain)
    total = (items.box + items.cls + items.dfl) * B
    return total, items


def e2e_detect_loss(
    preds: dict,
    gt_labels,
    gt_bboxes,
    mask_gt,
    strides,
    nc: int = 80,
    **kw,
):
    """one2many (topk 10) + one2one (topk 1) sum (parity: loss.py:728-743)."""
    l_m, it_m = v8_detection_loss(
        preds["one2many"], gt_labels, gt_bboxes, mask_gt, strides, nc=nc, tal_topk=10, **kw
    )
    l_o, it_o = v8_detection_loss(
        preds["one2one"], gt_labels, gt_bboxes, mask_gt, strides, nc=nc, tal_topk=1, **kw
    )
    items = LossItems(*(a + b for a, b in zip(it_m, it_o)))
    return l_m + l_o, items
