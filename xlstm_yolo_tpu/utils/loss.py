"""Detection losses (BCE-cls + CIoU + DFL with TAL), fixed-shape JAX.

Re-design of ref:ultralytics/utils/loss.py:157-260 (v8DetectionLoss) and
:728-743 (E2EDetectLoss).  Targets arrive as padded per-image arrays
(gt_labels (B, M), gt_bboxes (B, M, 4) xyxy image units, mask_gt (B, M))
instead of the reference's ragged concatenated form, so the whole loss
jits with static shapes.
"""

from __future__ import annotations

import os
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
    return_aux: bool = False,
):
    """One v8 detection loss over a feature pyramid.

    Returns (total_loss_scalar, LossItems) — total is already scaled by
    batch size (parity: loss.py:260 returns loss.sum() * batch_size).
    With ``return_aux`` additionally returns the assignment and anchor
    geometry (for the seg/pose losses that extend this one).
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
    if return_aux:
        aux = dict(assign=assign, anchor_points=anchor_points, stride_t=stride_t,
                   tss=tss, weight=weight)
        return total, items, aux
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
    """one2many (topk 10) + one2one (topk 1) sum (parity: loss.py:728-743).

    XY_E2E_BATCHED=1 routes to the stacked single-pass form (identical
    math, ~half the XLA kernel count — see _e2e_detect_loss_batched).
    """
    if os.environ.get("XY_E2E_BATCHED", "0") == "1":
        return _e2e_detect_loss_batched(
            preds, gt_labels, gt_bboxes, mask_gt, strides, nc=nc, **kw)
    l_m, it_m = v8_detection_loss(
        preds["one2many"], gt_labels, gt_bboxes, mask_gt, strides, nc=nc, tal_topk=10, **kw
    )
    l_o, it_o = v8_detection_loss(
        preds["one2one"], gt_labels, gt_bboxes, mask_gt, strides, nc=nc, tal_topk=1, **kw
    )
    items = LossItems(*(a + b for a, b in zip(it_m, it_o)))
    return l_m + l_o, items


def _e2e_detect_loss_batched(
    preds: dict,
    gt_labels,
    gt_bboxes,
    mask_gt,
    strides,
    nc: int = 80,
    reg_max: int = 16,
    box_gain: float = 7.5,
    cls_gain: float = 0.5,
    dfl_gain: float = 1.5,
):
    """e2e_detect_loss computed as ONE stacked v8 pass over (2B, ...).

    The one2many and one2one losses run identical per-sample code on the
    same gts — only the assigner's top-k (10 vs 1) and the normalizing
    sums differ.  Stacking both heads along batch halves the XLA kernel
    count of the whole loss section (the loss is fusion-count-bound, not
    FLOP-bound: scripts/exp_loss_bench.py); per-sample top-k comes from
    topk_select_mask's ``k_arr`` and the per-pass normalizations reduce
    each half separately.  Math identical to the two-pass form
    (tests/test_loss_golden.py locks equality).
    """
    feats_m, feats_o = preds["one2many"], preds["one2one"]
    B = feats_m[0].shape[0]
    feats = [jnp.concatenate([m, o], axis=0) for m, o in zip(feats_m, feats_o)]
    gl = jnp.concatenate([gt_labels, gt_labels], 0)
    gb = jnp.concatenate([gt_bboxes, gt_bboxes], 0)
    mg = jnp.concatenate([mask_gt, mask_gt], 0)
    topk_arr = jnp.concatenate(
        [jnp.full((B,), 10, jnp.int32), jnp.ones((B,), jnp.int32)])

    no = nc + reg_max * 4
    flat = jnp.concatenate([f.reshape(2 * B, -1, no) for f in feats], axis=1)
    pred_distri, pred_scores = flat[..., : reg_max * 4], flat[..., reg_max * 4:]
    feat_shapes = [f.shape[1:3] for f in feats]
    anchor_points, stride_t = make_anchors(feat_shapes, strides, 0.5)

    dist = dfl_decode(pred_distri, reg_max)
    pred_bboxes = dist2bbox(dist, anchor_points[None], xywh=False)

    assign = task_aligned_assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores.astype(f32))),
        jax.lax.stop_gradient(pred_bboxes * stride_t[None]),
        anchor_points * stride_t,
        gl, gb, mg,
        topk=10, num_classes=nc, alpha=0.5, beta=6.0, topk_arr=topk_arr,
    )
    target_scores = assign.target_scores
    target_bboxes = assign.target_bboxes / stride_t[None]
    fg = assign.fg_mask  # (2B, A)

    def half_sums(x):  # (2B, ...) elementwise loss -> (2,) per-pass sums
        return x.reshape(2, -1).sum(-1)

    tss = jnp.maximum(half_sums(target_scores), 1.0)  # (2,)

    bce = _bce_logits(pred_scores.astype(f32), target_scores)
    loss_cls = half_sums(bce) / tss

    weight = target_scores.sum(-1) * fg
    iou = bbox_iou(pred_bboxes, target_bboxes, xywh=False, kind="ciou")
    iou = jnp.where(fg, iou, 1.0)
    loss_box = half_sums((1.0 - iou) * weight) / tss

    target_ltrb = bbox2dist(anchor_points[None], target_bboxes, reg_max - 1)
    dfl = _dfl_loss(pred_distri.reshape(2 * B, -1, 4, reg_max), target_ltrb, reg_max)
    loss_dfl = half_sums(jnp.where(fg, dfl, 0.0) * weight) / tss

    items = LossItems(
        loss_box.sum() * box_gain,
        loss_cls.sum() * cls_gain,
        loss_dfl.sum() * dfl_gain,
    )
    total = (items.box + items.cls + items.dfl) * B
    return total, items


def v8_obb_loss(
    preds: dict,  # {'one2many': feats, 'angle': (B, A, 1)}
    gt_labels: jax.Array,  # (B, M) int32
    gt_rboxes: jax.Array,  # (B, M, 5) xywhr image units
    mask_gt: jax.Array,  # (B, M) bool
    strides: Sequence[float],
    nc: int = 80,
    reg_max: int = 16,
    tal_topk: int = 10,
    box_gain: float = 7.5,
    cls_gain: float = 0.5,
    dfl_gain: float = 1.5,
):
    """Oriented-box loss: probiou box term + BCE cls + DFL on the
    axis-aligned envelope (parity: ref:utils/loss.py:612-727 v8OBBLoss +
    :116-137 RotatedBboxLoss)."""
    from xlstm_yolo_tpu.utils.metrics import probiou
    from xlstm_yolo_tpu.utils.tal import dist2rbox

    feats = preds["one2many"]
    angle = preds["angle"].astype(f32)  # (B, A, ne)
    B = feats[0].shape[0]
    no = nc + reg_max * 4
    flat = jnp.concatenate([f.reshape(B, -1, no) for f in feats], axis=1)
    pred_distri, pred_scores = flat[..., : reg_max * 4], flat[..., reg_max * 4 :]

    feat_shapes = [f.shape[1:3] for f in feats]
    anchor_points, stride_t = make_anchors(feat_shapes, strides, 0.5)

    # drop degenerate rboxes (< 2px) like the reference (loss.py:661-663)
    mask_gt = mask_gt.astype(bool) & (gt_rboxes[..., 2] >= 2) & (gt_rboxes[..., 3] >= 2)

    dist = dfl_decode(pred_distri, reg_max)  # (B, A, 4) feature units
    rbox4 = dist2rbox(dist.astype(f32), angle[..., :1], anchor_points[None])  # (B, A, 4)
    pred_rboxes = jnp.concatenate([rbox4, angle[..., :1]], -1)  # (B, A, 5)

    assign_boxes = jnp.concatenate(
        [rbox4 * stride_t[None], angle[..., :1]], -1
    )  # image units for the assigner
    assign = task_aligned_assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores.astype(f32))),
        jax.lax.stop_gradient(assign_boxes),
        anchor_points * stride_t,
        gt_labels,
        gt_rboxes.astype(f32),
        mask_gt,
        topk=tal_topk,
        num_classes=nc,
        rotated=True,
    )
    target_scores = assign.target_scores
    tb = assign.target_bboxes  # (B, A, 5) image units
    target_rboxes = jnp.concatenate([tb[..., :4] / stride_t[None], tb[..., 4:]], -1)
    fg = assign.fg_mask

    tss = jnp.maximum(target_scores.sum(), 1.0)
    loss_cls = _bce_logits(pred_scores.astype(f32), target_scores).sum() / tss

    weight = target_scores.sum(-1) * fg
    iou = probiou(pred_rboxes, target_rboxes)
    iou = jnp.where(fg, iou, 1.0)
    loss_box = ((1.0 - iou) * weight).sum() / tss

    # DFL on the axis-aligned envelope of the rotated target (RotatedBboxLoss)
    cxy, wh = target_rboxes[..., :2], target_rboxes[..., 2:4]
    target_xyxy = jnp.concatenate([cxy - wh / 2, cxy + wh / 2], -1)
    target_ltrb = bbox2dist(anchor_points[None], target_xyxy, reg_max - 1)
    dfl = _dfl_loss(pred_distri.reshape(B, -1, 4, reg_max), target_ltrb, reg_max)
    loss_dfl = (jnp.where(fg, dfl, 0.0) * weight).sum() / tss

    items = LossItems(loss_box * box_gain, loss_cls * cls_gain, loss_dfl * dfl_gain)
    total = (items.box + items.cls + items.dfl) * B
    return total, items


def v8_classification_loss(logits: jax.Array, labels: jax.Array):
    """Mean softmax cross-entropy (parity: ref:utils/loss.py:601-609)."""
    logp = jax.nn.log_softmax(logits.astype(f32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    loss = nll.mean()
    return loss, loss


# OKS sigmas for the 17 COCO keypoints (parity: ref:utils/loss.py OKS_SIGMA;
# shared numpy source of truth lives in utils/metrics.py)
from xlstm_yolo_tpu.utils.metrics import OKS_SIGMA as _OKS_SIGMA_NP  # noqa: E402

OKS_SIGMA = jnp.asarray(_OKS_SIGMA_NP, f32)


def _crop_mask_loss(loss_map, xyxy):
    """Zero the per-pixel loss outside the (mask-space) gt box.

    loss_map: (..., Hm, Wm); xyxy: (..., 4).  Parity: ref utils/ops.crop_mask.
    """
    Hm, Wm = loss_map.shape[-2:]
    r = jnp.arange(Wm, dtype=f32)[None, :]
    c = jnp.arange(Hm, dtype=f32)[:, None]
    x1, y1, x2, y2 = (xyxy[..., i][..., None, None] for i in range(4))
    inside = (r >= x1) & (r < x2) & (c >= y1) & (c < y2)
    return loss_map * inside


def v8_segmentation_loss(
    preds: dict,  # {'one2many': feats, 'mask_coeffs': (B, A, nm), 'proto': (B, Hm, Wm, nm)}
    gt_labels, gt_bboxes, mask_gt,
    gt_masks,  # (B, M, Hm, Wm) float {0,1} at proto resolution
    strides, img_size: int, nc: int = 80,
    seg_k: int = 256, **kw,
):
    """v8 segmentation loss, fixed shapes (parity: ref:utils/loss.py:263-444).

    The reference computes the mask BCE only on the ragged set of
    foreground anchors; here a static top-``seg_k`` selection over
    fg-weighted anchors bounds the per-anchor mask tensor to
    (B, K, Hm, Wm) — anchors beyond K (rare: K >= topk * M in practice)
    are dropped from the mask term only.
    """
    feats = preds["one2many"]
    mc = preds["mask_coeffs"].astype(f32)
    proto = preds["proto"].astype(f32)  # (B, Hm, Wm, nm)
    B, Hm, Wm, nm = proto.shape

    total, items, aux = v8_detection_loss(
        feats, gt_labels, gt_bboxes, mask_gt, strides, nc=nc,
        return_aux=True, **kw,
    )
    assign = aux["assign"]
    fg = assign.fg_mask.astype(f32)  # (B, A)

    # static top-K foreground anchors per image
    K = min(seg_k, fg.shape[1])
    score = fg * (assign.target_scores.sum(-1) + 1e-6)
    topv, topi = jax.lax.top_k(score, K)  # (B, K)
    valid = topv > 0  # (B, K)

    mc_k = jnp.take_along_axis(mc, topi[..., None], axis=1)  # (B, K, nm)
    gt_idx = jnp.take_along_axis(assign.target_gt_idx, topi, axis=1)  # (B, K)
    tb = jnp.take_along_axis(assign.target_bboxes, topi[..., None], axis=1)  # (B, K, 4) img units

    # per-anchor gt mask + mask-space box
    gmask = jnp.take_along_axis(
        gt_masks.astype(f32), gt_idx[..., None, None], axis=1
    )  # (B, K, Hm, Wm)
    scale = jnp.asarray([Wm, Hm, Wm, Hm], f32) / img_size
    mxyxy = tb * scale
    area = jnp.maximum(
        (mxyxy[..., 2] - mxyxy[..., 0]) * (mxyxy[..., 3] - mxyxy[..., 1]), 1.0
    ) / (Hm * Wm)  # normalized area (parity: xywh prod of 0-1 boxes)

    pred_mask = jnp.einsum("bkn,bhwn->bkhw", mc_k, proto, preferred_element_type=f32)
    bce = _bce_logits(pred_mask, gmask)
    per_anchor = _crop_mask_loss(bce, mxyxy).mean((-2, -1)) / area  # (B, K)
    fg_sum = jnp.maximum(fg.sum(), 1.0)
    loss_seg = (per_anchor * valid).sum() / fg_sum

    box_gain = kw.get("box_gain", 7.5)
    total = total + loss_seg * box_gain * B
    return total, items, loss_seg * box_gain


def v8_pose_loss(
    preds: dict,  # {'one2many': feats, 'kpts': (B, A, nk)}
    gt_labels, gt_bboxes, mask_gt,
    gt_kpts,  # (B, M, K, 3) image-space keypoints (x, y, vis)
    strides, nc: int = 80,
    kpt_shape=(17, 3), pose_gain: float = 12.0, kobj_gain: float = 1.0, **kw,
):
    """v8 pose loss, fixed shapes (parity: ref:utils/loss.py:446-560).

    OKS-weighted keypoint location loss + visibility BCE over all
    anchors with the foreground mask applied (no ragged gathers).
    """
    from xlstm_yolo_tpu.nn.head import pose_decode

    feats = preds["one2many"]
    kpts = preds["kpts"]
    Knum, nd = kpt_shape

    total, items, aux = v8_detection_loss(
        feats, gt_labels, gt_bboxes, mask_gt, strides, nc=nc,
        return_aux=True, **kw,
    )
    assign = aux["assign"]
    fg = assign.fg_mask.astype(f32)  # (B, A)
    anchor_points, stride_t = aux["anchor_points"], aux["stride_t"]

    pred_kpts = pose_decode(kpts, anchor_points, stride_t, kpt_shape)  # (B, A, K, nd) image units
    gt_k = jnp.take_along_axis(
        gt_kpts.astype(f32), assign.target_gt_idx[..., None, None], axis=1
    )  # (B, A, K, 3)
    kpt_mask = (gt_k[..., 2] > 0).astype(f32)  # (B, A, K)

    area = jnp.maximum(
        (assign.target_bboxes[..., 2] - assign.target_bboxes[..., 0])
        * (assign.target_bboxes[..., 3] - assign.target_bboxes[..., 1]), 1.0
    )  # (B, A) image-unit area

    # COCO sigmas only fit the 17-kpt skeleton; other K use uniform 1/K
    # (parity: ref:models/yolo/pose/train.py sigmas selection)
    sigmas = OKS_SIGMA if Knum == 17 else jnp.full((Knum,), 1.0 / Knum, f32)
    d = ((pred_kpts[..., 0] - gt_k[..., 0]) ** 2 + (pred_kpts[..., 1] - gt_k[..., 1]) ** 2)
    e = d / ((2 * sigmas) ** 2 * (area[..., None] + 1e-9) * 2)
    n_vis = jnp.maximum(kpt_mask.sum(-1), 1e-9)
    factor = Knum / n_vis  # (B, A)
    loc = (factor[..., None] * (1.0 - jnp.exp(-e)) * kpt_mask).mean(-1)  # (B, A)
    fg_sum = jnp.maximum(fg.sum(), 1.0)
    loss_kpt = (loc * fg).sum() / fg_sum

    if nd == 3:
        vis_bce = _bce_logits(
            kpts.reshape(*kpts.shape[:2], Knum, nd)[..., 2].astype(f32), kpt_mask
        ).mean(-1)
        loss_kobj = (vis_bce * fg).sum() / fg_sum
    else:
        loss_kobj = jnp.zeros((), f32)

    B = feats[0].shape[0]
    total = total + (loss_kpt * pose_gain + loss_kobj * kobj_gain) * B
    return total, items, (loss_kpt * pose_gain, loss_kobj * kobj_gain)
