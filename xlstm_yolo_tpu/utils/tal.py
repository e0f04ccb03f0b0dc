"""Task-aligned assignment + anchor/box geometry, fixed-shape JAX.

Re-design of ref:ultralytics/utils/tal.py:14-385 for XLA: the reference
leans on data-dependent boolean indexing (``tensor[mask]``); here every
step is a masked dense computation over the padded (B, M, A) grid so the
whole assigner jits with static shapes.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from xlstm_yolo_tpu.utils.metrics import bbox_iou

f32 = jnp.float32


def make_anchors(
    feat_shapes: Sequence[tuple[int, int]],
    strides: Sequence[float],
    grid_cell_offset: float = 0.5,
):
    """Anchor centers + per-anchor stride from feature-map shapes.

    Parity: tal.py:333-346.  Returns (A, 2) points in feature units and
    (A, 1) strides.  ``feat_shapes`` are static python ints, so this is
    constant-folded under jit.
    """
    points, stride_list = [], []
    for (h, w), s in zip(feat_shapes, strides):
        sx = jnp.arange(w, dtype=f32) + grid_cell_offset
        sy = jnp.arange(h, dtype=f32) + grid_cell_offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        points.append(jnp.stack([gx, gy], -1).reshape(-1, 2))
        stride_list.append(jnp.full((h * w, 1), s, dtype=f32))
    return jnp.concatenate(points), jnp.concatenate(stride_list)


def dist2bbox(distance, anchor_points, xywh: bool = True, axis: int = -1):
    """ltrb distances -> boxes (parity: tal.py:348-358)."""
    lt, rb = jnp.split(distance, 2, axis=axis)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c_xy = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return jnp.concatenate([c_xy, wh], axis=axis)
    return jnp.concatenate([x1y1, x2y2], axis=axis)


def bbox2dist(anchor_points, bbox, reg_max: float):
    """xyxy boxes -> clamped ltrb distances (parity: tal.py:360-364)."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    d = jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], axis=-1)
    return jnp.clip(d, 0, reg_max - 0.01)


def dist2rbox(pred_dist, pred_angle, anchor_points, axis: int = -1):
    """ltrb distances + angle -> rotated boxes (x, y, w, h) with the center
    displaced along the rotated frame (parity: tal.py:367-386 dist2rbox)."""
    lt, rb = jnp.split(pred_dist, 2, axis=axis)
    cos, sin = jnp.cos(pred_angle), jnp.sin(pred_angle)
    xf, yf = jnp.split((rb - lt) / 2, 2, axis=axis)
    x = xf * cos - yf * sin
    y = xf * sin + yf * cos
    xy = jnp.concatenate([x, y], axis=axis) + anchor_points
    return jnp.concatenate([xy, lt + rb], axis=axis)


def xywhr2xyxyxyxy(rboxes):
    """xywhr (..., 5) -> 4 corner points (..., 4, 2)
    (parity: ref:utils/ops.py xywhr2xyxyxyxy)."""
    ctr = rboxes[..., :2]
    w, h, angle = rboxes[..., 2:3], rboxes[..., 3:4], rboxes[..., 4:5]
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    vec1 = jnp.concatenate([w / 2 * cos, w / 2 * sin], -1)
    vec2 = jnp.concatenate([-h / 2 * sin, h / 2 * cos], -1)
    return jnp.stack(
        [ctr + vec1 + vec2, ctr + vec1 - vec2, ctr - vec1 - vec2, ctr - vec1 + vec2],
        axis=-2,
    )


def _candidates_in_rotated_gts(anc_points, gt_rboxes, eps: float = 1e-9):
    """(A, 2) anchor centers inside (B, M, 5) rotated gts -> (B, M, A) bool.

    Parity: tal.py:305-330 (RotatedTaskAlignedAssigner
    .select_candidates_in_gts): project the anchor onto the box's edge
    frame and test both coordinates against the edge lengths.
    """
    corners = xywhr2xyxyxyxy(gt_rboxes)  # (B, M, 4, 2)
    a, b, _, d = (corners[..., i, :] for i in range(4))
    ab = b - a  # (B, M, 2)
    ad = d - a
    ap = anc_points[None, None] - a[..., None, :]  # (B, M, A, 2)
    norm_ab = (ab * ab).sum(-1, keepdims=True)  # (B, M, 1)
    norm_ad = (ad * ad).sum(-1, keepdims=True)
    ap_ab = (ap * ab[..., None, :]).sum(-1)  # (B, M, A)
    ap_ad = (ap * ad[..., None, :]).sum(-1)
    return (ap_ab >= eps) & (ap_ab <= norm_ab) & (ap_ad >= eps) & (ap_ad <= norm_ad)


def topk_select_mask(metric: jax.Array, topk: int, k_arr=None) -> jax.Array:
    """(…, A) metric -> (…, A) bool mask of its top-``topk`` entries.

    Same selected set as ``lax.top_k`` (both are stable: value ties pick
    the lower index first) but computed as ``topk`` unrolled masked-argmax
    rounds — O(k·A) streaming passes instead of the full-A variadic sort
    TPUs lower ``top_k`` to. Selected per-round values are masked to -inf
    so indices are distinct, exactly like top_k's.

    ``k_arr`` (leading-dim ints <= topk) selects a PER-SAMPLE k: round r
    contributes to sample b only when r < k_arr[b] — e.g. the batched E2E
    loss runs top-10 for the one2many half and top-1 for the one2one half
    of one stacked call (utils/loss.e2e_detect_loss).
    """
    A = metric.shape[-1]
    live = metric.astype(f32)
    sel = jnp.zeros(metric.shape, bool)
    if k_arr is not None:
        k_arr = jnp.asarray(k_arr).reshape(
            (metric.shape[0],) + (1,) * (metric.ndim - 1))
    for r in range(topk):
        j = jnp.argmax(live, -1)
        oh = jax.nn.one_hot(j, A, dtype=bool)
        sel = sel | (oh if k_arr is None else oh & (r < k_arr))
        live = jnp.where(oh, -jnp.inf, live)
    return sel


class AssignResult(NamedTuple):
    target_labels: jax.Array  # (B, A) int32
    target_bboxes: jax.Array  # (B, A, 4)
    target_scores: jax.Array  # (B, A, nc)
    fg_mask: jax.Array  # (B, A) bool
    target_gt_idx: jax.Array  # (B, A) int32


def task_aligned_assign(
    pd_scores: jax.Array,  # (B, A, nc) sigmoid probabilities
    pd_bboxes: jax.Array,  # (B, A, 4) xyxy in image units
    anc_points: jax.Array,  # (A, 2) image units
    gt_labels: jax.Array,  # (B, M) int32 (padded)
    gt_bboxes: jax.Array,  # (B, M, 4) xyxy (padded with zeros)
    mask_gt: jax.Array,  # (B, M) bool validity of each padded gt
    topk: int = 10,
    num_classes: int = 80,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
    rotated: bool = False,
    topk_arr=None,  # (B,) per-sample k <= topk (see topk_select_mask)
) -> AssignResult:
    """Assign gts to anchors by s^alpha * IoU^beta (fixed shapes).

    Parity: tal.py:83-125 (_forward) with masked-dense semantics.  With
    ``rotated`` the boxes are (..., 5) xywhr and the overlap metric is
    probiou (parity: tal.py:298-330 RotatedTaskAlignedAssigner).
    """
    B, A, nc = pd_scores.shape
    M = gt_bboxes.shape[1]
    mask_gt = mask_gt.astype(bool)  # (B, M)

    # NOTE: a fused Pallas metric stage exists (ops/pallas/tal_metric.py,
    # TPU-parity-green) but the full-train-step A/B measured FLAT
    # (164.65 vs 164.47 ms/step median over 4 interleaved rounds,
    # scripts/exp_tal_ab.py r5; docs/KERNEL_PLATEAU.md) — the loss
    # section's cost is chain latency, not assigner-metric kernels — so
    # the jnp masked-dense path below stays the only integration.

    # 1) anchors whose center lies inside each gt box  (B, M, A)
    if rotated:
        mask_in_gts = _candidates_in_rotated_gts(anc_points, gt_bboxes, eps)
    else:
        lt = gt_bboxes[..., None, :2]  # (B, M, 1, 2)
        rb = gt_bboxes[..., None, 2:]
        deltas = jnp.concatenate(
            [anc_points[None, None] - lt, rb - anc_points[None, None]], axis=-1
        )  # (B, M, A, 4)
        mask_in_gts = deltas.min(-1) > eps  # (B, M, A)

    valid = mask_in_gts & mask_gt[..., None]  # (B, M, A)

    # 2) alignment metric
    cls_idx = jnp.clip(gt_labels, 0, nc - 1)  # (B, M)
    bbox_scores = jnp.take_along_axis(
        pd_scores.transpose(0, 2, 1),  # (B, nc, A)
        cls_idx[:, :, None],
        axis=1,
    )  # (B, M, A)
    bbox_scores = jnp.where(valid, bbox_scores, 0.0)

    if rotated:
        from xlstm_yolo_tpu.utils.metrics import probiou

        ious = probiou(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :])
    else:
        ious = bbox_iou(
            gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :], xywh=False, kind="ciou"
        )  # (B, M, A)
    overlaps = jnp.where(valid, jnp.clip(ious, 0.0, None), 0.0)

    align_metric = bbox_scores.astype(f32) ** alpha * overlaps.astype(f32) ** beta

    # 3) top-k per gt over anchors, duplicates and invalid gts removed.
    # parity: with an explicit gt-validity mask the reference does NOT
    # drop zero-metric candidates from the top-k (tal.py:176-180) — an
    # in-box anchor whose prediction has zero IoU still gets assigned.
    # topk_select_mask picks the same set as lax.top_k without lowering
    # to a full sort over A (measured TPU win; exactness-tested).
    mask_topk = topk_select_mask(align_metric, topk, topk_arr) & mask_gt[..., None]

    mask_pos = mask_topk & valid  # (B, M, A)
    return _assign_from_metric(
        align_metric, overlaps, mask_pos, gt_labels, gt_bboxes, fg_eps=eps,
        num_classes=num_classes)


def task_aligned_assign_pallas_metric(
    pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes, mask_gt,
    topk: int = 10, num_classes: int = 80, eps: float = 1e-9, topk_arr=None,
) -> AssignResult:
    """task_aligned_assign with the fused Pallas metric stage
    (ops/pallas/tal_metric.py) — exactness-tested vs the jnp path
    (tests/test_tal_kernel.py, TPU_PARITY.json) but NOT integrated in the
    train step: the full-step A/B measured flat (scripts/exp_tal_ab.py,
    docs/KERNEL_PLATEAU.md).  Kept as an explicit entry point for
    DH/shape regimes where the metric stage dominates."""
    from xlstm_yolo_tpu.ops.pallas.tal_metric import tal_metric_pallas

    align_metric, overlaps, mask_pos = tal_metric_pallas(
        pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes,
        mask_gt.astype(bool), topk=topk, num_classes=num_classes, eps=eps,
        topk_arr=topk_arr)
    return _assign_from_metric(
        align_metric, overlaps, mask_pos, gt_labels, gt_bboxes, fg_eps=eps,
        num_classes=num_classes)


def _assign_from_metric(
    align_metric, overlaps, mask_pos, gt_labels, gt_bboxes,
    fg_eps: float, num_classes: int,
) -> AssignResult:
    """Steps 4-6 of task_aligned_assign from the (B, M, A) metric stage
    (shared by the jnp path and the fused Pallas metric kernel)."""
    M = gt_bboxes.shape[1]

    # 4) resolve anchors claimed by multiple gts: keep highest IoU
    fg_count = mask_pos.sum(-2)  # (B, A)
    multi = fg_count > 1  # (B, A)
    max_iou_gt = jnp.argmax(jnp.where(mask_pos, overlaps, -1.0), axis=-2)  # (B, A)
    is_max = jax.nn.one_hot(max_iou_gt, M, dtype=bool, axis=-2)  # (B, M, A)
    mask_pos = jnp.where(multi[:, None, :], is_max & mask_pos, mask_pos)
    fg_mask = mask_pos.any(-2)  # (B, A)

    target_gt_idx = jnp.argmax(mask_pos, axis=-2)  # (B, A) — 0 where no gt

    # 5) gather targets
    tl = jnp.take_along_axis(gt_labels, target_gt_idx, axis=1)  # (B, A)
    target_labels = jnp.where(fg_mask, tl, num_classes).astype(jnp.int32)
    target_bboxes = jnp.take_along_axis(
        gt_bboxes, target_gt_idx[..., None], axis=1
    )  # (B, A, 4)

    onehot = jax.nn.one_hot(jnp.clip(tl, 0, None), num_classes, dtype=f32)
    target_scores = jnp.where(fg_mask[..., None], onehot, 0.0)  # (B, A, nc)

    # 6) normalize scores by the per-gt best alignment (tal.py:112-118)
    am = align_metric * mask_pos  # (B, M, A)
    pos_align = am.max(-1, keepdims=True)  # (B, M, 1)
    pos_iou = (overlaps * mask_pos).max(-1, keepdims=True)
    norm = ((am * pos_iou) / (pos_align + fg_eps)).max(-2)  # (B, A)
    target_scores = target_scores * norm[..., None]

    return AssignResult(target_labels, target_bboxes, target_scores, fg_mask, target_gt_idx)
