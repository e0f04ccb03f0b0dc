"""RT-DETR detection loss: Hungarian matching + focal/varifocal + L1 + GIoU.

TPU re-design of ref:ultralytics/models/utils/loss.py:13-357 (DETRLoss /
RTDETRDetectionLoss) and ops.py HungarianMatcher:

- fixed shapes throughout: ground truth is the padded (B, M) layout the
  data pipeline already emits (mask_gt marks real rows), so the whole
  loss jits once; the reference's ragged per-image lists become masked
  dense math;
- the only data-dependent step — the Hungarian assignment — runs on host
  through ``jax.pure_callback`` (scipy linear_sum_assignment over the
  (nq, M) cost matrix per image; M ~ 32 so the callback is microseconds
  and the rest of the step stays on device);
- encoder outputs are prepended as decoder "layer 0" and all layers but
  the last contribute aux losses, exactly the reference composition
  (ref:nn/tasks.py:694-699).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from xlstm_yolo_tpu.utils.loss import LossItems
from xlstm_yolo_tpu.utils.metrics import bbox_iou

f32 = jnp.float32
BIG = 1e6


def _hungarian_host(cost: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """(B, nq, M) cost + (B, M) validity -> (B, M) matched pred index."""
    from scipy.optimize import linear_sum_assignment

    B, nq, M = cost.shape
    out = np.zeros((B, M), np.int32)
    for b in range(B):
        # scipy assigns min(m, nq) rows: with more valid gts than queries
        # the overflow gts would silently keep idx 0 and be scored as
        # 'matched to query 0' (unreachable at nq=300/max_targets=128,
        # but fail loudly rather than corrupt the loss if configs change)
        assert int(valid[b].sum()) <= nq, (
            f"more valid gts ({int(valid[b].sum())}) than queries ({nq})"
        )
        c = np.nan_to_num(cost[b], nan=BIG, posinf=BIG, neginf=-BIG)
        rows, cols = linear_sum_assignment(c.T[valid[b]])  # rows into valid gts
        idx = np.zeros(M, np.int32)
        idx[np.nonzero(valid[b])[0][rows]] = cols.astype(np.int32)
        out[b] = idx
    return out


def hungarian_assign(cost: jax.Array, valid: jax.Array) -> jax.Array:
    """jit-compatible Hungarian matching via host callback."""
    B, nq, M = cost.shape
    return jax.pure_callback(
        _hungarian_host,
        jax.ShapeDtypeStruct((B, M), jnp.int32),
        cost.astype(f32), valid,
        vmap_method="sequential",
    )


def _match_cost(pred_boxes, pred_logits, gt_boxes, gt_cls, valid,
                alpha=0.25, gamma=2.0, gain_cls=2.0, gain_l1=5.0, gain_giou=2.0):
    """(B, nq, M) matcher cost (ref:models/utils/ops.py:71-110), padded
    gt columns pushed to BIG so real gts win the assignment."""
    p = jax.nn.sigmoid(pred_logits.astype(f32))  # focal-style prob
    pc = jnp.take_along_axis(
        p, gt_cls[:, None, :].astype(jnp.int32), axis=-1
    )  # (B, nq, M): prob of each gt's class
    neg = (1 - alpha) * (pc ** gamma) * (-jnp.log1p(-pc + 1e-8))
    pos = alpha * ((1 - pc) ** gamma) * (-jnp.log(pc + 1e-8))
    cost_cls = pos - neg
    l1 = jnp.abs(pred_boxes[:, :, None, :] - gt_boxes[:, None, :, :]).sum(-1)
    giou = bbox_iou(pred_boxes[:, :, None, :], gt_boxes[:, None, :, :],
                    xywh=True, kind="giou")
    giou = giou.reshape(l1.shape)
    cost = gain_cls * cost_cls + gain_l1 * l1 + gain_giou * (1.0 - giou)
    return jnp.where(valid[:, None, :], cost, BIG)


def _layer_loss(pred_boxes, pred_logits, gt_boxes, gt_cls, valid, nc,
                use_vfl=True, alpha=0.25, gamma=2.0):
    """One decoder layer's (class, bbox, giou) losses with fresh matching."""
    B, nq, _ = pred_logits.shape
    M = gt_boxes.shape[1]
    num_gts = valid.sum()

    cost = _match_cost(jax.lax.stop_gradient(pred_boxes),
                       jax.lax.stop_gradient(pred_logits),
                       gt_boxes, gt_cls, valid)
    midx = hungarian_assign(cost, valid)  # (B, M) pred index per gt row

    # targets (B, nq): matched queries carry the gt class, rest background
    onehot_m = (midx[..., None] == jnp.arange(nq)[None, None]) & valid[..., None]
    # (B, M, nq) -> per-query class target
    tgt_cls = jnp.where(
        onehot_m.any(1),
        (onehot_m.astype(jnp.int32) * (gt_cls[..., None] + 1).astype(jnp.int32)).sum(1) - 1,
        nc,
    )  # (B, nq)
    one_hot = jax.nn.one_hot(tgt_cls, nc + 1, dtype=f32)[..., :nc]

    # matched pred boxes per gt row (one-hot matmul: no gather)
    pb = jnp.einsum("bmq,bqc->bmc", onehot_m.astype(f32), pred_boxes.astype(f32))
    iou_m = bbox_iou(pb, gt_boxes, xywh=True).reshape(B, M)
    iou_m = jnp.where(valid, jax.lax.stop_gradient(iou_m), 0.0)
    gt_scores = jnp.einsum("bmq,bm->bq", onehot_m.astype(f32), iou_m)[..., None] * one_hot

    logits = pred_logits.astype(f32)
    # VFL only applies when the batch has gts; a gt-free batch falls back
    # to focal loss (parity: ref:models/utils/loss.py:78 `if num_gts and
    # self.vfl`) — both branches are computed and selected by lax.cond-
    # style where (fixed-shape program, data-dependent choice)
    bce_vfl = optax_sigmoid_bce(logits, gt_scores)
    w = alpha_vfl(logits, gt_scores, one_hot)
    loss_vfl = (bce_vfl * w).mean(1).sum()
    bce_focal = optax_sigmoid_bce(logits, one_hot)
    pprob = jax.nn.sigmoid(logits)
    p_t = one_hot * pprob + (1 - one_hot) * (1 - pprob)
    mod = (1.0 - p_t) ** 1.5
    af = one_hot * 0.25 + (1 - one_hot) * 0.75
    loss_focal = (bce_focal * mod * af).mean(1).sum()
    loss_cls = jnp.where(use_vfl & (num_gts > 0), loss_vfl, loss_focal)
    loss_cls = loss_cls / (jnp.maximum(num_gts, 1) / nq)

    l1 = (jnp.abs(pb - gt_boxes).sum(-1) * valid).sum() / jnp.maximum(num_gts, 1)
    giou = bbox_iou(pb, gt_boxes, xywh=True, kind="giou").reshape(B, M)
    loss_giou = (((1.0 - giou) * valid).sum()) / jnp.maximum(num_gts, 1)
    return loss_cls * 1.0, l1 * 5.0, loss_giou * 2.0


def optax_sigmoid_bce(logits, labels):
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def alpha_vfl(logits, gt_score, label, alpha=0.75, gamma=2.0):
    """Varifocal weighting (ref:utils/loss.py:28-36)."""
    p = jax.nn.sigmoid(logits)
    return alpha * (p ** gamma) * (1 - label) + gt_score * label


def rtdetr_detection_loss(out: dict, gt_cls, gt_bboxes_xyxy, mask_gt,
                          img_size: int, nc: int = 80, use_vfl: bool = True):
    """Total RT-DETR loss over (enc + decoder layers) outputs.

    ``out``: the RTDETRDecoder training dict; gt boxes in xyxy pixels
    (converted here to normalized cxcywh, the decoder's box space).
    Returns (total, LossItems(box=giou, cls=class, dfl=bbox-l1)) with the
    reference's headline triple (ref:nn/tasks.py:700-703).
    """
    xyxy = gt_bboxes_xyxy.astype(f32) / float(img_size)
    cxy = (xyxy[..., :2] + xyxy[..., 2:]) / 2
    wh = jnp.maximum(xyxy[..., 2:] - xyxy[..., :2], 1e-6)
    gt_boxes = jnp.concatenate([cxy, wh], -1)
    valid = mask_gt.astype(bool)
    gt_cls = jnp.where(valid, gt_cls, 0).astype(jnp.int32)

    boxes = jnp.concatenate([out["enc_bboxes"][None], out["dec_bboxes"]], 0)
    scores = jnp.concatenate([out["enc_scores"][None], out["dec_scores"]], 0)
    L = boxes.shape[0]
    tot_c = tot_b = tot_g = 0.0
    for li in range(L):
        c, b, g = _layer_loss(boxes[li], scores[li], gt_boxes, gt_cls, valid,
                              nc, use_vfl=use_vfl)
        tot_c = tot_c + c
        tot_b = tot_b + b
        tot_g = tot_g + g

    # denoising branch: fixed matching (group g positive slot j <-> gt j),
    # negatives are background (the contrastive part). ref:loss.py:298-331.
    if "dn_bboxes" in out:
        G = int(out["dn_groups"])
        for li in range(out["dn_bboxes"].shape[0]):
            c, b, g = _dn_layer_loss(out["dn_bboxes"][li], out["dn_scores"][li],
                                     gt_boxes, gt_cls, valid, nc, G,
                                     use_vfl=use_vfl)
            tot_c = tot_c + c
            tot_b = tot_b + b
            tot_g = tot_g + g

    total = tot_c + tot_b + tot_g
    return total, LossItems(box=tot_g, cls=tot_c, dfl=tot_b)


def _dn_layer_loss(pred_boxes, pred_logits, gt_boxes, gt_cls, valid, nc, G,
                   use_vfl=True):
    """Denoising-layer loss with the KNOWN assignment: reshaped to
    (B, G, 2, M, .), slot [:, :, 0, j] is gt j's positive query."""
    B, num_dn, _ = pred_logits.shape
    M = gt_boxes.shape[1]
    pb = pred_boxes.reshape(B, G, 2, M, 4)
    ps = pred_logits.reshape(B, G, 2, M, nc).astype(f32)
    num_gts = valid.sum() * G

    gt_b = jnp.broadcast_to(gt_boxes[:, None], (B, G, M, 4))
    pos_b = pb[:, :, 0]
    iou = bbox_iou(jax.lax.stop_gradient(pos_b), gt_b, xywh=True).reshape(B, G, M)
    iou = jnp.where(valid[:, None], iou, 0.0)

    # class targets: positives carry gt class (valid), everything else bg
    one_hot_pos = jax.nn.one_hot(gt_cls, nc, dtype=f32) * valid[..., None]
    one_hot = jnp.zeros((B, G, 2, M, nc), f32).at[:, :, 0].set(
        jnp.broadcast_to(one_hot_pos[:, None], (B, G, M, nc)))
    gt_scores = jnp.zeros((B, G, 2, M, nc), f32).at[:, :, 0].set(
        iou[..., None] * jnp.broadcast_to(one_hot_pos[:, None], (B, G, M, nc)))

    logits = ps.reshape(B, num_dn, nc)
    oh = one_hot.reshape(B, num_dn, nc)
    gs = gt_scores.reshape(B, num_dn, nc)
    bce = optax_sigmoid_bce(logits, gs if use_vfl else oh)
    if use_vfl:
        w = alpha_vfl(logits, gs, oh)
        loss_cls = (bce * w).mean(1).sum()
    else:
        pprob = jax.nn.sigmoid(logits)
        p_t = oh * pprob + (1 - oh) * (1 - pprob)
        loss_cls = (bce * ((1 - p_t) ** 1.5) * (oh * 0.25 + (1 - oh) * 0.75)).mean(1).sum()
    loss_cls = loss_cls / (jnp.maximum(num_gts, 1) / num_dn)

    vmask = jnp.broadcast_to(valid[:, None], (B, G, M))
    l1 = (jnp.abs(pos_b - gt_b).sum(-1) * vmask).sum() / jnp.maximum(num_gts, 1)
    giou = bbox_iou(pos_b, gt_b, xywh=True, kind="giou").reshape(B, G, M)
    loss_giou = ((1.0 - giou) * vmask).sum() / jnp.maximum(num_gts, 1)
    return loss_cls * 1.0, l1 * 5.0, loss_giou * 2.0
