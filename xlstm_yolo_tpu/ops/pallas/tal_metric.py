"""Pallas fused TAL metric stage: in-box mask + CIoU + score gather +
align metric + iterative top-k, one kernel over the (M, A) grid per image.

The task-aligned assigner's metric stage (utils/tal.task_aligned_assign
steps 1-3) is FLOP-trivial but costs several ms per pass in XLA: ~40
small kernels over (B, M, A) with a serialized 10-round argmax chain and
a (B, M, A, 4) deltas materialization.  Fusing the whole stage keeps
every intermediate in VMEM and collapses the chain into one launch.
Forward-only by design — the assigner runs under stop_gradient
(parity: the reference wraps it in torch.no_grad, ref:utils/loss.py:227),
so no VJP is needed.

Exactness: reproduces utils/tal's masked-dense math including argmax
tie-breaking (lowest index first, emulated as max + min-index-of-ties)
and the per-sample ``k_arr`` semantics of topk_select_mask.  The CIoU's
arctan aspect terms are separable per box and enter as precomputed
inputs, so the kernel needs no transcendentals beyond sqrt.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32
_4_PI2 = 4.0 / math.pi**2


def _interpret() -> bool:
    return jax.devices()[0].platform == "cpu"


def _kernel(k_ref, scoresT_ref, box_ref, atanp_ref, anc_ref, gt_ref, oh_ref,
            metric_ref, ov_ref, pos_ref, *, topk: int, eps: float, eps7: float):
    """Per-image block: scoresT (nc, A), box (4, A), atanp (1, A),
    anc (2, A), gt (M, 8) [x1 y1 x2 y2 atan mask . .], onehot (M, nc).
    Outputs (M, A): align metric, overlaps (both valid-masked), mask_pos."""
    ax = anc_ref[0, 0:1, :]  # (1, A)
    ay = anc_ref[0, 1:2, :]
    px1 = box_ref[0, 0:1, :]
    py1 = box_ref[0, 1:2, :]
    px2 = box_ref[0, 2:3, :]
    py2 = box_ref[0, 3:4, :]
    gx1 = gt_ref[0, :, 0:1]  # (M, 1)
    gy1 = gt_ref[0, :, 1:2]
    gx2 = gt_ref[0, :, 2:3]
    gy2 = gt_ref[0, :, 3:4]
    atan_g = gt_ref[0, :, 4:5]
    mask_gt = gt_ref[0, :, 5:6] > 0.5  # (M, 1)

    # 1) anchor centers strictly inside each gt (tal.py mask_in_gts)
    mask_in = ((ax - gx1 > eps) & (ay - gy1 > eps)
               & (gx2 - ax > eps) & (gy2 - ay > eps))  # (M, A)
    valid = mask_in & mask_gt

    # 2a) CIoU(gt, pred) — formula of utils/metrics.bbox_iou(kind="ciou")
    w1 = gx2 - gx1
    h1 = gy2 - gy1 + eps7
    w2 = px2 - px1
    h2 = py2 - py1 + eps7
    iw = jnp.maximum(jnp.minimum(gx2, px2) - jnp.maximum(gx1, px1), 0.0)
    ih = jnp.maximum(jnp.minimum(gy2, py2) - jnp.maximum(gy1, py1), 0.0)
    inter = iw * ih
    union = w1 * h1 + w2 * h2 - inter + eps7
    iou = inter / union
    cw = jnp.maximum(gx2, px2) - jnp.minimum(gx1, px1)
    ch = jnp.maximum(gy2, py2) - jnp.minimum(gy1, py1)
    c2 = cw * cw + ch * ch + eps7
    dx = px1 + px2 - gx1 - gx2
    dy = py1 + py2 - gy1 - gy2
    rho2 = (dx * dx + dy * dy) * 0.25
    dv = atanp_ref[0, 0:1, :] - atan_g
    v = _4_PI2 * (dv * dv)
    alpha_t = v / (v - iou + (1.0 + eps7))
    ciou = iou - (rho2 / c2 + v * alpha_t)
    overlaps = jnp.where(valid, jnp.maximum(ciou, 0.0), 0.0)

    # 2b) per-gt class score via one-hot matmul (gather-free)
    s_cls = jax.lax.dot_general(
        oh_ref[0], scoresT_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # (M, A)
    bbox_scores = jnp.where(valid, s_cls, 0.0)

    # alpha=0.5, beta=6.0 fixed: s^0.5 * iou^6
    ov2 = overlaps * overlaps
    align = jnp.sqrt(bbox_scores) * (ov2 * ov2 * ov2)

    # 3) top-k as masked max rounds, lowest index on ties (exactly
    # lax.top_k's / topk_select_mask's selection); per-sample k from SMEM
    # (whole (B, 1) array is resident — index the current image's row)
    k = k_ref[pl.program_id(0), 0]
    M, A = align.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (M, A), 1)
    live = align
    sel = jnp.zeros((M, A), bool)
    for r in range(topk):
        rowmax = jnp.max(live, axis=1, keepdims=True)  # (M, 1)
        cand = live == rowmax
        idx = jnp.min(jnp.where(cand, iota, A), axis=1, keepdims=True)
        oh = iota == idx
        sel = sel | (oh & (r < k))
        live = jnp.where(oh, -jnp.inf, live)

    metric_ref[0] = align
    ov_ref[0] = overlaps
    pos_ref[0] = (sel & valid).astype(f32)


def tal_metric_pallas(
    pd_scores,  # (B, A, nc) sigmoid probabilities, f32
    pd_bboxes,  # (B, A, 4) xyxy image units, f32
    anc_points,  # (A, 2) image units, f32
    gt_labels,  # (B, M) int32
    gt_bboxes,  # (B, M, 4) xyxy (padded with zeros)
    mask_gt,  # (B, M) bool
    topk: int = 10,
    num_classes: int = 80,
    eps: float = 1e-9,
    topk_arr=None,  # (B,) int32 per-sample k <= topk
):
    """(align_metric, overlaps, mask_pos) — fused steps 1-3 of
    task_aligned_assign (alpha=0.5 / beta=6.0 fixed).  mask_pos already
    includes the in-gts, gt-validity and top-k conditions."""
    B, A, nc = pd_scores.shape
    M = gt_bboxes.shape[1]
    eps7 = 1e-7  # bbox_iou's eps
    A_pad = -(-A // 128) * 128

    scoresT = jnp.swapaxes(pd_scores.astype(f32), 1, 2)  # (B, nc, A)
    boxT = jnp.swapaxes(pd_bboxes.astype(f32), 1, 2)  # (B, 4, A)
    w2 = boxT[:, 2] - boxT[:, 0]
    h2 = boxT[:, 3] - boxT[:, 1] + eps7
    atan_p = jnp.arctan(w2 / h2)[:, None, :]  # (B, 1, A)
    ancT = jnp.swapaxes(anc_points.astype(f32), 0, 1)[None]  # (1, 2, A)
    if A_pad != A:
        pad = [(0, 0), (0, 0), (0, A_pad - A)]
        scoresT = jnp.pad(scoresT, pad)
        boxT = jnp.pad(boxT, pad)
        atan_p = jnp.pad(atan_p, pad)
        # padded anchors sit far outside every box -> valid is False there
        ancT = jnp.pad(ancT, pad, constant_values=-1e6)

    gb = gt_bboxes.astype(f32)
    atan_g = jnp.arctan((gb[..., 2] - gb[..., 0])
                        / (gb[..., 3] - gb[..., 1] + eps7))
    gt_pack = jnp.concatenate(
        [gb, atan_g[..., None], mask_gt.astype(f32)[..., None],
         jnp.zeros((B, M, 2), f32)], -1)  # (B, M, 8)
    onehot = jax.nn.one_hot(
        jnp.clip(gt_labels, 0, num_classes - 1), nc, dtype=f32)  # (B, M, nc)
    if topk_arr is None:
        topk_arr = jnp.full((B,), topk, jnp.int32)
    # (B, 1): Mosaic requires the last two block dims to tile by (8, 128)
    # or span the whole array (real lowering checks this; interpret mode
    # does not) — so the SMEM block spans the full (B, 1) array and the
    # kernel indexes its image's row via program_id
    topk_arr = topk_arr.astype(jnp.int32).reshape(B, 1)

    img = lambda b: (b, 0, 0)
    metric, overlaps, pos = pl.pallas_call(
        functools.partial(_kernel, topk=topk, eps=eps, eps7=eps7),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nc, A_pad), img),
            pl.BlockSpec((1, 4, A_pad), img),
            pl.BlockSpec((1, 1, A_pad), img),
            pl.BlockSpec((1, 2, A_pad), lambda b: (0, 0, 0)),
            pl.BlockSpec((1, M, 8), img),
            pl.BlockSpec((1, M, nc), img),
        ],
        out_specs=[
            pl.BlockSpec((1, M, A_pad), img),
            pl.BlockSpec((1, M, A_pad), img),
            pl.BlockSpec((1, M, A_pad), img),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, M, A_pad), f32),
            jax.ShapeDtypeStruct((B, M, A_pad), f32),
            jax.ShapeDtypeStruct((B, M, A_pad), f32),
        ],
        interpret=_interpret(),
    )(topk_arr, scoresT, boxT, atan_p, ancT, gt_pack, onehot)
    return metric[..., :A], overlaps[..., :A], pos[..., :A] > 0.5
