"""Box ops, letterbox inverse, on-device NMS, profiling timer.

Re-design of ref:ultralytics/utils/ops.py.  Box converters work on both
numpy and jnp arrays (same ufunc API).  NMS comes in two flavors:

- :func:`nms_jax` — fixed-shape iterative NMS under jit (the TPU
  replacement for torchvision.ops.nms, ref:utils/ops.py:312);
- :func:`non_max_suppression` — the batched postprocess wrapper with the
  end2end bypass (conf filter + truncate, ref:utils/ops.py:240-244).
"""

from __future__ import annotations

import time
from contextlib import ContextDecorator

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# converters (parity: ops.py:392-520); np/jnp polymorphic
# ---------------------------------------------------------------------------

def _xp(x):
    return jnp if isinstance(x, jax.Array) else np


def xywh2xyxy(x):
    xp = _xp(x)
    xy, wh = x[..., :2], x[..., 2:4]
    half = wh / 2
    return xp.concatenate([xy - half, xy + half, x[..., 4:]], axis=-1)


def xyxy2xywh(x):
    xp = _xp(x)
    x1y1, x2y2 = x[..., :2], x[..., 2:4]
    return xp.concatenate([(x1y1 + x2y2) / 2, x2y2 - x1y1, x[..., 4:]], axis=-1)


def xywhn2xyxy(x, w, h, padw=0, padh=0):
    xp = _xp(x)
    cx, cy, bw, bh = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return xp.stack(
        [
            w * (cx - bw / 2) + padw,
            h * (cy - bh / 2) + padh,
            w * (cx + bw / 2) + padw,
            h * (cy + bh / 2) + padh,
        ],
        axis=-1,
    )


def xyxy2xywhn(x, w, h, clip=False, eps=0.0):
    xp = _xp(x)
    if clip:
        x = clip_boxes(x, (h - eps, w - eps))
    y = xyxy2xywh(x)
    return y / xp.asarray([w, h, w, h], dtype=y.dtype)


def clip_boxes(boxes, shape):
    xp = _xp(boxes)
    h, w = shape[:2]
    return xp.stack(
        [
            xp.clip(boxes[..., 0], 0, w),
            xp.clip(boxes[..., 1], 0, h),
            xp.clip(boxes[..., 2], 0, w),
            xp.clip(boxes[..., 3], 0, h),
        ],
        axis=-1,
    )


def scale_boxes(img1_shape, boxes, img0_shape, ratio_pad=None, padding=True):
    """Rescale boxes from letterboxed img1 back to original img0.

    Parity: ops.py:92-124 (gain/pad inverse, then clip).
    """
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = (
            round((img1_shape[1] - img0_shape[1] * gain) / 2 - 0.1),
            round((img1_shape[0] - img0_shape[0] * gain) / 2 - 0.1),
        )
    else:
        gain, pad = ratio_pad[0][0], ratio_pad[1]
    xp = _xp(boxes)
    if padding:
        boxes = boxes - xp.asarray([pad[0], pad[1], pad[0], pad[1]], dtype=boxes.dtype)
    boxes = boxes / gain
    return clip_boxes(boxes, img0_shape)


def scale_coords(img1_shape, coords, img0_shape, ratio_pad=None, padding=True):
    """Rescale (..., 2+) point coordinates from letterboxed img1 back to
    original img0 (parity: ref:utils/ops.py scale_coords — keypoints).

    Only the leading two channels (x, y) are transformed; extra
    channels (visibility) pass through untouched.
    """
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = (
            round((img1_shape[1] - img0_shape[1] * gain) / 2 - 0.1),
            round((img1_shape[0] - img0_shape[0] * gain) / 2 - 0.1),
        )
    else:
        gain, pad = ratio_pad[0][0], ratio_pad[1]
    xp = _xp(coords)
    x = coords[..., 0]
    y = coords[..., 1]
    if padding:
        x = x - pad[0]
        y = y - pad[1]
    x = xp.clip(x / gain, 0, img0_shape[1])
    y = xp.clip(y / gain, 0, img0_shape[0])
    return xp.concatenate([xp.stack([x, y], axis=-1), coords[..., 2:]], axis=-1)


# ---------------------------------------------------------------------------
# masks
# ---------------------------------------------------------------------------


def crop_mask(masks, boxes):
    """Zero masks outside their (mask-space) xyxy boxes.

    masks: (n, Hm, Wm); boxes: (n, 4).  Parity: ref:utils/ops.py:659
    (crop_mask) — coordinate-grid comparison, fixed shapes, np/jnp.
    """
    xp = _xp(masks)
    Hm, Wm = masks.shape[-2:]
    r = xp.arange(Wm, dtype=masks.dtype)[None, None, :]
    c = xp.arange(Hm, dtype=masks.dtype)[None, :, None]
    x1, y1, x2, y2 = (boxes[:, i, None, None] for i in range(4))
    return masks * ((r >= x1) & (r < x2) & (c >= y1) & (c < y2))


def process_mask(proto, coeffs, boxes, img_hw):
    """Assemble binary instance masks from prototypes + coefficients.

    proto: (Hm, Wm, nm) NHWC prototype maps; coeffs: (n, nm) per-
    detection coefficients; boxes: (n, 4) xyxy in model-input pixels;
    img_hw: model input (h, w).  Returns (n, Hm, Wm) bool masks at
    prototype resolution, cropped to the boxes.

    Parity: ref:utils/ops.py:679 (process_mask) — mask logits by
    matmul, crop to the down-scaled boxes, threshold at logit 0.
    Fixed shapes throughout (n is static), so it runs under jit on
    device or on host numpy alike.
    """
    xp = _xp(proto)
    Hm, Wm, nm = proto.shape
    ih, iw = img_hw
    logits = (coeffs.astype(proto.dtype) @ proto.reshape(-1, nm).T).reshape(-1, Hm, Wm)
    scale = xp.asarray([Wm / iw, Hm / ih, Wm / iw, Hm / ih], dtype=logits.dtype)
    masks = crop_mask(logits, boxes.astype(logits.dtype) * scale)
    return masks > 0.0


# ---------------------------------------------------------------------------
# NMS
# ---------------------------------------------------------------------------


def nms_jax(boxes, scores, iou_thres: float = 0.45, max_out: int = 300):
    """Fixed-shape greedy NMS: returns (keep_idx (max_out,), keep_mask).

    Iteratively selects the top-score box and suppresses IoU > thres;
    runs entirely on device with static shapes (lax.fori_loop).
    """
    N = boxes.shape[0]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1) * (y2 - y1)

    def body(i, carry):
        scores_live, keep_idx, keep_ok = carry
        j = jnp.argmax(scores_live)
        ok = jnp.max(scores_live) > -jnp.inf
        keep_idx = keep_idx.at[i].set(jnp.where(ok, j, -1))
        keep_ok = keep_ok.at[i].set(ok)
        # gather-free row selection (one-hot reduce): dynamic gathers in a
        # program that also runs Pallas kernels hit the documented runtime
        # fault mode (docs/KNOWN_ISSUES.md) — keep NMS gather-free so it can
        # be jitted into the same program as the model.
        sel = jnp.arange(N) == j
        x1j = jnp.sum(jnp.where(sel, x1, 0.0))
        y1j = jnp.sum(jnp.where(sel, y1, 0.0))
        x2j = jnp.sum(jnp.where(sel, x2, 0.0))
        y2j = jnp.sum(jnp.where(sel, y2, 0.0))
        aj = jnp.sum(jnp.where(sel, areas, 0.0))
        xx1 = jnp.maximum(x1j, x1)
        yy1 = jnp.maximum(y1j, y1)
        xx2 = jnp.minimum(x2j, x2)
        yy2 = jnp.minimum(y2j, y2)
        inter = jnp.clip(xx2 - xx1, 0) * jnp.clip(yy2 - yy1, 0)
        iou = inter / (aj + areas - inter + 1e-7)
        suppress = (iou > iou_thres) | sel
        scores_live = jnp.where(suppress & ok, -jnp.inf, scores_live)
        return scores_live, keep_idx, keep_ok

    keep_idx = jnp.full((max_out,), -1, jnp.int32)
    keep_ok = jnp.zeros((max_out,), bool)
    _, keep_idx, keep_ok = jax.lax.fori_loop(
        0, max_out, body, (scores, keep_idx, keep_ok)
    )
    return keep_idx, keep_ok


def nms_rotated_jax(rboxes, scores, iou_thres: float = 0.45, max_out: int = 300):
    """Fixed-shape greedy NMS for rotated boxes using probiou
    (parity: ref:utils/ops.py nms_rotated / utils/metrics.py batch_probiou).

    rboxes: (N, 5) xywhr.  Returns (keep_idx (max_out,), keep_mask).
    """
    from xlstm_yolo_tpu.utils.metrics import probiou

    N = rboxes.shape[0]

    def body(i, carry):
        scores_live, keep_idx, keep_ok = carry
        j = jnp.argmax(scores_live)
        ok = jnp.max(scores_live) > -jnp.inf
        keep_idx = keep_idx.at[i].set(jnp.where(ok, j, -1))
        keep_ok = keep_ok.at[i].set(ok)
        # gather-free row selection (one-hot matmul) — see nms_jax note:
        # this jits into the same program as Pallas-kernel models (obb
        # val/predict), where dynamic gathers fault the runtime.
        sel = (jnp.arange(N) == j).astype(rboxes.dtype)
        rj = sel @ rboxes  # (5,)
        iou = probiou(rj[None], rboxes)  # (N,)
        suppress = (iou > iou_thres) | (sel > 0)
        scores_live = jnp.where(suppress & ok, -jnp.inf, scores_live)
        return scores_live, keep_idx, keep_ok

    keep_idx = jnp.full((max_out,), -1, jnp.int32)
    keep_ok = jnp.zeros((max_out,), bool)
    _, keep_idx, keep_ok = jax.lax.fori_loop(
        0, max_out, body, (scores, keep_idx, keep_ok)
    )
    return keep_idx, keep_ok


def non_max_suppression_rotated(
    preds,  # (B, A, 4+nc+1) decoded [xywh, cls probs..., angle]
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    nc: int | None = None,
):
    """Batched rotated NMS -> ((B, max_det, 7) [xywhr, conf, cls], valid).

    Parity: ref:utils/ops.py non_max_suppression(rotated=True) reduced to
    fixed shapes: best-class selection, probiou greedy suppression.
    """
    nc = nc if nc is not None else preds.shape[-1] - 5
    xywh = preds[..., :4]
    angle = preds[..., 4 + nc :][..., 0:1]
    cls_scores = preds[..., 4 : 4 + nc]
    conf = cls_scores.max(-1)
    cls = cls_scores.argmax(-1).astype(preds.dtype)
    rb = jnp.concatenate([xywh, angle], -1)  # (B, A, 5)
    masked = jnp.where(conf > conf_thres, conf, -jnp.inf)

    def per_image(r, s):
        return nms_rotated_jax(r, s, iou_thres, max_det)

    idx, ok = jax.vmap(per_image)(rb, masked)
    # gather-free row selection (one-hot matmul): jitted into the same
    # program as a Pallas-kernel backbone, take_along_axis gathers
    # recreate the documented Pallas+gather runtime fault mode
    # (docs/KNOWN_ISSUES.md) that Detect's matmul postprocess avoids.
    # The remaining per-step dynamic index inside nms_rotated_jax's
    # fori_loop touches only (A, 5)-sized operands and has not faulted.
    A = rb.shape[1]
    onehot = (jnp.clip(idx, 0, None)[..., None] == jnp.arange(A)[None, None]).astype(rb.dtype)
    cat = jnp.concatenate([rb, conf[..., None], cls[..., None]], axis=-1)
    out = jnp.einsum("bka,bac->bkc", onehot, cat)
    return out, ok


def non_max_suppression(
    preds,  # (B, A, 4+nc) decoded xywh(+cls-prob) like Detect._inference output
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    nc: int = 80,
    end2end: bool = False,
    multi_label: bool = False,
    max_wh: float = 7680.0,
    return_idx: bool = False,
):
    """Batched NMS returning fixed-shape (B, max_det, 6) + validity mask.

    end2end inputs are already (B, N, 6): conf filter + truncate only
    (parity: ops.py:240-244).  Otherwise: xywh->xyxy, best-class
    selection, class-offset batched NMS (parity: ops.py:181-330).
    ``return_idx`` additionally yields the kept anchor indices (B,
    max_det) so callers can gather per-anchor extras (mask coeffs,
    keypoints).
    """
    if end2end:
        out = preds[:, :max_det]
        valid = out[..., 4] > conf_thres
        if return_idx:
            B = preds.shape[0]
            ar = jnp.broadcast_to(jnp.arange(out.shape[1]), (B, out.shape[1]))
            return out, valid, ar
        return out, valid

    boxes = xywh2xyxy(preds[..., :4])
    cls_scores = preds[..., 4 : 4 + nc]
    conf = cls_scores.max(-1)
    cls = cls_scores.argmax(-1).astype(boxes.dtype)
    cand = conf > conf_thres

    # class-offset so boxes of different classes never suppress each other
    off_boxes = boxes + (cls * max_wh)[..., None]
    masked_scores = jnp.where(cand, conf, -jnp.inf)

    def per_image(b, s):
        keep_idx, keep_ok = nms_jax(b, s, iou_thres, max_det)
        idx = jnp.clip(keep_idx, 0, None)
        return idx, keep_ok

    idx, ok = jax.vmap(per_image)(off_boxes, masked_scores)
    # gather-free row selection (one-hot matmul), matching the rotated
    # branch above: this function jits into the same program as a
    # Pallas-kernel backbone during val, where dynamic gathers hit the
    # documented runtime fault mode (docs/KNOWN_ISSUES.md).
    A = boxes.shape[1]
    onehot = (idx[..., None] == jnp.arange(A)[None, None]).astype(boxes.dtype)
    cat = jnp.concatenate([boxes, conf[..., None], cls[..., None]], axis=-1)
    out = jnp.einsum("bka,bac->bkc", onehot, cat)
    if return_idx:
        return out, ok, idx
    return out, ok


class Profile(ContextDecorator):
    """Wall-clock profile timer with device sync (parity: ops.py:28-60)."""

    def __init__(self, t: float = 0.0):
        self.t = t
        self.dt = 0.0

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.dt = time.perf_counter() - self.start
        self.t += self.dt
        return False

    def __str__(self):
        return f"{self.t:.6f}s"
