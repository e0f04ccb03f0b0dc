"""Detect / v10Detect heads with on-device DFL decode + topk postprocess.

Re-design of ref:ultralytics/nn/modules/head.py:181-333,779-812 in NHWC.
The v10 (end2end) path needs no NMS: its one2one branch is trained with
topk=1 assignment, so inference is a pure top-k/gather — trivially
XLA-friendly (the reference's ``postprocess`` at head.py:311 is already
gather-only).  Anchors and strides are recomputed from static feature
shapes at trace time: no buffers, no ``self.shape`` caching.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from xlstm_yolo_tpu.nn.blocks import ConvBNAct
from xlstm_yolo_tpu.utils.tal import dist2bbox, make_anchors

f32 = jnp.float32


def dfl_decode(dist: jax.Array, reg_max: int = 16) -> jax.Array:
    """Distribution-focal decode: softmax over bins -> expectation.

    Parity: the DFL conv module (ref:nn/modules/block.py:189-208) — a
    frozen conv whose weights are arange(reg_max), i.e. an expectation.
    ``dist``: (B, A, 4*reg_max) -> (B, A, 4).
    """
    B, A, _ = dist.shape
    x = dist.reshape(B, A, 4, reg_max)
    p = jax.nn.softmax(x.astype(f32), axis=-1)
    return (p @ jnp.arange(reg_max, dtype=f32)).astype(dist.dtype)


def topk_postprocess(preds: jax.Array, max_det: int, nc: int = 80) -> jax.Array:
    """(B, A, 4+nc) -> (B, max_det, 6) [xyxy, score, cls] via two top-ks.

    Parity: head.py:311-333 (NMS-free v10 postprocess).
    """
    B, A, _ = preds.shape
    boxes, scores = preds[..., :4], preds[..., 4:]
    k = min(max_det, A)
    best = scores.max(-1)  # (B, A)
    _, idx = jax.lax.top_k(best, k)  # (B, k)
    boxes = jnp.take_along_axis(boxes, idx[..., None], axis=1)  # (B, k, 4)
    scores = jnp.take_along_axis(scores, idx[..., None], axis=1)  # (B, k, nc)
    flat_scores, flat_idx = jax.lax.top_k(scores.reshape(B, -1), k)  # (B, k)
    anchor_idx = flat_idx // nc
    cls_idx = flat_idx % nc
    boxes = jnp.take_along_axis(boxes, anchor_idx[..., None], axis=1)
    return jnp.concatenate(
        [boxes, flat_scores[..., None], cls_idx[..., None].astype(boxes.dtype)], axis=-1
    )


def topk_postprocess_sorted(preds: jax.Array, max_det: int, nc: int = 80) -> jax.Array:
    """Gather-free twin of :func:`topk_postprocess` built on lax.sort.

    Same two-stage top-k semantics (head.py:311-333), but selection is a
    multi-operand descending sort + static slice, so the compiled program
    contains NO gather ops.  This matters on the current TPU runtime:
    co-compiling Pallas custom calls with the top-k gathers faults the
    worker (docs/KNOWN_ISSUES.md), while the sort lowering is safe — it
    is what lets the Pallas chunkwise kernel run fused with the decode.
    """
    B, A, _ = preds.shape
    boxes, scores = preds[..., :4], preds[..., 4:]
    k = min(max_det, A)
    best = scores.max(-1).astype(f32)  # (B, A)

    # stage 1: top-k anchors by best-class score (sort, keep first k)
    ops = [-best] + [boxes[..., i].astype(f32) for i in range(4)] + [
        scores[..., j].astype(f32) for j in range(scores.shape[-1])
    ]
    sorted_ops = jax.lax.sort(ops, dimension=-1, num_keys=1)
    boxes_k = jnp.stack([o[:, :k] for o in sorted_ops[1:5]], -1)  # (B, k, 4)
    scores_k = jnp.stack([o[:, :k] for o in sorted_ops[5:]], -1)  # (B, k, nc)

    # stage 2: top-k over the flattened (k*nc) class scores
    flat = -scores_k.reshape(B, k * nc)
    cls_ids = jnp.broadcast_to(jnp.arange(nc, dtype=f32), (B, k, nc)).reshape(B, -1)
    box_cols = [
        jnp.broadcast_to(boxes_k[..., i : i + 1], (B, k, nc)).reshape(B, -1)
        for i in range(4)
    ]
    s2 = jax.lax.sort([flat, cls_ids, *box_cols], dimension=-1, num_keys=1)
    out_scores = -s2[0][:, :k]
    out_cls = s2[1][:, :k]
    out_boxes = jnp.stack([c[:, :k] for c in s2[2:]], -1)
    return jnp.concatenate(
        [out_boxes, out_scores[..., None], out_cls[..., None]], axis=-1
    ).astype(preds.dtype)


def topk_postprocess_matmul(preds: jax.Array, max_det: int, nc: int = 80) -> jax.Array:
    """Gather-free twin of :func:`topk_postprocess` for the TPU runtime.

    Same two-stage v10 top-k semantics (head.py:311-333), but row
    selection is a one-hot matmul on the MXU instead of
    ``take_along_axis`` (which lowers to gather — co-compiling gathers
    with Pallas custom calls faults the current TPU runtime, see
    docs/KNOWN_ISSUES.md).  ``lax.top_k`` itself lowers to a 2-operand
    variadic sort + slice, which is safe; this shape also compiles and
    runs far faster than an 85-operand payload sort
    (:func:`topk_postprocess_sorted`).
    """
    B, A, _ = preds.shape
    boxes, scores = preds[..., :4], preds[..., 4:]
    k = min(max_det, A)
    best = scores.max(-1)  # (B, A)

    # stage 1: top-k anchors; fetch their rows with a one-hot matmul
    _, idx = jax.lax.top_k(best, k)  # sort-lowered, no gather
    onehot = (idx[..., None] == jnp.arange(A)[None, None]).astype(preds.dtype)
    rows = jnp.einsum("bka,bac->bkc", onehot, preds)  # (B, k, 4+nc) on the MXU
    boxes_k, scores_k = rows[..., :4], rows[..., 4:]

    # stage 2: top-k over the flattened (k*nc) class scores
    out_scores, flat_idx = jax.lax.top_k(scores_k.reshape(B, k * nc), k)
    anchor_idx = flat_idx // nc
    cls_idx = (flat_idx % nc).astype(preds.dtype)
    oh2 = (anchor_idx[..., None] == jnp.arange(k)[None, None]).astype(preds.dtype)
    out_boxes = jnp.einsum("bkj,bjc->bkc", oh2, boxes_k)  # (B, k, 4)
    return jnp.concatenate(
        [out_boxes, out_scores[..., None], cls_idx[..., None]], axis=-1
    )


class Detect(nn.Module):
    """YOLO detect head (DFL box branch + cls branch), NHWC.

    Parity: head.py:181-333.  ``end2end`` adds the detached one2one
    branch; strides derive from ``img_size`` / feature size at trace
    time.  Training returns raw per-level maps; inference returns
    decoded predictions.
    """

    nc: int = 80
    ch: Sequence[int] = ()
    reg_max: int = 16
    end2end: bool = False
    max_det: int = 300
    legacy: bool = False
    training: bool = False
    img_size: int = 640  # nominal size used only for cls bias init
    dtype: Any = None
    # skip the final top-k/gather stage so it can run as a separate tiny
    # program (workaround: that stage co-compiled with Pallas custom
    # calls faults the TPU runtime at batch>1 — docs/KNOWN_ISSUES.md)
    decode_only: bool = False
    # gather-free sort-based postprocess: required when the program also
    # contains Pallas custom calls (see topk_postprocess_sorted)
    sort_postprocess: bool = False
    fused: bool = False  # tower convs carry folded-BN biases (eval only)

    @property
    def no(self):
        return self.nc + self.reg_max * 4

    def _branches(self, feats, strides, suffix: str):
        """Run box (cv2) + cls (cv3) towers on each level, concat channels."""
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        outs = []
        for i, x in enumerate(feats):
            box = ConvBNAct(c2, 3, training=self.training, fused=self.fused, dtype=self.dtype, name=f"cv2{suffix}_{i}_0")(x)
            box = ConvBNAct(c2, 3, training=self.training, fused=self.fused, dtype=self.dtype, name=f"cv2{suffix}_{i}_1")(box)
            box = nn.Conv(
                4 * self.reg_max, (1, 1),
                bias_init=nn.initializers.constant(1.0),
                dtype=self.dtype,
                name=f"cv2{suffix}_{i}_2",
            )(box)

            cin = x.shape[-1]
            if self.legacy:
                cls = ConvBNAct(c3, 3, training=self.training, fused=self.fused, dtype=self.dtype, name=f"cv3{suffix}_{i}_0")(x)
                cls = ConvBNAct(c3, 3, training=self.training, fused=self.fused, dtype=self.dtype, name=f"cv3{suffix}_{i}_1")(cls)
            else:
                # light depthwise cls tower (head.py:208-218 / v10 at :805)
                cls = ConvBNAct(cin, 3, g=cin, training=self.training, fused=self.fused, dtype=self.dtype, name=f"cv3{suffix}_{i}_0_0")(x)
                cls = ConvBNAct(c3, 1, training=self.training, fused=self.fused, dtype=self.dtype, name=f"cv3{suffix}_{i}_0_1")(cls)
                cls = ConvBNAct(c3, 3, g=c3, training=self.training, fused=self.fused, dtype=self.dtype, name=f"cv3{suffix}_{i}_1_0")(cls)
                cls = ConvBNAct(c3, 1, training=self.training, fused=self.fused, dtype=self.dtype, name=f"cv3{suffix}_{i}_1_1")(cls)
            # cls bias: log(5 / nc / (img/stride)^2)  (head.py:294-308)
            s = strides[i]
            bias_val = math.log(5 / self.nc / (self.img_size / s) ** 2)
            cls = nn.Conv(
                self.nc, (1, 1),
                bias_init=nn.initializers.constant(bias_val),
                dtype=self.dtype,
                name=f"cv3{suffix}_{i}_2",
            )(cls)
            outs.append(jnp.concatenate([box, cls], axis=-1))
        return outs

    def _decode(self, level_maps, strides):
        """Per-level (B, H, W, no) -> (B, A, 4+nc) with DFL + dist2bbox."""
        B = level_maps[0].shape[0]
        feat_shapes = [m.shape[1:3] for m in level_maps]
        anchors, stride_t = make_anchors(feat_shapes, strides, 0.5)  # (A,2),(A,1)
        flat = jnp.concatenate(
            [m.reshape(B, -1, self.no) for m in level_maps], axis=1
        )  # (B, A, no)
        box, cls = flat[..., : self.reg_max * 4], flat[..., self.reg_max * 4 :]
        dist = dfl_decode(box, self.reg_max)  # (B, A, 4)
        xywh = not self.end2end
        dbox = dist2bbox(dist, anchors[None], xywh=xywh) * stride_t[None, ..., 0:1]
        return jnp.concatenate([dbox, jax.nn.sigmoid(cls.astype(f32)).astype(dbox.dtype)], -1)

    @nn.compact
    def __call__(self, feats: list, img_hw: tuple[int, int] | None = None):
        ih = img_hw[0] if img_hw else self.img_size
        strides = tuple(ih / x.shape[1] for x in feats)

        if self.end2end:
            feats_detached = [jax.lax.stop_gradient(x) for x in feats]
            one2one = self._branches(feats_detached, strides, suffix="_o2o")
            one2many = self._branches(feats, strides, suffix="")
            if self.training:
                return {"one2many": one2many, "one2one": one2one}
            y = self._decode(one2one, strides)
            if not self.decode_only:
                post = topk_postprocess_matmul if self.sort_postprocess else topk_postprocess
                y = post(y, self.max_det, self.nc)
            return y, {"one2many": one2many, "one2one": one2one}

        one2many = self._branches(feats, strides, suffix="")
        if self.training:
            return one2many
        y = self._decode(one2many, strides)
        return y, one2many


class v10Detect(Detect):
    """End2end detect head used by the shipped configs (head.py:779-812).

    Structurally the cls tower equals the non-legacy Detect tower
    (DWConv == grouped Conv at equal in/out channels), so only the
    end2end flag differs here.
    """

    end2end: bool = True


class Proto(nn.Module):
    """Mask prototype net (parity: ref:nn/modules/block.py:211-228):
    Conv -> 2x ConvTranspose upsample -> Conv -> 1x1 to nm masks.  NHWC."""

    npr: int = 256
    nm: int = 32
    training: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = ConvBNAct(self.npr, 3, training=self.training, dtype=self.dtype, name="cv1")(x)
        y = nn.ConvTranspose(self.npr, (2, 2), strides=(2, 2), name="upsample")(y)
        y = ConvBNAct(self.npr, 3, training=self.training, dtype=self.dtype, name="cv2")(y)
        return ConvBNAct(self.nm, 1, training=self.training, dtype=self.dtype, name="cv3")(y)


class Segment(Detect):
    """Segmentation head (parity: ref:nn/modules/head.py:336-359).

    Adds a prototype net on the highest-resolution level and a mask-
    coefficient tower per level.  Training returns
    (det_maps, mask_coeffs (B, A, nm), proto (B, Hm, Wm, nm)); eval
    returns (decoded_with_coeffs (B, A, 4+nc+nm), aux).
    """

    nm: int = 32
    npr: int = 256

    def _mask_coeffs(self, feats):
        c4 = max(self.ch[0] // 4, self.nm)
        outs = []
        for i, x in enumerate(feats):
            mc = ConvBNAct(c4, 3, training=self.training, fused=self.fused,
                           dtype=self.dtype, name=f"cv4_{i}_0")(x)
            mc = ConvBNAct(c4, 3, training=self.training, fused=self.fused,
                           dtype=self.dtype, name=f"cv4_{i}_1")(mc)
            mc = nn.Conv(self.nm, (1, 1), dtype=self.dtype, name=f"cv4_{i}_2")(mc)
            outs.append(mc.reshape(mc.shape[0], -1, self.nm))
        return jnp.concatenate(outs, axis=1)  # (B, A, nm)

    @nn.compact
    def __call__(self, feats: list, img_hw: tuple[int, int] | None = None):
        ih = img_hw[0] if img_hw else self.img_size
        strides = tuple(ih / x.shape[1] for x in feats)
        proto = Proto(npr=self.npr, nm=self.nm, training=self.training,
                      dtype=self.dtype, name="proto")(feats[0])
        mc = self._mask_coeffs(feats)
        one2many = self._branches(feats, strides, suffix="")
        if self.training:
            return {"one2many": one2many, "mask_coeffs": mc, "proto": proto}
        y = self._decode(one2many, strides)
        return jnp.concatenate([y, mc.astype(y.dtype)], axis=-1), {
            "one2many": one2many, "mask_coeffs": mc, "proto": proto,
        }


class OBB(Detect):
    """Oriented-box head (parity: ref:nn/modules/head.py:361-388).

    Adds an angle tower per level; the angle maps through
    ``(sigmoid - 0.25) * pi`` into [-pi/4, 3pi/4] and the box decode is
    dist2rbox (center displaced along the rotated frame).  Training
    returns {'one2many': maps, 'angle': (B, A, ne)}; eval returns
    ((B, A, 4+nc+ne) [xywhr-decoded boxes, cls probs, angle], aux).
    """

    ne: int = 1  # extra (angle) channels

    def _angle_tower(self, feats):
        c4 = max(self.ch[0] // 4, self.ne)
        outs = []
        for i, x in enumerate(feats):
            a = ConvBNAct(c4, 3, training=self.training, fused=self.fused,
                          dtype=self.dtype, name=f"cv4_{i}_0")(x)
            a = ConvBNAct(c4, 3, training=self.training, fused=self.fused,
                          dtype=self.dtype, name=f"cv4_{i}_1")(a)
            a = nn.Conv(self.ne, (1, 1), dtype=self.dtype, name=f"cv4_{i}_2")(a)
            outs.append(a.reshape(a.shape[0], -1, self.ne))
        return jnp.concatenate(outs, axis=1)  # (B, A, ne)

    def _decode_rotated(self, level_maps, strides, angle):
        from xlstm_yolo_tpu.utils.tal import dist2rbox

        B = level_maps[0].shape[0]
        feat_shapes = [m.shape[1:3] for m in level_maps]
        anchors, stride_t = make_anchors(feat_shapes, strides, 0.5)
        flat = jnp.concatenate([m.reshape(B, -1, self.no) for m in level_maps], axis=1)
        box, cls = flat[..., : self.reg_max * 4], flat[..., self.reg_max * 4 :]
        dist = dfl_decode(box, self.reg_max)
        rbox = dist2rbox(dist.astype(f32), angle.astype(f32), anchors[None]) * stride_t[None, ..., 0:1]
        return jnp.concatenate(
            [rbox.astype(flat.dtype), jax.nn.sigmoid(cls.astype(f32)).astype(flat.dtype)], -1
        )

    @nn.compact
    def __call__(self, feats: list, img_hw: tuple[int, int] | None = None):
        ih = img_hw[0] if img_hw else self.img_size
        strides = tuple(ih / x.shape[1] for x in feats)
        raw_angle = self._angle_tower(feats)
        angle = (jax.nn.sigmoid(raw_angle.astype(f32)) - 0.25) * math.pi
        one2many = self._branches(feats, strides, suffix="")
        if self.training:
            return {"one2many": one2many, "angle": angle}
        y = self._decode_rotated(one2many, strides, angle)
        return jnp.concatenate([y, angle.astype(y.dtype)], axis=-1), {
            "one2many": one2many, "angle": angle,
        }


class Pose(Detect):
    """Pose head (parity: ref:nn/modules/head.py:391-440).

    Keypoint tower per level; decode: xy = kpt[..., :2] * 2 + anchor - 0.5,
    scaled by stride; visibility sigmoid on dim 3.  Training returns
    (det_maps, raw kpts (B, A, nk)); eval returns decoded concat.
    """

    kpt_shape: tuple[int, int] = (17, 3)

    def _kpt_tower(self, feats):
        nk = self.kpt_shape[0] * self.kpt_shape[1]
        c4 = max(self.ch[0] // 4, nk)
        outs = []
        for i, x in enumerate(feats):
            k = ConvBNAct(c4, 3, training=self.training, fused=self.fused,
                          dtype=self.dtype, name=f"cv4_{i}_0")(x)
            k = ConvBNAct(c4, 3, training=self.training, fused=self.fused,
                          dtype=self.dtype, name=f"cv4_{i}_1")(k)
            k = nn.Conv(nk, (1, 1), dtype=self.dtype, name=f"cv4_{i}_2")(k)
            outs.append(k.reshape(k.shape[0], -1, nk))
        return jnp.concatenate(outs, axis=1)  # (B, A, nk)

    @nn.compact
    def __call__(self, feats: list, img_hw: tuple[int, int] | None = None):
        ih = img_hw[0] if img_hw else self.img_size
        strides = tuple(ih / x.shape[1] for x in feats)
        kpts = self._kpt_tower(feats)
        one2many = self._branches(feats, strides, suffix="")
        if self.training:
            return {"one2many": one2many, "kpts": kpts}
        y = self._decode(one2many, strides)
        feat_shapes = [m.shape[1:3] for m in feats]
        anchors, stride_t = make_anchors(feat_shapes, strides, 0.5)
        dec = pose_decode(kpts, anchors, stride_t, self.kpt_shape)
        B = y.shape[0]
        return jnp.concatenate([y, dec.reshape(B, dec.shape[1], -1).astype(y.dtype)], -1), {
            "one2many": one2many, "kpts": kpts,
        }


class Classify(nn.Module):
    """Classification head: conv -> global avg pool -> linear
    (parity: ref:nn/modules/head.py:443-466).  Training returns logits;
    eval returns (softmax probs, logits)."""

    c2: int = 1000
    k: int = 1
    s: int = 1
    training: bool = False
    dtype: Any = None
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x):
        if isinstance(x, (list, tuple)):
            x = jnp.concatenate(list(x), axis=-1)
        c_ = 1280  # efficientnet_b0 width, as in the reference
        y = ConvBNAct(c_, self.k, s=self.s, training=self.training,
                      dtype=self.dtype, name="conv")(x)
        y = y.mean(axis=(1, 2))  # NHWC global average pool
        y = nn.Dropout(self.dropout, deterministic=not self.training)(y)
        logits = nn.Dense(self.c2, name="linear")(y.astype(f32))
        if self.training:
            return logits
        return jax.nn.softmax(logits, axis=-1), logits


def pose_decode(kpts, anchors, stride_t, kpt_shape):
    """(B, A, nk) raw -> (B, A, K, ndim) image-space keypoints
    (parity: ref:head.py kpts_decode)."""
    B, A, _ = kpts.shape
    K, nd = kpt_shape
    k = kpts.reshape(B, A, K, nd).astype(f32)
    xy = (k[..., :2] * 2.0 + (anchors[None, :, None, :] - 0.5)) * stride_t[None, :, None, :]
    if nd == 3:
        return jnp.concatenate([xy, jax.nn.sigmoid(k[..., 2:3])], axis=-1)
    return xy


class RTDETRDecoder(nn.Module):
    """Real-Time DETR decoder head (ref:ultralytics/nn/modules/head.py:522-752).

    Flow: project each level to ``hd`` channels -> flatten+concat ->
    encoder head scores -> top-``nq`` query selection (anchors + content)
    -> deformable decoder with iterative sigmoid-space box refinement.
    Inference returns (B, nq, 4+nc) with normalized cxcywh boxes and
    sigmoid scores; training returns the per-layer decoder outputs
    (denoising-group training is handled by the RTDETR task plugin).
    """

    nc: int = 80
    ch: Sequence[int] = ()
    hd: int = 256         # hidden dim
    nq: int = 300         # queries
    ndp: int = 4          # decoder sampling points
    nh: int = 8           # attention heads
    ndl: int = 6          # decoder layers
    d_ffn: int = 1024
    eval_idx: int = -1
    learnt_init_query: bool = False
    training: bool = False
    img_size: int = 640   # unused (boxes are normalized); kept for head API
    dtype: Any = None
    fused: bool = False

    def _anchors(self, shapes, grid_size=0.05, eps=1e-2):
        """Logit-space grid anchors + validity mask (ref:head.py:651-669)."""
        anchors = []
        for i, (h, w) in enumerate(shapes):
            gy, gx = jnp.meshgrid(jnp.arange(h, dtype=f32), jnp.arange(w, dtype=f32),
                                  indexing="ij")
            xy = (jnp.stack([gx, gy], -1) + 0.5) / jnp.asarray([w, h], f32)
            wh = jnp.full((h, w, 2), grid_size * (2.0 ** i), f32)
            anchors.append(jnp.concatenate([xy, wh], -1).reshape(h * w, 4))
        a = jnp.concatenate(anchors, 0)[None]  # (1, V, 4)
        valid = ((a > eps) & (a < 1 - eps)).all(-1, keepdims=True)
        a = jnp.log(a / (1 - a))
        return jnp.where(valid, a, jnp.inf), valid

    # contrastive denoising training (CDN) params (ref:head.py:591-595)
    num_denoising: int = 100
    label_noise_ratio: float = 0.5
    box_noise_scale: float = 1.0

    @nn.compact
    def __call__(self, feats: list, img_hw=None, targets=None):
        from xlstm_yolo_tpu.nn.transformer import (
            MLP, DeformableTransformerDecoderLayer, inverse_sigmoid,
        )

        B = feats[0].shape[0]
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        nl = len(feats)

        # input projection (1x1 conv + BN, ref:head.py:583) and flatten
        proj = []
        for i, f in enumerate(feats):
            y = ConvBNAct(self.hd, 1, act=None, training=self.training,
                          fused=self.fused, dtype=self.dtype,
                          name=f"input_proj_{i}")(f)
            proj.append(y.reshape(B, -1, self.hd))
        feats_flat = jnp.concatenate(proj, 1)  # (B, V, hd)

        anchors, valid = self._anchors(shapes)
        feats_enc = nn.Dense(self.hd, dtype=self.dtype, name="enc_output_fc")(
            jnp.where(valid, feats_flat.astype(f32), 0.0).astype(feats_flat.dtype))
        feats_enc = nn.LayerNorm(name="enc_output_norm")(feats_enc).astype(feats_flat.dtype)

        cls_bias = float(-math.log((1 - 0.01) / 0.01) / 80 * self.nc)
        enc_scores = nn.Dense(
            self.nc, bias_init=nn.initializers.constant(cls_bias),
            dtype=self.dtype, name="enc_score_head",
        )(feats_enc)  # (B, V, nc)

        # top-nq query selection (gathers are fine here: no Pallas co-compiled)
        best = enc_scores.max(-1).astype(f32)  # (B, V)
        _, topk_ind = jax.lax.top_k(best, self.nq)
        top_feats = jnp.take_along_axis(feats_enc, topk_ind[..., None], axis=1)
        top_anchors = jnp.take_along_axis(
            jnp.broadcast_to(anchors, (B, anchors.shape[1], 4)),
            topk_ind[..., None], axis=1)

        refer_bbox = MLP(self.hd, 4, num_layers=3, dtype=self.dtype,
                         name="enc_bbox_head")(top_feats).astype(f32) + top_anchors
        enc_bboxes = jax.nn.sigmoid(refer_bbox)
        enc_sel_scores = jnp.take_along_axis(enc_scores, topk_ind[..., None], axis=1)

        if self.learnt_init_query:
            tgt = self.param("tgt_embed", nn.initializers.xavier_uniform(),
                             (self.nq, self.hd), f32)
            embed = jnp.broadcast_to(tgt[None], (B, self.nq, self.hd)).astype(feats_enc.dtype)
        else:
            embed = top_feats
        if self.training:
            refer_bbox = jax.lax.stop_gradient(refer_bbox)
            if not self.learnt_init_query:
                embed = jax.lax.stop_gradient(embed)

        # --- contrastive denoising group (on-device, fixed shapes) ---------
        # Re-design of ref:models/utils/ops.py:get_cdn_group: the padded
        # (B, M) gt layout makes every shape static, so the whole group
        # (noised labels/boxes, class embeddings, attention mask) is built
        # inside the jitted graph — no host-side ragged assembly.  Group
        # layout is the canonical DINO interleaving: group g = [M positives |
        # M negatives] at offset 2*M*g (the reference's mask pairs adjacent
        # repetition blocks instead — a quirk we deliberately do not copy).
        dn_class_embed = self.param(
            "denoising_class_embed", nn.initializers.normal(1.0),
            (self.nc, self.hd), f32)
        num_dn, G, attn_mask = 0, 0, None
        use_dn = self.training and targets is not None and self.num_denoising > 0
        if use_dn:
            gt_cls_t, gt_box_t, valid_t = targets
            M = gt_box_t.shape[1]
            G = max(1, self.num_denoising // M)
            num_dn = 2 * G * M
            r1, r2, r3, r4 = jax.random.split(self.make_rng("dn"), 4)
            cls_rep = jnp.broadcast_to(gt_cls_t[:, None, None, :], (B, G, 2, M))
            box_rep = jnp.broadcast_to(
                gt_box_t[:, None, None, :, :], (B, G, 2, M, 4)).astype(f32)
            val_rep = jnp.broadcast_to(valid_t[:, None, None, :], (B, G, 2, M))
            # label noise: flip to a random class with p = ratio/2 (ref)
            flip = jax.random.uniform(r1, (B, G, 2, M)) < (self.label_noise_ratio * 0.5)
            rand_lab = jax.random.randint(r2, (B, G, 2, M), 0, self.nc)
            dn_cls = jnp.where(flip, rand_lab, cls_rep).astype(jnp.int32)
            # box noise in xyxy space; negatives pushed a full box outside
            xyc, whc = box_rep[..., :2], box_rep[..., 2:]
            xyxy = jnp.concatenate([xyc - whc / 2, xyc + whc / 2], -1)
            diff = jnp.tile(whc * 0.5, (1, 1, 1, 1, 2)) * self.box_noise_scale
            sign = jax.random.randint(r3, xyxy.shape, 0, 2).astype(f32) * 2.0 - 1.0
            part = jax.random.uniform(r4, xyxy.shape)
            part = part.at[:, :, 1].add(1.0)
            xyxy = jnp.clip(xyxy + sign * part * diff, 0.0, 1.0)
            nxy = (xyxy[..., :2] + xyxy[..., 2:]) / 2
            nwh = jnp.maximum(xyxy[..., 2:] - xyxy[..., :2], 1e-6)
            dn_box = inverse_sigmoid(jnp.concatenate([nxy, nwh], -1), eps=1e-6)
            emb = jax.nn.one_hot(dn_cls, self.nc, dtype=f32) @ dn_class_embed
            emb = jnp.where(val_rep[..., None], emb, 0.0)
            dn_box = jnp.where(val_rep[..., None], dn_box, 0.0)
            embed = jnp.concatenate(
                [emb.reshape(B, num_dn, self.hd).astype(embed.dtype), embed], 1)
            refer_bbox = jnp.concatenate(
                [dn_box.reshape(B, num_dn, 4), refer_bbox], 1)
            # attention mask (True = may attend): queries blind to dn; each
            # dn group sees only itself (plus the match queries)
            gid = jnp.repeat(jnp.arange(G), 2 * M)
            allow = jnp.ones((num_dn + self.nq, num_dn + self.nq), bool)
            allow = allow.at[:num_dn, :num_dn].set(gid[:, None] == gid[None, :])
            allow = allow.at[num_dn:, :num_dn].set(False)
            attn_mask = allow[None, None]  # (1, heads-bcast, T, T)

        # deformable decoder w/ iterative refinement (ref:transformer.py:389-440)
        refer = jax.nn.sigmoid(refer_bbox)
        dec_bboxes, dec_scores = [], []
        last_refined = None
        eval_idx = self.eval_idx if self.eval_idx >= 0 else self.ndl + self.eval_idx
        out = embed
        # query_pos_head is shared across layers (one module, re-applied)
        qph = MLP(2 * self.hd, self.hd, num_layers=2, dtype=self.dtype,
                  name="query_pos_head")
        for i in range(self.ndl):
            qpos = qph(refer.astype(out.dtype))
            out = DeformableTransformerDecoderLayer(
                d_model=self.hd, n_heads=self.nh, d_ffn=self.d_ffn,
                n_levels=nl, n_points=self.ndp, dtype=self.dtype,
                name=f"decoder_layers_{i}",
            )(out, refer, feats_flat, shapes, attn_mask=attn_mask,
              query_pos=qpos)
            bbox = MLP(self.hd, 4, num_layers=3, dtype=self.dtype,
                       name=f"dec_bbox_head_{i}")(out).astype(f32)
            refined = jax.nn.sigmoid(bbox + inverse_sigmoid(refer))
            if self.training:
                dec_scores.append(nn.Dense(
                    self.nc, bias_init=nn.initializers.constant(cls_bias),
                    dtype=self.dtype, name=f"dec_score_head_{i}")(out))
                dec_bboxes.append(
                    refined if i == 0
                    else jax.nn.sigmoid(bbox + inverse_sigmoid(last_refined)))
                last_refined = refined
                refer = jax.lax.stop_gradient(refined)
            else:
                if i == eval_idx:
                    dec_scores.append(nn.Dense(
                        self.nc, bias_init=nn.initializers.constant(cls_bias),
                        dtype=self.dtype, name=f"dec_score_head_{i}")(out))
                    dec_bboxes.append(refined)
                    break
                last_refined = refined
                refer = refined

        db = jnp.stack(dec_bboxes)   # (ndl|1, B, num_dn+nq, 4)
        ds = jnp.stack(dec_scores)
        if self.training:
            outd = {"dec_bboxes": db[:, :, num_dn:], "dec_scores": ds[:, :, num_dn:],
                    "enc_bboxes": enc_bboxes, "enc_scores": enc_sel_scores}
            if use_dn:
                outd.update({"dn_bboxes": db[:, :, :num_dn],
                             "dn_scores": ds[:, :, :num_dn],
                             "dn_groups": G})
            return outd
        y = jnp.concatenate(
            [db[-1], jax.nn.sigmoid(ds[-1].astype(f32)).astype(db.dtype)], -1)
        return y, {"enc_bboxes": enc_bboxes, "enc_scores": enc_sel_scores}
