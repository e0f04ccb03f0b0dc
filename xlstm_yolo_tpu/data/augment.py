"""Host-side image transforms (numpy/cv2) feeding fixed-shape device batches.

Re-design of ref:ultralytics/data/augment.py for a TPU input pipeline:
geometry/color work happens on host workers in numpy (cv2), always
emitting *static* shapes; the device side only normalizes.  Label
geometry is carried as padded arrays, not ragged lists.

Includes: LetterBox, Mosaic (4-grid), RandomPerspective (affine),
RandomHSV, RandomFlip, MixUp, and the v8 train pipeline assembly.
"""

from __future__ import annotations

import math
import random
from dataclasses import dataclass, field
from typing import Any

import cv2
import numpy as np


@dataclass
class LetterBox:
    """Aspect-preserving resize + gray padding (parity: augment.py:1479-1632).

    ``auto`` (stride-modulo rectangles) is intentionally defaulted OFF:
    dynamic shapes defeat XLA compilation caching — the TPU pipeline
    pads to the full square target.
    """

    new_shape: tuple[int, int] = (640, 640)
    auto: bool = False
    scale_fill: bool = False
    scaleup: bool = True
    center: bool = True
    stride: int = 32
    pad_value: int = 114

    def __call__(self, img: np.ndarray, labels: dict | None = None):
        shape = img.shape[:2]  # h, w
        new_shape = self.new_shape
        r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
        if not self.scaleup:
            r = min(r, 1.0)
        ratio = (r, r)
        new_unpad = (round(shape[1] * r), round(shape[0] * r))
        dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
        if self.auto:
            dw, dh = dw % self.stride, dh % self.stride
        elif self.scale_fill:
            dw, dh = 0, 0
            new_unpad = (new_shape[1], new_shape[0])
            ratio = (new_shape[1] / shape[1], new_shape[0] / shape[0])
        if self.center:
            dw /= 2
            dh /= 2
        if shape[::-1] != new_unpad:
            img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
        top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
        left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
        img = cv2.copyMakeBorder(
            img, top, bottom, left, right, cv2.BORDER_CONSTANT,
            value=(self.pad_value,) * 3,
        )
        if labels is None:
            return img, ratio, (left, top)
        labels = dict(labels)
        if len(labels.get("bboxes", [])):
            b = labels["bboxes"].astype(np.float32)  # xyxy pixel units
            b = b * r
            b[:, [0, 2]] += left
            b[:, [1, 3]] += top
            labels["bboxes"] = b
        labels["img"] = img
        labels["ratio_pad"] = (ratio, (left, top))
        labels["resized_shape"] = img.shape[:2]
        return labels


@dataclass
class RandomHSV:
    """LUT-based HSV jitter (parity: augment.py:1303-1383)."""

    hgain: float = 0.015
    sgain: float = 0.7
    vgain: float = 0.4

    def __call__(self, img: np.ndarray, rng: random.Random) -> np.ndarray:
        if not (self.hgain or self.sgain or self.vgain):
            return img
        r = np.array([rng.uniform(-1, 1) for _ in range(3)]) * [
            self.hgain, self.sgain, self.vgain,
        ] + 1
        hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
        x = np.arange(0, 256, dtype=r.dtype)
        lut_h = ((x * r[0]) % 180).astype(img.dtype)
        lut_s = np.clip(x * r[1], 0, 255).astype(img.dtype)
        lut_v = np.clip(x * r[2], 0, 255).astype(img.dtype)
        im_hsv = cv2.merge((cv2.LUT(hue, lut_h), cv2.LUT(sat, lut_s), cv2.LUT(val, lut_v)))
        return cv2.cvtColor(im_hsv, cv2.COLOR_HSV2BGR)


@dataclass
class RandomFlip:
    """Horizontal/vertical flip with box update (parity: augment.py:1385-1477)."""

    p: float = 0.5
    direction: str = "horizontal"

    def __call__(self, img, bboxes, rng: random.Random):
        h, w = img.shape[:2]
        if rng.random() >= self.p:
            return img, bboxes
        if self.direction == "horizontal":
            img = np.fliplr(img)
            if len(bboxes):
                bboxes = bboxes.copy()
                x1 = bboxes[:, 0].copy()
                bboxes[:, 0] = w - bboxes[:, 2]
                bboxes[:, 2] = w - x1
        else:
            img = np.flipud(img)
            if len(bboxes):
                bboxes = bboxes.copy()
                y1 = bboxes[:, 1].copy()
                bboxes[:, 1] = h - bboxes[:, 3]
                bboxes[:, 3] = h - y1
        return np.ascontiguousarray(img), bboxes


@dataclass
class RandomPerspective:
    """Affine warp (rotate/translate/scale/shear) + box transform.

    Parity: augment.py:952-1301 with candidate filtering (area/ar/wh).
    """

    degrees: float = 0.0
    translate: float = 0.1
    scale: float = 0.5
    shear: float = 0.0
    perspective: float = 0.0
    border: tuple[int, int] = (0, 0)
    pad_value: int = 114

    def __call__(self, img, bboxes, cls, rng: random.Random):
        h = img.shape[0] + self.border[0] * 2
        w = img.shape[1] + self.border[1] * 2

        C = np.eye(3)
        C[0, 2] = -img.shape[1] / 2
        C[1, 2] = -img.shape[0] / 2
        P = np.eye(3)
        P[2, 0] = rng.uniform(-self.perspective, self.perspective)
        P[2, 1] = rng.uniform(-self.perspective, self.perspective)
        R = np.eye(3)
        a = rng.uniform(-self.degrees, self.degrees)
        s = rng.uniform(1 - self.scale, 1 + self.scale)
        R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)
        S = np.eye(3)
        S[0, 1] = math.tan(rng.uniform(-self.shear, self.shear) * math.pi / 180)
        S[1, 0] = math.tan(rng.uniform(-self.shear, self.shear) * math.pi / 180)
        T = np.eye(3)
        T[0, 2] = rng.uniform(0.5 - self.translate, 0.5 + self.translate) * w
        T[1, 2] = rng.uniform(0.5 - self.translate, 0.5 + self.translate) * h
        M = T @ S @ R @ P @ C

        if (self.border[0] != 0) or (self.border[1] != 0) or (M != np.eye(3)).any():
            if self.perspective:
                img = cv2.warpPerspective(
                    img, M, dsize=(w, h), borderValue=(self.pad_value,) * 3
                )
            else:
                img = cv2.warpAffine(
                    img, M[:2], dsize=(w, h), borderValue=(self.pad_value,) * 3
                )

        n = len(bboxes)
        if n:
            xy = np.ones((n * 4, 3))
            xy[:, :2] = bboxes[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(n * 4, 2)
            xy = xy @ M.T
            xy = (xy[:, :2] / xy[:, 2:3] if self.perspective else xy[:, :2]).reshape(n, 8)
            x = xy[:, [0, 2, 4, 6]]
            y = xy[:, [1, 3, 5, 7]]
            new = np.stack([x.min(1), y.min(1), x.max(1), y.max(1)], axis=1)
            new[:, [0, 2]] = new[:, [0, 2]].clip(0, w)
            new[:, [1, 3]] = new[:, [1, 3]].clip(0, h)
            keep = _box_candidates(bboxes.T * s, new.T)
            bboxes, cls = new[keep], cls[keep]
        return img, bboxes, cls


def _box_candidates(box1, box2, wh_thr=2, ar_thr=100, area_thr=0.1, eps=1e-16):
    """Filter degenerate post-warp boxes (parity: augment.py:1264-1301)."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return (w2 > wh_thr) & (h2 > wh_thr) & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr)


class Mosaic:
    """4- or 9-image mosaic (parity: augment.py:490-705, incl. the 3x3
    ``n=9`` grid at :560)."""

    def __init__(self, dataset, imgsz: int = 640, p: float = 1.0, pad_value: int = 114,
                 n: int = 4):
        assert n in (4, 9), f"mosaic grid must be 4 or 9, got {n}"
        self.dataset = dataset
        self.imgsz = imgsz
        self.p = p
        self.pad_value = pad_value
        self.n = n

    def __call__(self, index: int, rng: random.Random):
        if self.n == 9:
            return self._mosaic9(index, rng)
        s = self.imgsz
        yc = int(rng.uniform(s // 2, 2 * s - s // 2))
        xc = int(rng.uniform(s // 2, 2 * s - s // 2))
        indices = [index] + [rng.randrange(len(self.dataset)) for _ in range(3)]
        img4 = np.full((s * 2, s * 2, 3), self.pad_value, dtype=np.uint8)
        boxes4, cls4 = [], []
        for i, idx in enumerate(indices):
            img, bboxes, cls = self.dataset.load_for_mosaic(idx, s)
            h, w = img.shape[:2]
            if i == 0:  # top-left
                x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
                x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
            elif i == 1:  # top-right
                x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
                x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
            elif i == 2:  # bottom-left
                x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
                x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
            else:  # bottom-right
                x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
                x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
            img4[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
            padw, padh = x1a - x1b, y1a - y1b
            if len(bboxes):
                b = bboxes.copy()
                b[:, [0, 2]] += padw
                b[:, [1, 3]] += padh
                boxes4.append(b)
                cls4.append(cls)
        bboxes = np.concatenate(boxes4, 0) if boxes4 else np.zeros((0, 4), np.float32)
        cls = np.concatenate(cls4, 0) if cls4 else np.zeros((0,), np.int64)
        bboxes[:, [0, 2]] = bboxes[:, [0, 2]].clip(0, 2 * s)
        bboxes[:, [1, 3]] = bboxes[:, [1, 3]].clip(0, 2 * s)
        return img4, bboxes, cls

    def _mosaic9(self, index: int, rng: random.Random):
        """3x3 grid around a center tile, cropped to (2s, 2s)
        (parity: ref:data/augment.py:560-630)."""
        s = self.imgsz
        indices = [index] + [rng.randrange(len(self.dataset)) for _ in range(8)]
        img9 = np.full((s * 3, s * 3, 3), self.pad_value, dtype=np.uint8)
        hp = wp = -1  # height/width of previous tile
        boxes9, cls9 = [], []
        for i, idx in enumerate(indices):
            img, bboxes, cls = self.dataset.load_for_mosaic(idx, s)
            h, w = img.shape[:2]
            if i == 0:  # center
                c = s, s, s + w, s + h
                h0, w0 = h, w
            elif i == 1:  # top
                c = s, s - h, s + w, s
            elif i == 2:  # top right
                c = s + wp, s - h, s + wp + w, s
            elif i == 3:  # right
                c = s + w0, s, s + w0 + w, s + h
            elif i == 4:  # bottom right
                c = s + w0, s + hp, s + w0 + w, s + hp + h
            elif i == 5:  # bottom
                c = s + w0 - w, s + h0, s + w0, s + h0 + h
            elif i == 6:  # bottom left
                c = s + w0 - wp - w, s + h0, s + w0 - wp, s + h0 + h
            elif i == 7:  # left
                c = s - w, s + h0 - h, s, s + h0
            else:  # top left
                c = s - w, s + h0 - hp - h, s, s + h0 - hp
            padw, padh = c[:2]
            x1, y1, x2, y2 = (max(x, 0) for x in c)
            img9[y1:y2, x1:x2] = img[y1 - padh :, x1 - padw :][: y2 - y1, : x2 - x1]
            hp, wp = h, w
            if len(bboxes):
                b = bboxes.copy()
                b[:, [0, 2]] += padw
                b[:, [1, 3]] += padh
                boxes9.append(b)
                cls9.append(cls)
        # crop the center (2s, 2s) window like the reference
        yc = int(rng.uniform(0, s))
        xc = int(rng.uniform(0, s))
        img9 = img9[yc : yc + 2 * s, xc : xc + 2 * s]
        bboxes = np.concatenate(boxes9, 0) if boxes9 else np.zeros((0, 4), np.float32)
        cls = np.concatenate(cls9, 0) if cls9 else np.zeros((0,), np.int64)
        if len(bboxes):
            bboxes[:, [0, 2]] -= xc
            bboxes[:, [1, 3]] -= yc
            bboxes[:, [0, 2]] = bboxes[:, [0, 2]].clip(0, 2 * s)
            bboxes[:, [1, 3]] = bboxes[:, [1, 3]].clip(0, 2 * s)
            keep = (bboxes[:, 2] - bboxes[:, 0] > 2) & (bboxes[:, 3] - bboxes[:, 1] > 2)
            bboxes, cls = bboxes[keep], cls[keep]
        return img9, bboxes, cls


class CopyPaste:
    """Instance copy-paste (parity: ref:data/augment.py:1636-1730).

    The reference pastes segment-masked instances; this pipeline is
    box-only, so the pasted unit is the instance's pixel rectangle,
    horizontally flipped and placed at the mirrored x position (the
    reference's ``mode='flip'`` placement).  Pastes skip positions that
    would cover existing boxes by more than ``iou_thres``.
    """

    def __init__(self, p: float = 0.5, iou_thres: float = 0.3):
        self.p = p
        self.iou_thres = iou_thres

    def __call__(self, img, bboxes, cls, rng: random.Random):
        n = len(bboxes)
        if not n or self.p <= 0:
            return img, bboxes, cls
        H, W = img.shape[:2]
        out_img = img
        new_boxes, new_cls = [], []
        for j in range(n):
            if rng.random() >= self.p:
                continue
            x1, y1, x2, y2 = bboxes[j].astype(int)
            w, h = x2 - x1, y2 - y1
            if w < 4 or h < 4:
                continue
            nx1 = W - x2  # mirrored placement
            nx2 = nx1 + w
            if nx1 < 0 or nx2 > W:
                continue
            cand = np.array([nx1, y1, nx2, y2], np.float32)
            # reject pastes that overlap existing instances too much
            xx1 = np.maximum(cand[0], bboxes[:, 0])
            yy1 = np.maximum(cand[1], bboxes[:, 1])
            xx2 = np.minimum(cand[2], bboxes[:, 2])
            yy2 = np.minimum(cand[3], bboxes[:, 3])
            inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
            area = (bboxes[:, 2] - bboxes[:, 0]) * (bboxes[:, 3] - bboxes[:, 1]) + 1e-9
            if (inter / area).max() > self.iou_thres:
                continue
            if out_img is img:
                out_img = img.copy()
            out_img[y1:y2, nx1:nx2] = img[y1:y2, x1:x2][:, ::-1]
            new_boxes.append(cand)
            new_cls.append(cls[j])
        if new_boxes:
            bboxes = np.concatenate([bboxes, np.stack(new_boxes)], 0)
            cls = np.concatenate([cls, np.asarray(new_cls)], 0)
        return out_img, bboxes, cls


@dataclass
class TrainTransforms:
    """v8 train pipeline: mosaic -> affine -> HSV -> flips -> letterbox.

    Assembly parity: augment.py:2280-2344 (v8_transforms); mixup hook
    included.  Produces fixed-size images + pixel-xyxy labels.
    """

    dataset: Any
    imgsz: int = 640
    mosaic: float = 1.0
    mixup: float = 0.0
    degrees: float = 0.0
    translate: float = 0.1
    scale: float = 0.5
    shear: float = 0.0
    perspective: float = 0.0
    hsv_h: float = 0.015
    hsv_s: float = 0.7
    hsv_v: float = 0.4
    fliplr: float = 0.5
    flipud: float = 0.0
    copy_paste: float = 0.0
    mosaic9: bool = False
    mosaic_enabled: bool = True

    def __post_init__(self):
        self._mosaic = Mosaic(self.dataset, self.imgsz, self.mosaic,
                              n=9 if self.mosaic9 else 4)
        self._copy_paste = CopyPaste(self.copy_paste)
        self._affine = RandomPerspective(
            degrees=self.degrees, translate=self.translate, scale=self.scale,
            shear=self.shear, perspective=self.perspective,
            border=(-self.imgsz // 2, -self.imgsz // 2),
        )
        self._affine_plain = RandomPerspective(
            degrees=self.degrees, translate=self.translate, scale=self.scale,
            shear=self.shear, perspective=self.perspective,
        )
        self._hsv = RandomHSV(self.hsv_h, self.hsv_s, self.hsv_v)
        self._letterbox = LetterBox((self.imgsz, self.imgsz))

    def __call__(self, index: int, rng: random.Random):
        use_mosaic = self.mosaic_enabled and rng.random() < self.mosaic
        if use_mosaic:
            img, bboxes, cls = self._mosaic(index, rng)
            img, bboxes, cls = self._affine(img, bboxes, cls, rng)
            if self.mixup and rng.random() < self.mixup:
                img2, b2, c2 = self._mosaic(rng.randrange(len(self.dataset)), rng)
                img2, b2, c2 = self._affine(img2, b2, c2, rng)
                r = np.random.beta(32.0, 32.0)
                img = (img * r + img2 * (1 - r)).astype(np.uint8)
                bboxes = np.concatenate([bboxes, b2], 0)
                cls = np.concatenate([cls, c2], 0)
        else:
            img, bboxes, cls = self.dataset.load_for_mosaic(index, self.imgsz)
            lb = self._letterbox(img, {"bboxes": bboxes, "cls": cls})
            img, bboxes = lb["img"], lb["bboxes"]
            img, bboxes, cls = self._affine_plain(img, bboxes, cls, rng)

        if self.copy_paste:
            img, bboxes, cls = self._copy_paste(img, bboxes, cls, rng)
        img = self._hsv(img, rng)
        img, bboxes = RandomFlip(self.flipud, "vertical")(img, bboxes, rng)
        img, bboxes = RandomFlip(self.fliplr, "horizontal")(img, bboxes, rng)

        # final size guard: mosaic+border already yields imgsz
        if img.shape[0] != self.imgsz or img.shape[1] != self.imgsz:
            lb = self._letterbox(img, {"bboxes": bboxes, "cls": cls})
            img, bboxes = lb["img"], lb["bboxes"]
        return img, bboxes.astype(np.float32), cls.astype(np.int64)
