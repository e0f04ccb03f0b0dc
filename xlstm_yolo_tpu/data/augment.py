"""Host-side image transforms (numpy/cv2) feeding fixed-shape device batches.

Re-design of ref:ultralytics/data/augment.py for a TPU input pipeline:
geometry/color work happens on host workers in numpy (cv2), always
emitting *static* shapes; the device side only normalizes.  Label
geometry is carried as padded arrays, not ragged lists.

Instance-aware: every transform moves a ``labels`` dict
``{img, cls (N,), bboxes (N,4) xyxy px, segments (N,Sp,2) px,
keypoints (N,K,3) px | None}`` so segments and keypoints stay
geometrically aligned with the boxes through mosaic, affine, flips and
copy-paste (parity: ref:data/augment.py:952-1301 apply_segments /
apply_keypoints; ref:utils/instance.py Instances).

Includes: LetterBox, Mosaic (4/9-grid), RandomPerspective (affine),
RandomHSV, RandomFlip, MixUp, CopyPaste, and the v8 train pipeline.
"""

from __future__ import annotations

import math
import random
from dataclasses import dataclass, field
from typing import Any

import cv2
import numpy as np

SEGMENT_RESAMPLE = 400  # fixed per-instance polygon point count


def resample_segments(segments, n: int = SEGMENT_RESAMPLE) -> np.ndarray:
    """Ragged polygon list -> fixed (N, n, 2) by linear interpolation.

    Parity: ref:utils/ops.py resample_segments — each closed contour is
    sampled at ``n`` evenly spaced points (the fixed point count is what
    lets downstream transforms stay vectorized / fixed-shape).
    """
    out = np.zeros((len(segments), n, 2), np.float32)
    for i, s in enumerate(segments):
        s = np.concatenate([s, s[0:1]], axis=0)  # close the contour
        x = np.linspace(0, len(s) - 1, n)
        xp = np.arange(len(s))
        out[i] = np.stack(
            [np.interp(x, xp, s[:, 0]), np.interp(x, xp, s[:, 1])], axis=-1
        )
    return out


def segments_to_boxes(segments: np.ndarray, w: float, h: float) -> np.ndarray:
    """(N, Sp, 2) px segments -> (N, 4) xyxy boxes clipped to the canvas.

    Parity: ref:data/augment.py segment2box usage after affine — boxes
    are re-derived from the transformed point sets (points are clipped
    to the canvas first; an instance fully outside degenerates to a
    zero-area box and is dropped by the candidate filter).
    """
    if not len(segments):
        return np.zeros((0, 4), np.float32)
    x = segments[..., 0].clip(0, w)
    y = segments[..., 1].clip(0, h)
    return np.stack([x.min(1), y.min(1), x.max(1), y.max(1)], axis=1).astype(np.float32)


def empty_labels(n: int = 0, sp: int = 0, keypoints: bool = False, K: int = 17):
    return {
        "cls": np.zeros((n,), np.int64),
        "bboxes": np.zeros((n, 4), np.float32),
        "segments": np.zeros((n, sp, 2), np.float32),
        "keypoints": np.zeros((n, K, 3), np.float32) if keypoints else None,
    }


def _index_labels(labels: dict, keep) -> dict:
    out = dict(labels)
    out["cls"] = labels["cls"][keep]
    out["bboxes"] = labels["bboxes"][keep]
    out["segments"] = labels["segments"][keep]
    if labels.get("keypoints") is not None:
        out["keypoints"] = labels["keypoints"][keep]
    return out


def _cat_labels(parts: list[dict]) -> dict:
    first = parts[0]
    out = {
        "cls": np.concatenate([p["cls"] for p in parts], 0),
        "bboxes": np.concatenate([p["bboxes"] for p in parts], 0),
        "segments": np.concatenate([p["segments"] for p in parts], 0),
    }
    out["keypoints"] = (
        np.concatenate([p["keypoints"] for p in parts], 0)
        if first.get("keypoints") is not None
        else None
    )
    return out


def _offset_labels(labels: dict, dx: float, dy: float) -> dict:
    out = dict(labels)
    b = labels["bboxes"].copy()
    b[:, [0, 2]] += dx
    b[:, [1, 3]] += dy
    out["bboxes"] = b
    s = labels["segments"].copy()
    if s.size:
        s[..., 0] += dx
        s[..., 1] += dy
    out["segments"] = s
    if labels.get("keypoints") is not None:
        k = labels["keypoints"].copy()
        k[..., 0] += dx
        k[..., 1] += dy
        out["keypoints"] = k
    return out


def _scale_labels(labels: dict, r: float) -> dict:
    out = dict(labels)
    out["bboxes"] = labels["bboxes"] * r
    out["segments"] = labels["segments"] * r
    if labels.get("keypoints") is not None:
        k = labels["keypoints"].copy()
        k[..., :2] *= r
        out["keypoints"] = k
    return out


def clip_labels(labels: dict, w: float, h: float) -> dict:
    """Clip box/segment coordinates into the canvas (parity:
    ref:utils/instance.py Instances.clip — keypoint visibility is
    zeroed for out-of-canvas points rather than clipping them)."""
    out = dict(labels)
    b = labels["bboxes"].copy()
    b[:, [0, 2]] = b[:, [0, 2]].clip(0, w)
    b[:, [1, 3]] = b[:, [1, 3]].clip(0, h)
    out["bboxes"] = b
    s = labels["segments"].copy()
    if s.size:
        s[..., 0] = s[..., 0].clip(0, w)
        s[..., 1] = s[..., 1].clip(0, h)
    out["segments"] = s
    if labels.get("keypoints") is not None:
        k = labels["keypoints"].copy()
        outside = (k[..., 0] < 0) | (k[..., 0] > w) | (k[..., 1] < 0) | (k[..., 1] > h)
        k[..., 2] = np.where(outside, 0.0, k[..., 2])
        out["keypoints"] = k
    return out


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
        out = _offset_labels(_scale_labels(labels, r), left, top)
        out["img"] = img
        out["ratio_pad"] = (ratio, (left, top))
        out["resized_shape"] = img.shape[:2]
        return out


class Albumentations:
    """Optional albumentations hook (parity: ref:data/augment.py:1737).

    The reference applies a fixed pixel-level recipe (Blur, MedianBlur,
    ToGray, CLAHE, RandomBrightnessContrast, RandomGamma,
    ImageCompression) when the `albumentations` package is importable,
    and silently no-ops otherwise.  Same here: pixel-level only (boxes
    untouched), import-guarded, gated by ``p``.  This environment does
    not ship albumentations, so the hook exists for users who install
    it; tests exercise the no-op path and a stubbed transform.
    """

    def __init__(self, p: float = 1.0):
        self.p = p
        self.transform = None
        try:
            import albumentations as A

            self.transform = A.Compose([
                A.Blur(p=0.01),
                A.MedianBlur(p=0.01),
                A.ToGray(p=0.01),
                A.CLAHE(p=0.01),
                A.RandomBrightnessContrast(p=0.0),
                A.RandomGamma(p=0.0),
                A.ImageCompression(quality_range=(75, 100), p=0.0),
            ])
        except Exception:  # not installed / incompatible — stay a no-op
            self.transform = None

    def __call__(self, img: np.ndarray, rng: random.Random) -> np.ndarray:
        if self.transform is None or rng.random() >= self.p:
            return img
        return self.transform(image=img)["image"]


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
class ClassifyAugment:
    """Classification train-time augmentation (parity:
    ref:data/augment.py:2405 ``classify_augmentations`` — torchvision
    RandomResizedCrop + H/V flips + ColorJitter + RandomErasing —
    re-implemented with numpy/cv2 on host workers).  The optional
    torchvision ``auto_augment`` policies (randaugment/augmix/
    autoaugment) are intentionally not replicated; the color jitter is
    expressed as the repo's LUT RandomHSV, matching the reference's
    hsv_h/s/v parameterization of ColorJitter.

    Operates on uint8 BGR HWC of any size; returns (size, size, 3).
    """

    size: int = 224
    scale: tuple = (0.08, 1.0)  # RandomResizedCrop area fraction range
    ratio: tuple = (3.0 / 4.0, 4.0 / 3.0)  # aspect-ratio range
    hflip: float = 0.5
    vflip: float = 0.0
    hsv_h: float = 0.015
    hsv_s: float = 0.4
    hsv_v: float = 0.4
    erasing: float = 0.0  # probability of one erased rectangle

    def __post_init__(self):
        self._hsv = RandomHSV(self.hsv_h, self.hsv_s, self.hsv_v)

    # torchvision RandomResizedCrop.get_params semantics: 10 attempts of
    # (area-scale, log-uniform ratio) sampling, then a ratio-clamped
    # center-crop fallback.
    def _resized_crop(self, img: np.ndarray, rng: random.Random) -> np.ndarray:
        h, w = img.shape[:2]
        area = h * w
        log_r = (math.log(self.ratio[0]), math.log(self.ratio[1]))
        for _ in range(10):
            target = area * rng.uniform(*self.scale)
            ar = math.exp(rng.uniform(*log_r))
            cw = round(math.sqrt(target * ar))
            ch = round(math.sqrt(target / ar))
            if 0 < cw <= w and 0 < ch <= h:
                top = rng.randint(0, h - ch)
                left = rng.randint(0, w - cw)
                crop = img[top : top + ch, left : left + cw]
                return cv2.resize(crop, (self.size, self.size),
                                  interpolation=cv2.INTER_LINEAR)
        in_ratio = w / h
        if in_ratio < self.ratio[0]:
            cw, ch = w, round(w / self.ratio[0])
        elif in_ratio > self.ratio[1]:
            cw, ch = round(h * self.ratio[1]), h
        else:
            cw, ch = w, h
        top, left = (h - ch) // 2, (w - cw) // 2
        crop = img[top : top + ch, left : left + cw]
        return cv2.resize(crop, (self.size, self.size),
                          interpolation=cv2.INTER_LINEAR)

    # torchvision RandomErasing(value=0) semantics: 10 attempts of
    # (area-scale in [0.02, 0.33], log-uniform ratio in [0.3, 3.3]).
    def _erase(self, img: np.ndarray, rng: random.Random) -> np.ndarray:
        h, w = img.shape[:2]
        area = h * w
        for _ in range(10):
            target = area * rng.uniform(0.02, 0.33)
            ar = math.exp(rng.uniform(math.log(0.3), math.log(3.3)))
            ew = round(math.sqrt(target * ar))
            eh = round(math.sqrt(target / ar))
            if 0 < ew < w and 0 < eh < h:
                top = rng.randint(0, h - eh)
                left = rng.randint(0, w - ew)
                img = img.copy()
                img[top : top + eh, left : left + ew] = 0
                return img
        return img

    def __call__(self, img: np.ndarray, rng: random.Random) -> np.ndarray:
        img = self._resized_crop(img, rng)
        if self.hflip > 0.0 and rng.random() < self.hflip:
            img = np.ascontiguousarray(img[:, ::-1])
        if self.vflip > 0.0 and rng.random() < self.vflip:
            img = np.ascontiguousarray(img[::-1])
        img = self._hsv(np.ascontiguousarray(img), rng)
        if self.erasing > 0.0 and rng.random() < self.erasing:
            img = self._erase(img, rng)
        return img


@dataclass
class RandomFlip:
    """Horizontal/vertical flip of image + instances (parity:
    augment.py:1385-1477, incl. the keypoint ``flip_idx`` left/right
    swap on horizontal flips)."""

    p: float = 0.5
    direction: str = "horizontal"
    flip_idx: Any = None  # (K,) index map for keypoint left/right swap

    def __call__(self, img, labels: dict, rng: random.Random):
        h, w = img.shape[:2]
        if rng.random() >= self.p:
            return img, labels
        out = dict(labels)
        b = labels["bboxes"].copy()
        s = labels["segments"].copy()
        k = labels["keypoints"].copy() if labels.get("keypoints") is not None else None
        if self.direction == "horizontal":
            img = np.fliplr(img)
            if len(b):
                x1 = b[:, 0].copy()
                b[:, 0] = w - b[:, 2]
                b[:, 2] = w - x1
            if s.size:
                s[..., 0] = w - s[..., 0]
            if k is not None:
                k[..., 0] = w - k[..., 0]
                if self.flip_idx is not None and len(self.flip_idx) == k.shape[1]:
                    k = np.ascontiguousarray(k[:, np.asarray(self.flip_idx, int), :])
        else:
            img = np.flipud(img)
            if len(b):
                y1 = b[:, 1].copy()
                b[:, 1] = h - b[:, 3]
                b[:, 3] = h - y1
            if s.size:
                s[..., 1] = h - s[..., 1]
            if k is not None:
                k[..., 1] = h - k[..., 1]
        out["bboxes"], out["segments"], out["keypoints"] = b, s, k
        return np.ascontiguousarray(img), out


@dataclass
class RandomPerspective:
    """Affine warp (rotate/translate/scale/shear) + instance transform.

    Parity: augment.py:952-1301 — segments are transformed pointwise and
    the boxes re-derived from them (apply_segments); keypoints are
    transformed with out-of-canvas points marked invisible
    (apply_keypoints); candidate filtering (area/ar/wh) indexes all
    geometry together.
    """

    degrees: float = 0.0
    translate: float = 0.1
    scale: float = 0.5
    shear: float = 0.0
    perspective: float = 0.0
    border: tuple[int, int] = (0, 0)
    pad_value: int = 114

    def _matrix(self, img, rng: random.Random):
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
        h = img.shape[0] + self.border[0] * 2
        w = img.shape[1] + self.border[1] * 2
        T[0, 2] = rng.uniform(0.5 - self.translate, 0.5 + self.translate) * w
        T[1, 2] = rng.uniform(0.5 - self.translate, 0.5 + self.translate) * h
        return T @ S @ R @ P @ C, s, w, h

    def _apply_points(self, pts: np.ndarray, M: np.ndarray) -> np.ndarray:
        """(..., 2) -> (..., 2) through the homography."""
        shp = pts.shape
        xy = np.ones((int(np.prod(shp[:-1])), 3))
        xy[:, :2] = pts.reshape(-1, 2)
        xy = xy @ M.T
        if self.perspective:
            xy = xy[:, :2] / xy[:, 2:3]
        else:
            xy = xy[:, :2]
        return xy.reshape(shp).astype(np.float32)

    def __call__(self, img, labels: dict, rng: random.Random):
        M, s, w, h = self._matrix(img, rng)

        if (self.border[0] != 0) or (self.border[1] != 0) or (M != np.eye(3)).any():
            if self.perspective:
                img = cv2.warpPerspective(
                    img, M, dsize=(w, h), borderValue=(self.pad_value,) * 3
                )
            else:
                img = cv2.warpAffine(
                    img, M[:2], dsize=(w, h), borderValue=(self.pad_value,) * 3
                )

        bboxes = labels["bboxes"]
        n = len(bboxes)
        if not n:
            out = dict(labels)
            out["img"] = img
            return img, out

        segments = labels["segments"]
        use_segments = segments.size > 0
        if use_segments:
            new_segments = self._apply_points(segments, M)
            new = segments_to_boxes(new_segments, w, h)
        else:
            new_segments = segments
            xy = self._apply_points(
                bboxes[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(n, 4, 2), M
            ).reshape(n, 8)
            x = xy[:, [0, 2, 4, 6]]
            y = xy[:, [1, 3, 5, 7]]
            new = np.stack([x.min(1), y.min(1), x.max(1), y.max(1)], axis=1)
            new[:, [0, 2]] = new[:, [0, 2]].clip(0, w)
            new[:, [1, 3]] = new[:, [1, 3]].clip(0, h)

        keypoints = labels.get("keypoints")
        if keypoints is not None:
            k = keypoints.copy()
            k[..., :2] = self._apply_points(keypoints[..., :2], M)
            outside = (k[..., 0] < 0) | (k[..., 0] > w) | (k[..., 1] < 0) | (k[..., 1] > h)
            k[..., 2] = np.where(outside, 0.0, k[..., 2])
            keypoints = k

        keep = _box_candidates(
            bboxes.T * s, new.T, area_thr=0.01 if use_segments else 0.1
        )
        out = dict(labels)
        out["bboxes"] = new[keep]
        out["cls"] = labels["cls"][keep]
        out["segments"] = new_segments[keep] if use_segments else new_segments
        out["keypoints"] = keypoints[keep] if keypoints is not None else None
        return img, out


def _box_candidates(box1, box2, wh_thr=2, ar_thr=100, area_thr=0.1, eps=1e-16):
    """Filter degenerate post-warp boxes (parity: augment.py:1264-1301)."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return (w2 > wh_thr) & (h2 > wh_thr) & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr)


class Mosaic:
    """4- or 9-image mosaic over full instance geometry (parity:
    augment.py:490-705, incl. the 3x3 ``n=9`` grid at :560)."""

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
        parts = []
        for i, idx in enumerate(indices):
            img, labels = self.dataset.load_for_mosaic(idx, s)
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
            parts.append(_offset_labels(labels, x1a - x1b, y1a - y1b))
        labels4 = clip_labels(_cat_labels(parts), 2 * s, 2 * s)
        return img4, labels4

    def _mosaic9(self, index: int, rng: random.Random):
        """3x3 grid around a center tile, cropped to (2s, 2s)
        (parity: ref:data/augment.py:560-630)."""
        s = self.imgsz
        indices = [index] + [rng.randrange(len(self.dataset)) for _ in range(8)]
        img9 = np.full((s * 3, s * 3, 3), self.pad_value, dtype=np.uint8)
        hp = wp = -1  # height/width of previous tile
        parts = []
        for i, idx in enumerate(indices):
            img, labels = self.dataset.load_for_mosaic(idx, s)
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
            parts.append(_offset_labels(labels, padw, padh))
        # crop the center (2s, 2s) window like the reference
        yc = int(rng.uniform(0, s))
        xc = int(rng.uniform(0, s))
        img9 = img9[yc : yc + 2 * s, xc : xc + 2 * s]
        labels9 = _offset_labels(_cat_labels(parts), -xc, -yc)
        labels9 = clip_labels(labels9, 2 * s, 2 * s)
        if len(labels9["bboxes"]):
            b = labels9["bboxes"]
            keep = (b[:, 2] - b[:, 0] > 2) & (b[:, 3] - b[:, 1] > 2)
            labels9 = _index_labels(labels9, keep)
        return img9, labels9


class CopyPaste:
    """Instance copy-paste (parity: ref:data/augment.py:1636-1730).

    The reference pastes segment-masked instances; here the pasted unit
    is the instance's pixel rectangle, horizontally flipped and placed
    at the mirrored x position (the reference's ``mode='flip'``
    placement), with the segment polygon mirrored to match.  Keypoint
    datasets skip pasting (the reference also requires segments).
    Pastes skip positions that would cover existing boxes by more than
    ``iou_thres``.
    """

    def __init__(self, p: float = 0.5, iou_thres: float = 0.3):
        self.p = p
        self.iou_thres = iou_thres

    def __call__(self, img, labels: dict, rng: random.Random):
        bboxes = labels["bboxes"]
        n = len(bboxes)
        if not n or self.p <= 0 or labels.get("keypoints") is not None:
            return img, labels
        H, W = img.shape[:2]
        out_img = img
        new_parts = []
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
            part = {
                "cls": labels["cls"][j : j + 1],
                "bboxes": cand[None],
                "segments": labels["segments"][j : j + 1].copy(),
                "keypoints": None,
            }
            if part["segments"].size:  # mirror the polygon around the paste center
                part["segments"][..., 0] = (W - part["segments"][..., 0])
            new_parts.append(part)
        if new_parts:
            labels = _cat_labels([labels] + new_parts)
        return out_img, labels


@dataclass
class TrainTransforms:
    """v8 train pipeline: mosaic -> affine -> HSV -> flips -> letterbox.

    Assembly parity: augment.py:2280-2344 (v8_transforms); mixup hook
    included.  Produces a fixed-size image + pixel-space instance
    labels (boxes always; segments/keypoints when the dataset has them).
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
    flip_idx: Any = None

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
        self._albumentations = Albumentations(p=1.0)  # no-op if not installed
        self._letterbox = LetterBox((self.imgsz, self.imgsz))

    def __call__(self, index: int, rng: random.Random) -> dict:
        use_mosaic = self.mosaic_enabled and rng.random() < self.mosaic
        if use_mosaic:
            img, labels = self._mosaic(index, rng)
            img, labels = self._affine(img, labels, rng)
            if self.mixup and rng.random() < self.mixup:
                img2, labels2 = self._mosaic(rng.randrange(len(self.dataset)), rng)
                img2, labels2 = self._affine(img2, labels2, rng)
                r = np.random.beta(32.0, 32.0)
                img = (img * r + img2 * (1 - r)).astype(np.uint8)
                labels = _cat_labels([labels, labels2])
        else:
            img, labels = self.dataset.load_for_mosaic(index, self.imgsz)
            labels = self._letterbox(img, labels)
            img = labels.pop("img")
            labels.pop("ratio_pad", None)
            labels.pop("resized_shape", None)
            img, labels = self._affine_plain(img, labels, rng)

        if self.copy_paste:
            img, labels = self._copy_paste(img, labels, rng)
        img = self._albumentations(img, rng)  # ref order: before HSV
        img = self._hsv(img, rng)
        img, labels = RandomFlip(self.flipud, "vertical")(img, labels, rng)
        img, labels = RandomFlip(self.fliplr, "horizontal", self.flip_idx)(img, labels, rng)

        # final size guard: mosaic+border already yields imgsz
        if img.shape[0] != self.imgsz or img.shape[1] != self.imgsz:
            labels = self._letterbox(img, labels)
            img = labels.pop("img")
            labels.pop("ratio_pad", None)
            labels.pop("resized_shape", None)
        labels["img"] = img
        labels["bboxes"] = labels["bboxes"].astype(np.float32)
        labels["cls"] = labels["cls"].astype(np.int64)
        return labels
