"""Bboxes / Instances containers for augmentation-time label geometry.

Parity: ref:ultralytics/utils/instance.py:34,185 — vectorized numpy
containers with format conversion, scale/denormalize/clip/flip.
"""

from __future__ import annotations

import numpy as np

_FORMATS = ("xyxy", "xywh", "ltwh")


class Bboxes:
    def __init__(self, bboxes: np.ndarray, format: str = "xyxy"):
        assert format in _FORMATS
        bboxes = np.asarray(bboxes, np.float32)
        if bboxes.ndim == 1:
            bboxes = bboxes[None]
        assert bboxes.shape[-1] == 4
        self.bboxes = bboxes
        self.format = format

    def convert(self, format: str):
        assert format in _FORMATS
        if self.format == format:
            return
        b = self.bboxes
        # to xyxy first
        if self.format == "xywh":
            cx, cy, w, h = b.T
            b = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1)
        elif self.format == "ltwh":
            x, y, w, h = b.T
            b = np.stack([x, y, x + w, y + h], 1)
        if format == "xywh":
            x1, y1, x2, y2 = b.T
            b = np.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], 1)
        elif format == "ltwh":
            x1, y1, x2, y2 = b.T
            b = np.stack([x1, y1, x2 - x1, y2 - y1], 1)
        self.bboxes = b
        self.format = format

    def areas(self) -> np.ndarray:
        fmt = self.format
        self.convert("xyxy")
        b = self.bboxes
        a = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        self.convert(fmt)
        return a

    def mul(self, scale):
        if not isinstance(scale, (list, tuple, np.ndarray)):
            scale = (scale,) * 4
        self.bboxes = self.bboxes * np.asarray(scale, np.float32)

    def add(self, offset):
        if not isinstance(offset, (list, tuple, np.ndarray)):
            offset = (offset,) * 4
        self.bboxes = self.bboxes + np.asarray(offset, np.float32)

    def __len__(self):
        return len(self.bboxes)

    def __getitem__(self, idx):
        return Bboxes(self.bboxes[idx], self.format)


class Instances:
    """Boxes (+ optional segments/keypoints) moving through augmentations."""

    def __init__(self, bboxes, segments=None, keypoints=None,
                 bbox_format: str = "xywh", normalized: bool = True):
        self._bboxes = Bboxes(bboxes, bbox_format)
        self.segments = segments if segments is not None else np.zeros((0, 0, 2), np.float32)
        self.keypoints = keypoints
        self.normalized = normalized

    @property
    def bboxes(self):
        return self._bboxes.bboxes

    @property
    def bbox_areas(self):
        return self._bboxes.areas()

    def convert_bbox(self, format: str):
        self._bboxes.convert(format)

    def scale(self, sw, sh, bbox_only: bool = False):
        self._bboxes.mul((sw, sh, sw, sh))
        if not bbox_only:
            if self.segments.size:
                self.segments[..., 0] *= sw
                self.segments[..., 1] *= sh
            if self.keypoints is not None:
                self.keypoints[..., 0] *= sw
                self.keypoints[..., 1] *= sh

    def denormalize(self, w, h):
        if not self.normalized:
            return
        self.scale(w, h)
        self.normalized = False

    def normalize(self, w, h):
        if self.normalized:
            return
        self.scale(1 / w, 1 / h)
        self.normalized = True

    def add_padding(self, padw, padh):
        assert not self.normalized
        self._bboxes.add((padw, padh, padw, padh))
        if self.segments.size:
            self.segments[..., 0] += padw
            self.segments[..., 1] += padh
        if self.keypoints is not None:
            self.keypoints[..., 0] += padw
            self.keypoints[..., 1] += padh

    def flipud(self, h):
        fmt = self._bboxes.format
        self.convert_bbox("xyxy")
        b = self._bboxes.bboxes
        y1 = b[:, 1].copy()
        b[:, 1] = h - b[:, 3]
        b[:, 3] = h - y1
        self.convert_bbox(fmt)
        if self.segments.size:
            self.segments[..., 1] = h - self.segments[..., 1]
        if self.keypoints is not None:
            self.keypoints[..., 1] = h - self.keypoints[..., 1]

    def fliplr(self, w):
        fmt = self._bboxes.format
        self.convert_bbox("xyxy")
        b = self._bboxes.bboxes
        x1 = b[:, 0].copy()
        b[:, 0] = w - b[:, 2]
        b[:, 2] = w - x1
        self.convert_bbox(fmt)
        if self.segments.size:
            self.segments[..., 0] = w - self.segments[..., 0]
        if self.keypoints is not None:
            self.keypoints[..., 0] = w - self.keypoints[..., 0]

    def clip(self, w, h):
        fmt = self._bboxes.format
        self.convert_bbox("xyxy")
        b = self._bboxes.bboxes
        b[:, [0, 2]] = b[:, [0, 2]].clip(0, w)
        b[:, [1, 3]] = b[:, [1, 3]].clip(0, h)
        self.convert_bbox(fmt)

    def remove_zero_area_boxes(self):
        good = self.bbox_areas > 0
        if not good.all():
            self._bboxes = self._bboxes[good]
            if self.segments.size:
                self.segments = self.segments[good]
            if self.keypoints is not None:
                self.keypoints = self.keypoints[good]
        return good

    def __len__(self):
        return len(self._bboxes)

    def __getitem__(self, idx):
        return Instances(
            self.bboxes[idx],
            self.segments[idx] if self.segments.size else self.segments,
            self.keypoints[idx] if self.keypoints is not None else None,
            self._bboxes.format,
            self.normalized,
        )

    @classmethod
    def concatenate(cls, lst, axis=0):
        assert lst
        fmt = lst[0]._bboxes.format
        return cls(
            np.concatenate([i.bboxes for i in lst], axis),
            np.concatenate([i.segments for i in lst], axis) if lst[0].segments.size else lst[0].segments,
            np.concatenate([i.keypoints for i in lst], axis) if lst[0].keypoints is not None else None,
            fmt,
            lst[0].normalized,
        )
