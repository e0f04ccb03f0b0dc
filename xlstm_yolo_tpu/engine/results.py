"""Prediction containers: Results / Boxes (+ plot/save/json helpers).

Host-side numpy re-design of ref:ultralytics/engine/results.py:187-1100.
Device outputs land here once per batch; everything downstream
(plotting, serialization, tracking) is host work.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np


class Boxes:
    """(N, 6|7) array view: xyxy, (track_id), conf, cls (parity: results.py:1004)."""

    def __init__(self, data: np.ndarray, orig_shape: tuple[int, int]):
        data = np.asarray(data)
        if data.ndim == 1:
            data = data[None]
        assert data.shape[-1] in (6, 7), f"expected 6|7 cols, got {data.shape}"
        self.data = data
        self.orig_shape = orig_shape
        self.is_track = data.shape[-1] == 7

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        return Boxes(self.data[idx], self.orig_shape)

    @property
    def xyxy(self):
        return self.data[:, :4]

    @property
    def conf(self):
        return self.data[:, -2]

    @property
    def cls(self):
        return self.data[:, -1]

    @property
    def id(self):
        return self.data[:, 4] if self.is_track else None

    @property
    def xywh(self):
        x = self.xyxy
        return np.concatenate([(x[:, :2] + x[:, 2:]) / 2, x[:, 2:] - x[:, :2]], 1)

    @property
    def xyxyn(self):
        h, w = self.orig_shape
        return self.xyxy / np.array([w, h, w, h])

    @property
    def xywhn(self):
        h, w = self.orig_shape
        return self.xywh / np.array([w, h, w, h])


class Masks:
    """Instance masks container (parity: ref:engine/results.py:1004-1218).

    ``data``: (N, H, W) float/bool masks in inference resolution."""

    def __init__(self, data: np.ndarray, orig_shape: tuple[int, int]):
        self.data = np.asarray(data)
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        return Masks(self.data[idx], self.orig_shape)

    @property
    def xy(self):
        """Mask contours in pixel coords (list of (K, 2) arrays)."""
        import cv2

        out = []
        for m in self.data:
            cs, _ = cv2.findContours(
                (np.asarray(m) > 0.5).astype(np.uint8), cv2.RETR_EXTERNAL,
                cv2.CHAIN_APPROX_SIMPLE)
            out.append(max(cs, key=cv2.contourArea).reshape(-1, 2).astype(np.float32)
                       if cs else np.zeros((0, 2), np.float32))
        return out

    @property
    def xyn(self):
        h, w = self.orig_shape
        return [c / np.array([w, h], np.float32) for c in self.xy]


class Keypoints:
    """Keypoints container (parity: ref:engine/results.py:1222-1318).

    ``data``: (N, K, 2|3) image-space keypoints (x, y[, conf])."""

    def __init__(self, data: np.ndarray, orig_shape: tuple[int, int]):
        self.data = np.asarray(data)
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        return Keypoints(self.data[idx], self.orig_shape)

    @property
    def xy(self):
        return self.data[..., :2]

    @property
    def xyn(self):
        h, w = self.orig_shape
        return self.data[..., :2] / np.array([w, h], np.float32)

    @property
    def conf(self):
        return self.data[..., 2] if self.data.shape[-1] == 3 else None


class Probs:
    """Classification probabilities container (parity: ref:results.py:1444)."""

    def __init__(self, data: np.ndarray):
        self.data = np.asarray(data)

    @property
    def top1(self):
        return int(self.data.argmax())

    @property
    def top5(self):
        return np.argsort(-self.data)[:5].tolist()

    @property
    def top1conf(self):
        return float(self.data.max())

    @property
    def top5conf(self):
        return self.data[self.top5]


class OBB:
    """Oriented boxes: (N, 7) [cx, cy, w, h, angle, conf, cls] in image px
    (parity: ref:engine/results.py OBB container)."""

    def __init__(self, data: np.ndarray, orig_shape: tuple[int, int]):
        self.data = np.asarray(data, np.float32).reshape(-1, 7)
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        return OBB(self.data[idx], self.orig_shape)

    @property
    def xywhr(self):
        return self.data[:, :5]

    @property
    def conf(self):
        return self.data[:, 5]

    @property
    def cls(self):
        return self.data[:, 6]

    @property
    def xyxyxyxy(self):
        """(N, 4, 2) corner points."""
        import jax.numpy as jnp

        from xlstm_yolo_tpu.utils.tal import xywhr2xyxyxyxy

        return np.asarray(xywhr2xyxyxyxy(jnp.asarray(self.data[:, :5])))

    @property
    def xyxy(self):
        """Axis-aligned envelope (N, 4)."""
        c = self.xyxyxyxy
        if not len(c):
            return np.zeros((0, 4), np.float32)
        return np.concatenate([c.min(1), c.max(1)], -1)


# COCO-pose skeleton edges (parity: ref:utils/plotting.py Annotator.skeleton)
_SKELETON17 = [
    (15, 13), (13, 11), (16, 14), (14, 12), (11, 12), (5, 11), (6, 12),
    (5, 6), (5, 7), (6, 8), (7, 9), (8, 10), (1, 2), (0, 1), (0, 2),
    (1, 3), (2, 4), (3, 5), (4, 6),
]


@dataclass
class Results:
    """One image's predictions (parity: results.py:187-1000)."""

    orig_img: np.ndarray
    path: str
    names: dict
    boxes: Boxes | None = None
    masks: Masks | None = None
    keypoints: Keypoints | None = None
    probs: Probs | None = None
    obb: OBB | None = None
    speed: dict = field(default_factory=dict)

    def __len__(self):
        if self.boxes is not None:
            return len(self.boxes)
        return len(self.obb) if self.obb is not None else 0

    def __getitem__(self, idx):
        return Results(self.orig_img, self.path, self.names, self.boxes[idx],
                       self.masks[idx] if self.masks is not None else None,
                       self.keypoints[idx] if self.keypoints is not None else None,
                       self.probs, self.speed)

    def update(self, boxes: np.ndarray | None = None, masks: np.ndarray | None = None,
               keypoints: np.ndarray | None = None):
        if boxes is not None:
            self.boxes = Boxes(boxes, self.orig_img.shape[:2])
        if masks is not None:
            self.masks = Masks(masks, self.orig_img.shape[:2])
        if keypoints is not None:
            self.keypoints = Keypoints(keypoints, self.orig_img.shape[:2])
        return self

    def cpu(self):
        return self

    def numpy(self):
        return self

    def plot(self, line_width: int | None = None, font_scale: float = 0.5,
             conf: bool = True, labels: bool = True, img: np.ndarray | None = None,
             masks: bool = True, kpt_radius: int = 3):
        """Render boxes + mask overlays + keypoint skeletons on a BGR copy
        (parity: ref:engine/results.py Results.plot via Annotator — box
        labels, per-instance mask alpha-fill, kpt dots + skeleton)."""
        import cv2

        im = (img if img is not None else self.orig_img).copy()
        lw = line_width or max(round(sum(im.shape[:2]) / 2 * 0.003), 2)

        if masks and self.masks is not None and len(self.masks):
            overlay = im.copy()
            for j, m in enumerate(np.asarray(self.masks.data)):
                c = (int(self.boxes.data[j][-1])
                     if self.boxes is not None and j < len(self.boxes) else j)
                mm = m.astype(bool)
                if mm.shape != im.shape[:2]:
                    mm = cv2.resize(m.astype(np.uint8), im.shape[:2][::-1],
                                    interpolation=cv2.INTER_NEAREST).astype(bool)
                overlay[mm] = _color(c)
            im = cv2.addWeighted(im, 0.6, overlay, 0.4, 0)

        if self.boxes is not None:
            for row in self.boxes.data:
                x1, y1, x2, y2 = row[:4].astype(int)
                c = int(row[-1])
                col = _color(c)
                cv2.rectangle(im, (x1, y1), (x2, y2), col, lw)
                if labels:
                    name = self.names.get(c, str(c))
                    txt = f"{name} {row[-2]:.2f}" if conf else name
                    cv2.putText(im, txt, (x1, max(y1 - 4, 12)),
                                cv2.FONT_HERSHEY_SIMPLEX, font_scale, col, max(lw - 1, 1))

        if self.obb is not None:
            for row in np.asarray(self.obb.data):
                # numpy corner math (host-side plot must not touch devices)
                cx, cy, w, h, ang = row[:5]
                cos, sin = np.cos(ang), np.sin(ang)
                v1 = np.array([w / 2 * cos, w / 2 * sin])
                v2 = np.array([-h / 2 * sin, h / 2 * cos])
                ctr = np.array([cx, cy])
                pts = np.stack([ctr + v1 + v2, ctr + v1 - v2,
                                ctr - v1 - v2, ctr - v1 + v2]).astype(np.int32)
                cv2.polylines(im, [pts], True, _color(int(row[-1])), lw)

        if self.keypoints is not None and len(self.keypoints):
            for k in np.asarray(self.keypoints.data):
                K = k.shape[0]
                vis = k[:, 2] if k.shape[1] > 2 else np.ones(K)
                for j in range(K):
                    if vis[j] > 0.25:
                        cv2.circle(im, (int(k[j, 0]), int(k[j, 1])), kpt_radius,
                                   _color(j), -1)
                if K == 17:  # COCO skeleton
                    for a, b in _SKELETON17:
                        if vis[a] > 0.25 and vis[b] > 0.25:
                            cv2.line(im, (int(k[a, 0]), int(k[a, 1])),
                                     (int(k[b, 0]), int(k[b, 1])),
                                     _color(a), max(lw - 1, 1))
        return im

    def save(self, filename: str | Path):
        import cv2

        cv2.imwrite(str(filename), self.plot())
        return filename

    def save_txt(self, txt_file: str | Path, save_conf: bool = False):
        """YOLO-format label lines: 'cls cx cy w h [conf]' normalized."""
        lines = []
        if self.boxes is not None:
            h, w = self.orig_img.shape[:2]
            for row in self.boxes.data:
                xywh = np.array([
                    (row[0] + row[2]) / 2 / w, (row[1] + row[3]) / 2 / h,
                    (row[2] - row[0]) / w, (row[3] - row[1]) / h,
                ])
                vals = [int(row[-1]), *xywh]
                if save_conf:
                    vals.append(float(row[-2]))
                lines.append(" ".join(f"{v:.6g}" if not isinstance(v, int) else str(v) for v in vals))
        Path(txt_file).parent.mkdir(parents=True, exist_ok=True)
        Path(txt_file).write_text("\n".join(lines))
        return txt_file

    def to_json(self, normalize: bool = False) -> str:
        return json.dumps(self.summary(normalize=normalize), indent=2)

    def summary(self, normalize: bool = False) -> list[dict]:
        out = []
        if self.boxes is None:
            return out
        h, w = self.orig_img.shape[:2]
        for row in self.boxes.data:
            x1, y1, x2, y2 = row[:4]
            if normalize:
                x1, x2 = x1 / w, x2 / w
                y1, y2 = y1 / h, y2 / h
            c = int(row[-1])
            out.append(
                {
                    "name": self.names.get(c, str(c)),
                    "class": c,
                    "confidence": round(float(row[-2]), 5),
                    "box": {"x1": float(x1), "y1": float(y1), "x2": float(x2), "y2": float(y2)},
                }
            )
        return out

    def verbose(self) -> str:
        if not len(self):
            return "(no detections), "
        counts = {}
        for c in self.boxes.cls.astype(int):
            counts[c] = counts.get(c, 0) + 1
        return ", ".join(f"{n} {self.names.get(c, c)}{'s' if n > 1 else ''}" for c, n in counts.items()) + ", "


def _color(i: int) -> tuple[int, int, int]:
    palette = [
        (56, 56, 255), (151, 157, 255), (31, 112, 255), (29, 178, 255),
        (49, 210, 207), (10, 249, 72), (23, 204, 146), (134, 219, 61),
        (52, 147, 26), (187, 212, 0), (168, 153, 44), (255, 194, 0),
        (147, 69, 52), (255, 115, 100), (236, 24, 0), (255, 56, 132),
        (133, 0, 82), (255, 56, 203), (200, 149, 255), (199, 55, 255),
    ]
    return palette[i % len(palette)]
