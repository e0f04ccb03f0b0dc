"""DOTA aerial-image tiler: split large images into overlapping crops.

Parity: ref:ultralytics/data/split_dota.py — sliding-window crops with
configurable sizes/gaps, labels clipped per window and re-normalized.
Box-label variant (the reference handles 8-point OBB polygons; this
framework's detect task consumes axis-aligned xywh labels).
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np


def get_windows(im_size, crop_size: int = 1024, gap: int = 200,
                im_rate_thr: float = 0.6):
    """(h, w) -> (N, 4) xyxy crop windows with overlap ``gap``."""
    h, w = im_size
    step = crop_size - gap
    xs = list(range(0, max(w - crop_size, 0) + 1, step)) or [0]
    if xs[-1] + crop_size < w:
        xs.append(w - crop_size)
    ys = list(range(0, max(h - crop_size, 0) + 1, step)) or [0]
    if ys[-1] + crop_size < h:
        ys.append(h - crop_size)
    wins = []
    for y in ys:
        for x in xs:
            x2, y2 = min(x + crop_size, w), min(y + crop_size, h)
            area = (x2 - x) * (y2 - y)
            if area / (crop_size * crop_size) >= im_rate_thr:
                wins.append([x, y, x2, y2])
    return np.asarray(wins, np.int64).reshape(-1, 4)


def crop_labels(boxes_xyxy: np.ndarray, cls: np.ndarray, window,
                iof_thr: float = 0.7):
    """Labels intersecting a window (intersection-over-foreground >= thr),
    clipped and shifted into window coords."""
    if not len(boxes_xyxy):
        return boxes_xyxy.reshape(0, 4), cls[:0]
    wx1, wy1, wx2, wy2 = window
    x1 = np.maximum(boxes_xyxy[:, 0], wx1)
    y1 = np.maximum(boxes_xyxy[:, 1], wy1)
    x2 = np.minimum(boxes_xyxy[:, 2], wx2)
    y2 = np.minimum(boxes_xyxy[:, 3], wy2)
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area = (boxes_xyxy[:, 2] - boxes_xyxy[:, 0]) * (boxes_xyxy[:, 3] - boxes_xyxy[:, 1])
    keep = inter / (area + 1e-9) >= iof_thr
    out = np.stack([x1 - wx1, y1 - wy1, x2 - wx1, y2 - wy1], -1)[keep]
    return out.astype(np.float32), cls[keep]


def split_images_and_labels(im_dir: str, lb_dir: str, out_dir: str,
                            crop_size: int = 1024, gap: int = 200):
    """Tile every image + YOLO-format label file into ``out_dir``."""
    out_im = Path(out_dir) / "images"
    out_lb = Path(out_dir) / "labels"
    out_im.mkdir(parents=True, exist_ok=True)
    out_lb.mkdir(parents=True, exist_ok=True)
    n_crops = 0
    for imf in sorted(Path(im_dir).glob("*")):
        if imf.suffix.lower() not in {".jpg", ".png", ".jpeg", ".tif", ".bmp"}:
            continue
        im = cv2.imread(str(imf))
        if im is None:
            continue
        h, w = im.shape[:2]
        lf = Path(lb_dir) / f"{imf.stem}.txt"
        cls, boxes = [], []
        if lf.exists():
            for line in lf.read_text().splitlines():
                v = line.split()
                if len(v) >= 5:
                    cls.append(int(float(v[0])))
                    cx, cy, bw, bh = (float(x) for x in v[1:5])
                    boxes.append([(cx - bw / 2) * w, (cy - bh / 2) * h,
                                  (cx + bw / 2) * w, (cy + bh / 2) * h])
        cls = np.asarray(cls, np.int64)
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        for win in get_windows((h, w), crop_size, gap):
            x1, y1, x2, y2 = win
            wb, wc = crop_labels(boxes, cls, win)
            name = f"{imf.stem}__{x1}_{y1}"
            cv2.imwrite(str(out_im / f"{name}.jpg"), im[y1:y2, x1:x2])
            cw, ch = x2 - x1, y2 - y1
            lines = []
            for c, b in zip(wc, wb):
                bx = (b[0] + b[2]) / 2 / cw
                by = (b[1] + b[3]) / 2 / ch
                bw_ = (b[2] - b[0]) / cw
                bh_ = (b[3] - b[1]) / ch
                lines.append(f"{c} {bx:.6f} {by:.6f} {bw_:.6f} {bh_:.6f}")
            (out_lb / f"{name}.txt").write_text("\n".join(lines))
            n_crops += 1
    return n_crops
