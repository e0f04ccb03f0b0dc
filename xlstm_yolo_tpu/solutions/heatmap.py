"""Accumulated detection-density heatmap (parity: ref:solutions/heatmap.py).

Extends ObjectCounter exactly like the reference: per-frame the heatmap
accumulates a circular footprint inside each tracked box
(``heatmap_effect``), and when a counting region is configured the
IN/OUT line-crossing counts run on the same tracks.  The standalone
``update``/``render`` API (decayed full-box fill) is kept for callers
that already have track rows.
"""

from __future__ import annotations

import numpy as np

from xlstm_yolo_tpu.solutions.object_counter import ObjectCounter


class Heatmap(ObjectCounter):
    def __init__(self, shape: tuple[int, int] | None = None, decay: float = 0.99,
                 colormap: int | None = None, region=None, **kwargs):
        if region is not None:
            super().__init__(region=region, **kwargs)
        else:
            # counting is optional for heatmaps; ObjectCounter requires a
            # region, so install a far-away default that never triggers
            super().__init__(line=[(-1e6, -1e6), (-1e6 + 1, -1e6)], **kwargs)
            self.region_active = False
        self.region_active = region is not None
        self.map = np.zeros(shape, np.float32) if shape else None
        self.decay = decay
        self.colormap = colormap

    # ------------------------------------------------------------------
    # reference flow: generate_heatmap(im0)
    # ------------------------------------------------------------------

    def heatmap_effect(self, box):
        """Accumulate +2 inside the inscribed circle of ``box``
        (ref:heatmap.py:46-73)."""
        h, w = self.map.shape
        x0, y0, x1, y1 = (int(np.clip(v, 0, m)) for v, m in
                          zip(box[:4], (w, h, w, h)))
        if x1 <= x0 or y1 <= y0:
            return
        r2 = (min(x1 - x0, y1 - y0) // 2) ** 2
        xv, yv = np.meshgrid(np.arange(x0, x1), np.arange(y0, y1))
        d2 = (xv - (x0 + x1) // 2) ** 2 + (yv - (y0 + y1) // 2) ** 2
        self.map[y0:y1, x0:x1][d2 <= r2] += 2

    def generate_heatmap(self, im0: np.ndarray) -> np.ndarray:
        """Track -> accumulate -> (optional counting) -> colormap overlay
        (ref:heatmap.py:75-127)."""
        if self.map is None or self.map.shape != im0.shape[:2]:
            self.map = np.zeros(im0.shape[:2], np.float32)
        tracks = self.extract_tracks(im0)
        for row in tracks:
            self.heatmap_effect(row[:4])
        if self.region_active:
            self.update(tracks)
            im0 = self.annotate(im0)
        if len(tracks):
            im0 = self.render(im0)
        self.display_output(im0)
        return im0

    # ------------------------------------------------------------------
    # standalone API (synthetic-track tests / no model attached)
    # ------------------------------------------------------------------

    def update(self, tracks_or_boxes: np.ndarray):
        """With a region: ObjectCounter crossing counts on (N, 7) rows.
        Without: decayed full-box accumulation on (N, 4+) boxes."""
        arr = np.asarray(tracks_or_boxes)
        if self.region_active and arr.ndim == 2 and arr.shape[-1] >= 7:
            return super().update(arr)
        if self.map is None:
            raise ValueError("Heatmap(shape=...) required for box accumulation")
        self.map *= self.decay
        h, w = self.map.shape
        for b in arr.reshape(-1, arr.shape[-1] if len(arr) else 4):
            x1, y1, x2, y2 = np.clip(b[:4], 0, [w, h, w, h]).astype(int)
            self.map[y1:y2, x1:x2] += 1.0
        return self.map

    def render(self, img: np.ndarray, alpha: float = 0.5) -> np.ndarray:
        import cv2

        cmap = cv2.COLORMAP_JET if self.colormap is None else self.colormap
        norm = (255 * self.map / (self.map.max() + 1e-9)).astype(np.uint8)
        colored = cv2.applyColorMap(norm, cmap)
        return cv2.addWeighted(img, 1 - alpha, colored, alpha, 0)
