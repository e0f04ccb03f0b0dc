"""Accumulated detection-density heatmap (solutions/heatmap.py parity)."""

from __future__ import annotations

import numpy as np


class Heatmap:
    def __init__(self, shape: tuple[int, int], decay: float = 0.99):
        self.map = np.zeros(shape, np.float32)
        self.decay = decay

    def update(self, boxes: np.ndarray):
        """boxes: (N, 4+) xyxy in image units."""
        self.map *= self.decay
        h, w = self.map.shape
        for b in np.asarray(boxes).reshape(-1, boxes.shape[-1] if len(boxes) else 4):
            x1, y1, x2, y2 = np.clip(b[:4], 0, [w, h, w, h]).astype(int)
            self.map[y1:y2, x1:x2] += 1.0
        return self.map

    def render(self, img: np.ndarray, alpha: float = 0.5) -> np.ndarray:
        import cv2

        norm = (255 * self.map / (self.map.max() + 1e-9)).astype(np.uint8)
        colored = cv2.applyColorMap(norm, cv2.COLORMAP_JET)
        return cv2.addWeighted(img, 1 - alpha, colored, alpha, 0)
