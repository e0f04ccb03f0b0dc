"""BaseSolution: model + tracker plumbing every solution shares.

Parity: ref:ultralytics/solutions/solutions.py BaseSolution — resolves
the YOLO model, runs track() per frame, and hands subclasses the
(N, 7) [xyxy, track_id, conf, cls] rows plus drawing helpers.
"""

from __future__ import annotations

import numpy as np


class BaseSolution:
    def __init__(self, model: str | None = None, classes: list[int] | None = None,
                 conf: float = 0.25, **kwargs):
        self.classes = set(classes) if classes else None
        self.conf = conf
        self._model = None
        self._model_name = model

    @property
    def model(self):
        if self._model is None and self._model_name:
            from xlstm_yolo_tpu.engine.model import YOLO

            self._model = YOLO(self._model_name)
        return self._model

    def extract_tracks(self, im0) -> np.ndarray:
        """Run tracking on one frame -> (N, 7) [xyxy, id, conf, cls]."""
        results = self.model.track(im0, stream=False, conf=self.conf)
        r = results[0] if isinstance(results, list) else results
        b = r.boxes
        if b is None or len(b) == 0 or b.data.shape[-1] < 7:
            return np.zeros((0, 7), np.float32)
        rows = np.asarray(b.data, np.float32)
        if self.classes is not None:
            rows = rows[np.isin(rows[:, 6].astype(int), list(self.classes))]
        return rows

    @staticmethod
    def centers(tracks: np.ndarray) -> np.ndarray:
        t = np.asarray(tracks).reshape(-1, 7)
        return np.stack([(t[:, 0] + t[:, 2]) / 2, (t[:, 1] + t[:, 3]) / 2], -1)

    @staticmethod
    def point_in_polygon(pt, poly) -> bool:
        x, y = pt
        poly = np.asarray(poly, np.float32)
        n = len(poly)
        inside = False
        j = n - 1
        for i in range(n):
            xi, yi = poly[i]
            xj, yj = poly[j]
            if (yi > y) != (yj > y) and x < (xj - xi) * (y - yi) / (yj - yi + 1e-9) + xi:
                inside = not inside
            j = i
        return inside
