"""Track-in-zone filter: run tracking only inside a polygon
(parity: ref:solutions/trackzone.py)."""

from __future__ import annotations

import numpy as np

from xlstm_yolo_tpu.solutions.base import BaseSolution


class TrackZone(BaseSolution):
    def __init__(self, region: list[tuple[float, float]], **kwargs):
        super().__init__(**kwargs)
        self.region = np.asarray(region, np.float32)

    def filter(self, tracks: np.ndarray) -> np.ndarray:
        t = np.asarray(tracks).reshape(-1, 7)
        keep = [self.point_in_polygon(c, self.region) for c in self.centers(t)]
        return t[np.asarray(keep, bool)] if len(t) else t
