"""Pairwise distance between two selected tracks
(parity: ref:solutions/distance_calculation.py)."""

from __future__ import annotations

import numpy as np

from xlstm_yolo_tpu.solutions.base import BaseSolution


class DistanceCalculation(BaseSolution):
    def __init__(self, px_per_meter: float = 10.0, **kwargs):
        super().__init__(**kwargs)
        self.ppm = px_per_meter
        self.selected: list[int] = []

    def select(self, track_id: int):
        if track_id in self.selected:
            self.selected.remove(track_id)
        elif len(self.selected) < 2:
            self.selected.append(track_id)

    def update(self, tracks: np.ndarray) -> float | None:
        if len(self.selected) != 2:
            return None
        t = np.asarray(tracks).reshape(-1, 7)
        cs = {int(r[4]): c for r, c in zip(t, self.centers(t))}
        a, b = self.selected
        if a not in cs or b not in cs:
            return None
        d_px = float(np.linalg.norm(np.asarray(cs[a]) - np.asarray(cs[b])))
        return d_px / self.ppm
