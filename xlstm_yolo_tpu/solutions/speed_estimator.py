"""Per-track speed estimation from center displacement (solutions parity)."""

from __future__ import annotations

import numpy as np


class SpeedEstimator:
    def __init__(self, fps: float = 30.0, px_per_meter: float = 10.0):
        self.fps = fps
        self.ppm = px_per_meter
        self.prev: dict[int, tuple[float, float]] = {}
        self.speeds: dict[int, float] = {}

    def update(self, tracks: np.ndarray):
        for row in np.asarray(tracks).reshape(-1, tracks.shape[-1] if len(tracks) else 7):
            tid = int(row[4])
            cx, cy = (row[0] + row[2]) / 2, (row[1] + row[3]) / 2
            if tid in self.prev:
                px, py = self.prev[tid]
                dist_m = ((cx - px) ** 2 + (cy - py) ** 2) ** 0.5 / self.ppm
                self.speeds[tid] = dist_m * self.fps * 3.6  # km/h
            self.prev[tid] = (cx, cy)
        return dict(self.speeds)
