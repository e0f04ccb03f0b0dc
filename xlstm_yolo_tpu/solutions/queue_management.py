"""Queue length monitoring in a polygon region
(parity: ref:ultralytics/solutions/queue_management.py)."""

from __future__ import annotations

import numpy as np

from xlstm_yolo_tpu.solutions.base import BaseSolution


class QueueManager(BaseSolution):
    def __init__(self, region: list[tuple[float, float]], **kwargs):
        super().__init__(**kwargs)
        self.region = np.asarray(region, np.float32)
        self.queue_count = 0
        self.history: dict[int, int] = {}  # frames-in-queue per track

    def update(self, tracks: np.ndarray) -> int:
        tracks = np.asarray(tracks).reshape(-1, 7)
        inside_ids = []
        for row, c in zip(tracks, self.centers(tracks)):
            if self.point_in_polygon(c, self.region):
                inside_ids.append(int(row[4]))
        for tid in inside_ids:
            self.history[tid] = self.history.get(tid, 0) + 1
        for tid in list(self.history):
            if tid not in inside_ids:
                del self.history[tid]
        self.queue_count = len(inside_ids)
        return self.queue_count
