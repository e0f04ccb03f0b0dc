"""Queue length monitoring in a polygon region
(parity: ref:ultralytics/solutions/queue_management.py).

``process_queue`` mirrors the reference flow (ref:queue_management.py:
60-112): per frame the count is the number of tracked objects whose
center is inside the region AND that have >=2 points of history (a
fresh detection does not count until it has been tracked a frame).
``update`` keeps the row-level API plus per-track dwell frames.
"""

from __future__ import annotations

import numpy as np

from xlstm_yolo_tpu.solutions.base import BaseSolution


class QueueManager(BaseSolution):
    def __init__(self, region: list[tuple[float, float]] | None = None, **kwargs):
        super().__init__(**kwargs)
        if region is None:
            self.initialize_region()
        else:
            self.region = [tuple(p) for p in region]
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

    def process_queue(self, im0: np.ndarray) -> np.ndarray:
        """Track -> count-in-region (history >= 2) -> annotate."""
        self.queue_count = 0
        tracks = self.extract_tracks(im0)
        self.draw_region(im0, color=(255, 60, 255))
        for row in tracks:
            tid, cls = int(row[4]), int(row[6])
            self.box_label(im0, row[:4], self.names.get(cls, str(cls)),
                           self.color(tid))
            line = self.store_tracking_history(tid, row[:4])
            self.draw_centroid_and_tracks(im0, line, self.color(tid))
            if len(line) > 1 and self.point_in_polygon(line[-1], self.region):
                self.queue_count += 1
        x0 = int(min(p[0] for p in self.region))
        y0 = int(min(p[1] for p in self.region))
        self.text_label(im0, (x0, max(y0 - 8, 16)),
                        f"Queue Counts : {self.queue_count}")
        self.display_output(im0)
        return im0
