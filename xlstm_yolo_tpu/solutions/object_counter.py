"""Line/region crossing counter over tracked detections.

Parity: ref:ultralytics/solutions/object_counter.py semantics — counts
in/out crossings of a user line using per-track center history.
"""

from __future__ import annotations

import numpy as np


class ObjectCounter:
    def __init__(self, line: tuple[tuple[float, float], tuple[float, float]],
                 classes: list[int] | None = None):
        (self.x1, self.y1), (self.x2, self.y2) = line
        self.classes = set(classes) if classes else None
        self.history: dict[int, float] = {}  # track_id -> last side
        self.in_count = 0
        self.out_count = 0
        self.counted: set[int] = set()

    def _side(self, cx: float, cy: float) -> float:
        return np.sign((self.x2 - self.x1) * (cy - self.y1) - (self.y2 - self.y1) * (cx - self.x1))

    def update(self, tracks: np.ndarray):
        """tracks: (N, 7+) rows [xyxy, track_id, conf, cls]."""
        for row in np.asarray(tracks).reshape(-1, tracks.shape[-1] if len(tracks) else 7):
            tid = int(row[4])
            cls = int(row[6]) if row.shape[-1] > 6 else -1
            if self.classes is not None and cls not in self.classes:
                continue
            cx, cy = (row[0] + row[2]) / 2, (row[1] + row[3]) / 2
            side = self._side(cx, cy)
            prev = self.history.get(tid)
            if prev is not None and side != 0 and prev != 0 and side != prev and tid not in self.counted:
                if side > prev:
                    self.in_count += 1
                else:
                    self.out_count += 1
                self.counted.add(tid)
            self.history[tid] = side
        return self.in_count, self.out_count
