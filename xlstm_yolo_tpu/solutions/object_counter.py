"""Line/region crossing counter over tracked detections.

Parity: ref:ultralytics/solutions/object_counter.py ObjectCounter —
a 2-point region counts directed line crossings from per-track center
history; a >=3-point polygon region counts entries/exits; counts are
kept in total and per class, and ``annotate`` draws the region +
IN/OUT banner like the reference's annotator plumbing.
"""

from __future__ import annotations

import numpy as np

from xlstm_yolo_tpu.solutions.base import BaseSolution


class ObjectCounter(BaseSolution):
    def __init__(self, line=None, region=None, classes=None, names: dict | None = None,
                 **kwargs):
        super().__init__(classes=classes, **kwargs)
        region = region if region is not None else line
        if region is None:
            raise ValueError("ObjectCounter needs a 2-point line or >=3-point region")
        self.region = np.asarray(region, np.float32)
        self.line_mode = len(self.region) == 2
        self.names = names or {}
        self.history: dict[int, float | bool] = {}  # track_id -> last side/inside
        self.in_count = 0
        self.out_count = 0
        self.classwise_counts: dict[str, dict[str, int]] = {}
        self.counted: set[int] = set()

    def _side(self, cx: float, cy: float) -> float:
        (x1, y1), (x2, y2) = self.region
        return float(np.sign((x2 - x1) * (cy - y1) - (y2 - y1) * (cx - x1)))

    def _bump(self, cls_id: int, direction: str):
        if direction == "in":
            self.in_count += 1
        else:
            self.out_count += 1
        name = self.names.get(cls_id, str(cls_id))
        d = self.classwise_counts.setdefault(name, {"IN": 0, "OUT": 0})
        d["IN" if direction == "in" else "OUT"] += 1

    def update(self, tracks: np.ndarray):
        """tracks: (N, 7+) rows [xyxy, track_id, conf, cls]."""
        for row in np.asarray(tracks).reshape(-1, tracks.shape[-1] if len(tracks) else 7):
            tid = int(row[4])
            cls = int(row[6]) if row.shape[-1] > 6 else -1
            if self.classes is not None and cls not in self.classes:
                continue
            cx, cy = (row[0] + row[2]) / 2, (row[1] + row[3]) / 2
            if self.line_mode:
                side = self._side(cx, cy)
                prev = self.history.get(tid)
                if (prev is not None and side != 0 and prev != 0
                        and side != prev and tid not in self.counted):
                    self._bump(cls, "in" if side > prev else "out")
                    self.counted.add(tid)
                self.history[tid] = side
            else:
                inside = self.point_in_polygon((cx, cy), self.region)
                prev = self.history.get(tid)
                if prev is not None and inside != prev and tid not in self.counted:
                    self._bump(cls, "in" if inside else "out")
                    self.counted.add(tid)
                self.history[tid] = inside
        return self.in_count, self.out_count

    def annotate(self, im0: np.ndarray) -> np.ndarray:
        """Draw the region and the IN/OUT banner (reference display_counts)."""
        import cv2

        im = im0.copy()
        pts = self.region.astype(np.int32)
        if self.line_mode:
            cv2.line(im, tuple(pts[0]), tuple(pts[1]), (104, 31, 17), 2)
        else:
            cv2.polylines(im, [pts], True, (104, 31, 17), 2)
        txt = f"IN {self.in_count} OUT {self.out_count}"
        cv2.putText(im, txt, (12, 28), cv2.FONT_HERSHEY_SIMPLEX, 0.8,
                    (104, 31, 17), 2)
        y = 52
        for name, d in self.classwise_counts.items():
            cv2.putText(im, f"{name}: IN {d['IN']} OUT {d['OUT']}", (12, y),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.6, (104, 31, 17), 1)
            y += 22
        return im

    def process(self, im0: np.ndarray) -> np.ndarray:
        """Full per-frame flow: track -> count -> annotate."""
        self.update(self.extract_tracks(im0))
        return self.annotate(im0)
