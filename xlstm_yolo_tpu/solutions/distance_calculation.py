"""Pairwise distance between two selected tracks
(parity: ref:solutions/distance_calculation.py).

The reference selects tracks by mouse click; here ``select(track_id)``
is the selection primitive (``mouse_event`` adapts cv2 callbacks to
it), ``update`` returns meters between the two selected centroids, and
``process(im0)`` runs the full annotated flow
(ref:distance_calculation.py:60-124 calculate).
"""

from __future__ import annotations

import numpy as np

from xlstm_yolo_tpu.solutions.base import BaseSolution


class DistanceCalculation(BaseSolution):
    def __init__(self, px_per_meter: float = 10.0, **kwargs):
        super().__init__(**kwargs)
        self.ppm = px_per_meter
        self.selected: list[int] = []
        self.last_tracks: np.ndarray = np.zeros((0, 7), np.float32)

    def select(self, track_id: int):
        if track_id in self.selected:
            self.selected.remove(track_id)
        elif len(self.selected) < 2:
            self.selected.append(track_id)

    def mouse_event(self, event: int, x: float, y: float, *_args):
        """cv2 mouse callback: left-click inside a box selects its track;
        right-click clears (ref:distance_calculation.py:50-76)."""
        import cv2

        if event == cv2.EVENT_LBUTTONDOWN:
            for row in self.last_tracks:
                if row[0] < x < row[2] and row[1] < y < row[3]:
                    self.select(int(row[4]))
                    break
        elif event == cv2.EVENT_RBUTTONDOWN:
            self.selected.clear()

    def update(self, tracks: np.ndarray) -> float | None:
        self.last_tracks = np.asarray(tracks).reshape(-1, 7)
        if len(self.selected) != 2:
            return None
        t = self.last_tracks
        cs = {int(r[4]): c for r, c in zip(t, self.centers(t))}
        a, b = self.selected
        if a not in cs or b not in cs:
            return None
        d_px = float(np.linalg.norm(np.asarray(cs[a]) - np.asarray(cs[b])))
        return d_px / self.ppm

    def process(self, im0: np.ndarray) -> np.ndarray:
        """Track, annotate all boxes, draw the selected pair's distance."""
        import cv2

        tracks = self.extract_tracks(im0)
        d = self.update(tracks)
        for row in tracks:
            tid, cls = int(row[4]), int(row[6])
            lbl = str(self.names.get(cls, cls))
            if tid in self.selected:
                lbl += " [selected]"
            self.box_label(im0, row[:4], lbl, self.color(tid))
        if d is not None:
            cs = {int(r[4]): c for r, c in zip(tracks, self.centers(tracks))}
            p0, p1 = (tuple(map(int, cs[t])) for t in self.selected)
            cv2.line(im0, p0, p1, (255, 0, 255), self.line_width)
            cv2.circle(im0, p0, 4, (255, 0, 255), -1)
            cv2.circle(im0, p1, 4, (255, 0, 255), -1)
            self.text_label(im0, ((p0[0] + p1[0]) // 2, (p0[1] + p1[1]) // 2 - 8),
                            f"{d:.2f} m", (255, 0, 255))
        self.display_output(im0)
        return im0
