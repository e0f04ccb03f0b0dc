"""BaseSolution: model + tracker plumbing every solution shares.

Parity: ref:ultralytics/solutions/solutions.py BaseSolution — resolves
the YOLO model, runs track() per frame, and hands subclasses the
(N, 7) [xyxy, track_id, conf, cls] rows plus drawing helpers.  The
reference leans on shapely for region geometry; that package is not in
this image, so the same predicates (point-in-polygon, segment/segment
and segment/polygon intersection) are implemented in numpy below.
"""

from __future__ import annotations

import numpy as np


class BaseSolution:
    def __init__(self, model: str | None = None, classes: list[int] | None = None,
                 conf: float = 0.25, region=None, line_width: int = 2,
                 names: dict | None = None, show: bool = False, **kwargs):
        self.classes = set(classes) if classes else None
        self.conf = conf
        self._model = None
        self._model_name = model
        self.region = None if region is None else [tuple(p) for p in region]
        self.line_width = line_width
        self.names = names or {}
        self.show = show
        # per-track center history, capped at 30 points like the
        # reference's store_tracking_history (ref:solutions.py:126-145)
        self.track_history: dict[int, list[tuple[float, float]]] = {}
        self.track_line: list[tuple[float, float]] | None = None

    @property
    def model(self):
        if self._model is None and self._model_name:
            from xlstm_yolo_tpu.engine.model import YOLO

            self._model = YOLO(self._model_name)
            if not self.names:
                self.names = getattr(self._model, "names", {}) or {}
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

    def store_tracking_history(self, track_id: int, box) -> list[tuple[float, float]]:
        """Append box center to the track's history (30-point cap)."""
        line = self.track_history.setdefault(int(track_id), [])
        line.append((float(box[0] + box[2]) / 2, float(box[1] + box[3]) / 2))
        if len(line) > 30:
            line.pop(0)
        self.track_line = line
        return line

    def initialize_region(self):
        """Default counting region (ref:solutions.py:147-153)."""
        if self.region is None:
            self.region = [(20, 400), (1080, 400), (1080, 360), (20, 360)]
        return self.region

    # ------------------------------------------------------------------
    # numpy geometry (shapely replacement)
    # ------------------------------------------------------------------

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

    @staticmethod
    def segments_intersect(p1, p2, q1, q2) -> bool:
        """Proper/improper intersection of segments p1p2 and q1q2."""

        def orient(a, b, c):
            v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
            return 0 if abs(v) < 1e-12 else (1 if v > 0 else -1)

        def on_seg(a, b, c):
            return (min(a[0], b[0]) - 1e-9 <= c[0] <= max(a[0], b[0]) + 1e-9
                    and min(a[1], b[1]) - 1e-9 <= c[1] <= max(a[1], b[1]) + 1e-9)

        o1, o2 = orient(p1, p2, q1), orient(p1, p2, q2)
        o3, o4 = orient(q1, q2, p1), orient(q1, q2, p2)
        if o1 != o2 and o3 != o4:
            return True
        return ((o1 == 0 and on_seg(p1, p2, q1)) or (o2 == 0 and on_seg(p1, p2, q2))
                or (o3 == 0 and on_seg(q1, q2, p1)) or (o4 == 0 and on_seg(q1, q2, p2)))

    def segment_hits_region(self, a, b) -> bool:
        """Does segment a->b intersect the region (line or polygon edge)?"""
        reg = self.region
        if reg is None:
            return False
        n = len(reg)
        edges = [(reg[i], reg[(i + 1) % n]) for i in range(n)] if n >= 3 else [(reg[0], reg[1])]
        return any(self.segments_intersect(a, b, e0, e1) for e0, e1 in edges)

    # ------------------------------------------------------------------
    # cv2 annotation helpers (the reference's Annotator plumbing)
    # ------------------------------------------------------------------

    @staticmethod
    def color(idx: int) -> tuple[int, int, int]:
        """Deterministic per-index BGR color (ref:utils/plotting.colors)."""
        palette = [
            (56, 56, 255), (151, 157, 255), (31, 112, 255), (29, 178, 255),
            (49, 210, 207), (10, 249, 72), (23, 204, 146), (134, 219, 61),
            (52, 147, 26), (187, 212, 0), (168, 153, 44), (255, 194, 0),
            (147, 69, 52), (255, 115, 100), (236, 24, 0), (255, 56, 132),
            (133, 0, 82), (255, 56, 203), (200, 149, 255), (199, 55, 255),
        ]
        return palette[int(idx) % len(palette)]

    def draw_region(self, im, color=(104, 0, 123), thickness=None):
        import cv2

        if self.region is None:
            return im
        pts = np.asarray(self.region, np.int32)
        t = thickness or self.line_width * 2
        if len(pts) >= 3:
            cv2.polylines(im, [pts], True, color, t)
        else:
            cv2.line(im, tuple(pts[0]), tuple(pts[1]), color, t)
        return im

    def box_label(self, im, box, label: str = "", color=(128, 128, 128)):
        import cv2

        x1, y1, x2, y2 = map(int, box[:4])
        cv2.rectangle(im, (x1, y1), (x2, y2), color, self.line_width)
        if label:
            cv2.putText(im, label, (x1, max(y1 - 4, 12)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
        return im

    def draw_centroid_and_tracks(self, im, line, color=(255, 0, 255)):
        import cv2

        if not line:
            return im
        pts = np.asarray(line, np.int32).reshape(-1, 1, 2)
        cv2.polylines(im, [pts], False, color, self.line_width)
        cv2.circle(im, tuple(pts[-1, 0]), self.line_width * 2, color, -1)
        return im

    def text_label(self, im, pos, label: str, color=(104, 31, 17)):
        import cv2

        cv2.putText(im, label, (int(pos[0]), int(pos[1])),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.7, color, 2)
        return im

    def display_output(self, im0):
        """Show the frame when show=True and a display exists
        (ref:solutions.py:155-178; headless environments no-op)."""
        if not self.show:
            return
        try:
            import cv2

            cv2.imshow("xlstm-yolo solutions", im0)
            cv2.waitKey(1)
        except Exception:
            pass
