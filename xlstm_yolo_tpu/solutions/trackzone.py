"""Track-in-zone: run tracking only inside a polygon
(parity: ref:solutions/trackzone.py).

The reference masks the frame to the region's convex hull BEFORE
tracking so detections outside the zone never exist
(ref:trackzone.py:37-60); ``trackzone`` reproduces that.  ``filter``
is the post-hoc variant for callers that already have track rows.
"""

from __future__ import annotations

import numpy as np

from xlstm_yolo_tpu.solutions.base import BaseSolution


class TrackZone(BaseSolution):
    def __init__(self, region: list[tuple[float, float]] | None = None, **kwargs):
        super().__init__(**kwargs)
        if region is None:
            region = [(150, 150), (1130, 150), (1130, 570), (150, 570)]
        self.region = np.asarray(region, np.float32)

    def filter(self, tracks: np.ndarray) -> np.ndarray:
        t = np.asarray(tracks).reshape(-1, 7)
        keep = [self.point_in_polygon(c, self.region) for c in self.centers(t)]
        return t[np.asarray(keep, bool)] if len(t) else t

    def trackzone(self, im0: np.ndarray) -> np.ndarray:
        """Mask outside the zone's convex hull, track, annotate."""
        import cv2

        hull = cv2.convexHull(self.region.astype(np.int32))
        mask = cv2.fillPoly(np.zeros_like(im0[:, :, 0]), [hull], 255)
        masked = cv2.bitwise_and(im0, im0, mask=mask)
        tracks = self.extract_tracks(masked)
        cv2.polylines(im0, [hull], True, (255, 255, 255), self.line_width * 2)
        for row in tracks:
            tid, cls = int(row[4]), int(row[6])
            self.box_label(im0, row[:4],
                           f"{self.names.get(cls, cls)}:{tid}", self.color(tid))
        self.display_output(im0)
        return im0
