"""Per-region object counting (parity: ref:solutions/region_counter.py).

Counts, per video frame, the tracked objects whose box center falls in
each user polygon; counts reset every frame (the reference resets each
region's ``counts`` after display — ref:region_counter.py:100-115).
"""

from __future__ import annotations

import numpy as np

from xlstm_yolo_tpu.solutions.base import BaseSolution


class RegionCounter(BaseSolution):
    def __init__(self, regions: dict[str, list] | None = None, **kwargs):
        super().__init__(**kwargs)
        if regions is None:
            self.initialize_region()
            regions = {"Region#01": self.region}
        self.regions = {k: np.asarray(v, np.float32) for k, v in regions.items()}
        self.counts = {k: 0 for k in self.regions}

    def update(self, tracks: np.ndarray) -> dict[str, int]:
        """Per-frame containment counts from (N, 7) track rows."""
        cs = self.centers(tracks)
        self.counts = {
            name: int(sum(self.point_in_polygon(c, poly) for c in cs))
            for name, poly in self.regions.items()
        }
        return self.counts

    def count(self, im0: np.ndarray) -> np.ndarray:
        """Full per-frame flow: track -> count per region -> annotate
        (ref:region_counter.py:64-116 count)."""
        import cv2

        tracks = self.extract_tracks(im0)
        self.update(tracks)
        for i, (name, poly) in enumerate(self.regions.items(), start=1):
            color = self.color(i)
            cv2.polylines(im0, [poly.astype(np.int32)], True, color,
                          self.line_width * 2)
            x0, y0 = poly.min(0).astype(int)
            self.text_label(im0, (x0, max(y0 - 6, 14)),
                            f"{name}: {self.counts[name]}", color)
        for row in tracks:
            cls = int(row[6])
            self.box_label(im0, row[:4], self.names.get(cls, str(cls)),
                           self.color(cls))
        self.display_output(im0)
        return im0
