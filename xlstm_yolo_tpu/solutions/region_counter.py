"""Per-region object counting (parity: ref:solutions/region_counter.py)."""

from __future__ import annotations

import numpy as np

from xlstm_yolo_tpu.solutions.base import BaseSolution


class RegionCounter(BaseSolution):
    def __init__(self, regions: dict[str, list], **kwargs):
        super().__init__(**kwargs)
        self.regions = {k: np.asarray(v, np.float32) for k, v in regions.items()}
        self.counts = {k: 0 for k in regions}

    def update(self, tracks: np.ndarray) -> dict[str, int]:
        cs = self.centers(tracks)
        self.counts = {
            name: int(sum(self.point_in_polygon(c, poly) for c in cs))
            for name, poly in self.regions.items()
        }
        return self.counts
