"""Per-track speed estimation (parity: ref:solutions/speed_estimation.py).

Two APIs:
- ``estimate_speed(im0)`` — the reference flow: a track is speed-stamped
  once, when its displacement segment first crosses the configured
  region line, using wall-clock time between sightings
  (ref:speed_estimation.py:54-110);
- ``update(tracks)`` — the row-level variant using fps + px-per-meter
  calibration (km/h every frame), handy for synthetic tests.
"""

from __future__ import annotations

import time

import numpy as np

from xlstm_yolo_tpu.solutions.base import BaseSolution


class SpeedEstimator(BaseSolution):
    def __init__(self, fps: float = 30.0, px_per_meter: float = 10.0, **kwargs):
        super().__init__(**kwargs)
        self.initialize_region()
        self.fps = fps
        self.ppm = px_per_meter
        self.prev: dict[int, tuple[float, float]] = {}
        self.speeds: dict[int, float] = {}
        # reference-flow state
        self.spd: dict[int, float] = {}
        self.trk_pt: dict[int, float] = {}
        self.trk_pp: dict[int, tuple[float, float]] = {}
        self.trkd_ids: set[int] = set()

    def update(self, tracks: np.ndarray):
        """Calibrated km/h from per-frame center displacement."""
        for row in np.asarray(tracks).reshape(-1, tracks.shape[-1] if len(tracks) else 7):
            tid = int(row[4])
            cx, cy = (row[0] + row[2]) / 2, (row[1] + row[3]) / 2
            if tid in self.prev:
                px, py = self.prev[tid]
                dist_m = ((cx - px) ** 2 + (cy - py) ** 2) ** 0.5 / self.ppm
                self.speeds[tid] = dist_m * self.fps * 3.6  # km/h
            self.prev[tid] = (cx, cy)
        return dict(self.speeds)

    def estimate_speed(self, im0: np.ndarray, now: float | None = None) -> np.ndarray:
        """Reference flow: stamp speed at first region crossing."""
        tracks = self.extract_tracks(im0)
        self.draw_region(im0)
        for row in tracks:
            tid, cls = int(row[4]), int(row[6])
            line = self.store_tracking_history(tid, row[:4])
            self.trk_pt.setdefault(tid, 0.0)
            self.trk_pp.setdefault(tid, line[-1])
            label = (f"{int(self.spd[tid])} km/h" if tid in self.spd
                     else str(self.names.get(cls, cls)))
            self.box_label(im0, row[:4], label, self.color(tid))
            self.draw_centroid_and_tracks(im0, line, self.color(tid))
            if (self.segment_hits_region(self.trk_pp[tid], line[-1])
                    and tid not in self.trkd_ids):
                self.trkd_ids.add(tid)
                t = (now if now is not None else time.time())
                dt = t - self.trk_pt[tid]
                if dt > 0:
                    self.spd[tid] = abs(line[-1][1] - self.trk_pp[tid][1]) / dt
            self.trk_pt[tid] = now if now is not None else time.time()
            self.trk_pp[tid] = line[-1]
        self.display_output(im0)
        return im0
