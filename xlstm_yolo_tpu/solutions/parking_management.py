"""Parking occupancy monitoring
(parity: ref:ultralytics/solutions/parking_management.py).

``ParkingManagement.process_data(im0)`` reproduces the reference flow:
slots come from a JSON file of ``{"points": [[x, y], ...]}`` polygons,
each slot is occupied when any detection center lies inside it, and the
frame is annotated with green/red slot outlines plus an
Occupancy/Available banner (ref:parking_management.py:160-246).

The reference's ``ParkingPtsSelection`` is a tkinter click-UI for
authoring that JSON; headless environments get ``save_slots`` — the
same JSON writer fed with programmatic points (the tkinter canvas
itself is display-only plumbing).
"""

from __future__ import annotations

import json

import numpy as np

from xlstm_yolo_tpu.solutions.base import BaseSolution


def save_slots(boxes: list[list[tuple[int, int]]], path: str = "bounding_boxes.json"):
    """Write slot polygons in the reference's JSON schema
    (ref:parking_management.py:148-158 save_to_json)."""
    data = [{"points": [(int(x), int(y)) for x, y in box]} for box in boxes]
    with open(path, "w", encoding="utf-8") as f:
        json.dump(data, f, indent=4)


class ParkingManagement(BaseSolution):
    def __init__(self, json_file: str | None = None, slots: list | None = None,
                 **kwargs):
        super().__init__(**kwargs)
        if json_file is not None:
            with open(json_file) as f:
                self.slots = json.load(f)
        elif slots is not None:
            self.slots = [{"points": list(map(tuple, s))} for s in slots]
        else:
            raise ValueError("ParkingManagement needs json_file or slots")
        self.pr_info = {"Occupancy": 0, "Available": 0}
        self.arc = (0, 0, 255)   # available slot outline (reference colors)
        self.occ = (0, 255, 0)   # occupied slot outline

    def update(self, tracks: np.ndarray) -> dict[str, int]:
        """Occupancy from (N, 7) rows: a slot is occupied when any
        detection center is inside its polygon."""
        cs = self.centers(tracks)
        filled = sum(
            any(self.point_in_polygon(c, s["points"]) for c in cs)
            for s in self.slots
        )
        self.pr_info = {"Occupancy": int(filled),
                        "Available": len(self.slots) - int(filled)}
        return self.pr_info

    def process_data(self, im0: np.ndarray) -> np.ndarray:
        """Track -> slot occupancy -> annotated frame."""
        import cv2

        tracks = self.extract_tracks(im0)
        cs = self.centers(tracks)
        filled = 0
        for s in self.slots:
            pts = np.asarray(s["points"], np.int32).reshape(-1, 1, 2)
            occupied = False
            for row, c in zip(tracks, cs):
                if self.point_in_polygon(c, s["points"]):
                    occupied = True
                    cls = int(row[6])
                    self.text_label(im0, (int(c[0]), int(c[1])),
                                    str(self.names.get(cls, cls)))
                    break
            filled += occupied
            cv2.polylines(im0, [pts], True,
                          self.occ if occupied else self.arc, 2)
        self.pr_info = {"Occupancy": int(filled),
                        "Available": len(self.slots) - int(filled)}
        self.text_label(
            im0, (12, 28),
            f"Occupancy: {self.pr_info['Occupancy']}  "
            f"Available: {self.pr_info['Available']}")
        self.display_output(im0)
        return im0
