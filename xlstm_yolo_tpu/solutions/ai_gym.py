"""Workout repetition counting from pose keypoints
(parity: ref:ultralytics/solutions/ai_gym.py)."""

from __future__ import annotations

import numpy as np


def joint_angle(a, b, c) -> float:
    """Angle at b (degrees) of the a-b-c chain."""
    a, b, c = (np.asarray(p, np.float32) for p in (a, b, c))
    ba, bc = a - b, c - b
    cos = np.dot(ba, bc) / (np.linalg.norm(ba) * np.linalg.norm(bc) + 1e-9)
    return float(np.degrees(np.arccos(np.clip(cos, -1.0, 1.0))))


class AIGym:
    """Counts reps by thresholding a joint angle (up/down state machine)."""

    # keypoint index triples per exercise (COCO-17 ordering)
    KPTS = {"pushup": (5, 7, 9), "pullup": (5, 7, 9), "squat": (11, 13, 15)}

    def __init__(self, exercise: str = "pushup", up_angle: float = 145.0,
                 down_angle: float = 90.0):
        self.kpts = self.KPTS.get(exercise, (5, 7, 9))
        self.up_angle = up_angle
        self.down_angle = down_angle
        self.count: dict[int, int] = {}
        self.stage: dict[int, str] = {}

    def update(self, kpts_per_track: dict[int, np.ndarray]) -> dict[int, int]:
        """kpts_per_track: track_id -> (17, >=2) keypoints."""
        i, j, k = self.kpts
        for tid, kp in kpts_per_track.items():
            ang = joint_angle(kp[i, :2], kp[j, :2], kp[k, :2])
            stage = self.stage.get(tid, "up")
            if ang < self.down_angle and stage == "up":
                self.stage[tid] = "down"
            elif ang > self.up_angle and stage == "down":
                self.stage[tid] = "up"
                self.count[tid] = self.count.get(tid, 0) + 1
        return self.count
