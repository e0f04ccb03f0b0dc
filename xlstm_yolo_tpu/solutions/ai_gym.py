"""Workout repetition counting from pose keypoints
(parity: ref:ultralytics/solutions/ai_gym.py).

``update`` is the pure per-track state machine (angle threshold up/down
-> rep count); ``monitor(im0)`` is the reference flow: run the pose
model's tracker on the frame, estimate the joint angle per person, and
annotate angle / reps / stage next to the monitored joint
(ref:ai_gym.py:55-111).
"""

from __future__ import annotations

import numpy as np

from xlstm_yolo_tpu.solutions.base import BaseSolution


def joint_angle(a, b, c) -> float:
    """Angle at b (degrees) of the a-b-c chain."""
    a, b, c = (np.asarray(p, np.float32) for p in (a, b, c))
    ba, bc = a - b, c - b
    cos = np.dot(ba, bc) / (np.linalg.norm(ba) * np.linalg.norm(bc) + 1e-9)
    return float(np.degrees(np.arccos(np.clip(cos, -1.0, 1.0))))


class AIGym(BaseSolution):
    """Counts reps by thresholding a joint angle (up/down state machine)."""

    # keypoint index triples per exercise (COCO-17 ordering)
    KPTS = {"pushup": (5, 7, 9), "pullup": (5, 7, 9), "squat": (11, 13, 15),
            "abworkout": (5, 11, 13)}

    def __init__(self, exercise: str = "pushup", up_angle: float = 145.0,
                 down_angle: float = 90.0, **kwargs):
        super().__init__(**kwargs)
        self.kpts = self.KPTS.get(exercise, (5, 7, 9))
        self.up_angle = up_angle
        self.down_angle = down_angle
        self.count: dict[int, int] = {}
        self.stage: dict[int, str] = {}
        self.angle: dict[int, float] = {}

    def update(self, kpts_per_track: dict[int, np.ndarray]) -> dict[int, int]:
        """kpts_per_track: track_id -> (17, >=2) keypoints."""
        i, j, k = self.kpts
        for tid, kp in kpts_per_track.items():
            ang = joint_angle(kp[i, :2], kp[j, :2], kp[k, :2])
            self.angle[tid] = ang
            stage = self.stage.get(tid, "up")
            if ang < self.down_angle and stage == "up":
                self.stage[tid] = "down"
            elif ang > self.up_angle and stage == "down":
                self.stage[tid] = "up"
                self.count[tid] = self.count.get(tid, 0) + 1
        return self.count

    def monitor(self, im0: np.ndarray) -> np.ndarray:
        """Pose-track the frame, update reps, annotate per person."""
        results = self.model.track(im0, stream=False, conf=self.conf)
        r = results[0] if isinstance(results, list) else results
        b, kp = r.boxes, r.keypoints
        if b is None or kp is None or len(b) == 0 or b.data.shape[-1] < 7:
            self.display_output(im0)
            return im0
        rows = np.asarray(b.data, np.float32)
        kdata = np.asarray(kp.data, np.float32)  # (N, K, 2/3)
        per_track = {int(rw[4]): kdata[n] for n, rw in enumerate(rows)}
        self.update(per_track)
        for n, rw in enumerate(rows):
            tid = int(rw[4])
            self.box_label(im0, rw[:4], f"id {tid}", self.color(tid))
            jx, jy = kdata[n, self.kpts[1], :2]
            self.text_label(
                im0, (int(jx), int(jy)),
                f"{self.angle.get(tid, 0):.0f}deg "
                f"reps {self.count.get(tid, 0)} {self.stage.get(tid, 'up')}",
                self.color(tid))
        self.display_output(im0)
        return im0
