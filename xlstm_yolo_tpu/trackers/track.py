"""Predictor <-> tracker integration (parity: ref:ultralytics/trackers/track.py:18-80).

The reference wires trackers through predictor callbacks; here the
tracking loop wraps the streaming predictor generator directly: per
frame, detection results are rewritten with track ids from the
per-stream tracker instance.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import yaml

from xlstm_yolo_tpu.trackers.bot_sort import BOTSORT
from xlstm_yolo_tpu.trackers.byte_tracker import BYTETracker

TRACKER_MAP = {"bytetrack": BYTETracker, "botsort": BOTSORT}
CFG_TRACKERS = Path(__file__).resolve().parents[1] / "cfg" / "trackers"


def load_tracker_cfg(tracker: str | dict) -> dict:
    if isinstance(tracker, dict):
        return dict(tracker)
    p = Path(tracker)
    if not p.exists():
        p = CFG_TRACKERS / p.name
    with open(p) as fh:
        return yaml.safe_load(fh)


def make_tracker(tracker: str | dict = "bytetrack.yaml", frame_rate: int = 30):
    cfg = load_tracker_cfg(tracker)
    ttype = cfg.get("tracker_type", "bytetrack")
    if ttype not in TRACKER_MAP:
        raise ValueError(f"unknown tracker_type '{ttype}' (use bytetrack|botsort)")
    return TRACKER_MAP[ttype](cfg, frame_rate=frame_rate)


def run_tracker(model, source, tracker: str = "bytetrack.yaml", stream: bool = False,
                persist: bool = False, **kwargs):
    """Yield/collect Results whose boxes carry track ids (col 4)."""
    trk = make_tracker(tracker)

    def gen():
        for r in model.predict(source, stream=True, **kwargs):
            det = r.boxes.data if r.boxes is not None else np.zeros((0, 6), np.float32)
            tracks = trk.update(det[:, :6], r.orig_img)
            if len(tracks):
                # tracks: [xyxy, id, score, cls, det_idx] -> Results layout
                boxes = np.concatenate(
                    [tracks[:, :4], tracks[:, 4:5], tracks[:, 5:6], tracks[:, 6:7]], axis=1
                )  # xyxy, id, conf, cls
                r.update(boxes)
            else:
                r.update(np.zeros((0, 7), np.float32))
            yield r

    return gen() if stream else list(gen())
