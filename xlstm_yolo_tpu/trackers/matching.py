"""Association cost matrices + linear assignment (host-side).

Parity: ref:ultralytics/trackers/utils/matching.py:20-150 — IoU/fused
score costs, scipy Hungarian assignment.
"""

from __future__ import annotations

import numpy as np
import scipy.optimize

from xlstm_yolo_tpu.utils.metrics import box_iou_matrix


def linear_assignment(cost: np.ndarray, thresh: float):
    """Returns (matches (K,2), unmatched_a, unmatched_b)."""
    if cost.size == 0:
        return (
            np.empty((0, 2), int),
            np.arange(cost.shape[0]),
            np.arange(cost.shape[1]),
        )
    row, col = scipy.optimize.linear_sum_assignment(cost)
    keep = cost[row, col] <= thresh
    matches = np.stack([row[keep], col[keep]], axis=1) if keep.any() else np.empty((0, 2), int)
    un_a = np.setdiff1d(np.arange(cost.shape[0]), matches[:, 0])
    un_b = np.setdiff1d(np.arange(cost.shape[1]), matches[:, 1])
    return matches, un_a, un_b


def iou_distance(atracks, btracks) -> np.ndarray:
    """1 - IoU between track xyxy boxes."""
    a = np.asarray([t.xyxy for t in atracks]).reshape(-1, 4)
    b = np.asarray([t.xyxy for t in btracks]).reshape(-1, 4)
    if len(a) == 0 or len(b) == 0:
        return np.ones((len(a), len(b)), np.float32)
    return 1.0 - box_iou_matrix(a, b)


def fuse_score(cost: np.ndarray, detections) -> np.ndarray:
    """Blend detection confidence into the IoU cost (byte_tracker style)."""
    if cost.size == 0:
        return cost
    scores = np.asarray([d.score for d in detections])
    sim = (1 - cost) * scores[None, :]
    return 1 - sim


def embedding_distance(tracks, detections, metric: str = "cosine") -> np.ndarray:
    """Appearance cost from ReID features (BOT-SORT)."""
    cost = np.ones((len(tracks), len(detections)), np.float32)
    if cost.size == 0:
        return cost
    det_feats = np.asarray([d.curr_feat for d in detections], np.float32)
    trk_feats = np.asarray([t.smooth_feat for t in tracks], np.float32)
    if metric == "cosine":
        a = trk_feats / (np.linalg.norm(trk_feats, axis=1, keepdims=True) + 1e-9)
        b = det_feats / (np.linalg.norm(det_feats, axis=1, keepdims=True) + 1e-9)
        cost = np.maximum(0.0, 1.0 - a @ b.T)
    else:
        from scipy.spatial.distance import cdist

        cost = np.maximum(0.0, cdist(trk_feats, det_feats, metric))
    return cost
