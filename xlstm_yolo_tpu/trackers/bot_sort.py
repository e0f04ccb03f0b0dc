"""BOT-SORT: ByteTrack + camera-motion compensation + optional ReID.

Parity: ref:ultralytics/trackers/bot_sort.py:147 and utils/gmc.py:11.
The GMC estimates a global affine between consecutive frames (sparse
optical flow on grayscale, downscaled) and warps predicted track means
before association.
"""

from __future__ import annotations

import cv2
import numpy as np

from xlstm_yolo_tpu.trackers import matching
from xlstm_yolo_tpu.trackers.byte_tracker import BYTETracker, STrack, TrackState
from xlstm_yolo_tpu.trackers.kalman_filter import KalmanFilterXYWH


class GMC:
    """Global (camera) motion compensation via sparse optical flow."""

    def __init__(self, method: str = "sparseOptFlow", downscale: int = 2):
        self.method = method
        self.downscale = max(1, int(downscale))
        self.prev_gray = None
        self.prev_pts = None

    def apply(self, frame: np.ndarray) -> np.ndarray:
        H = np.eye(2, 3, dtype=np.float32)
        if self.method == "none":
            return H
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        if self.downscale > 1:
            gray = cv2.resize(gray, (gray.shape[1] // self.downscale, gray.shape[0] // self.downscale))
        pts = cv2.goodFeaturesToTrack(
            gray, maxCorners=200, qualityLevel=0.01, minDistance=7, blockSize=7
        )
        if self.prev_gray is not None and self.prev_pts is not None and len(self.prev_pts) >= 4:
            nxt, status, _ = cv2.calcOpticalFlowPyrLK(self.prev_gray, gray, self.prev_pts, None)
            good_prev = self.prev_pts[status.flatten() == 1]
            good_next = nxt[status.flatten() == 1]
            if len(good_prev) >= 4:
                M, _ = cv2.estimateAffinePartial2D(good_prev, good_next, method=cv2.RANSAC)
                if M is not None:
                    H = M.astype(np.float32)
                    H[:, 2] *= self.downscale
        self.prev_gray = gray
        self.prev_pts = pts
        return H


class BOTrack(STrack):
    """STrack over (x, y, w, h) with appearance-feature smoothing."""

    shared_kalman = KalmanFilterXYWH()

    def __init__(self, xyxy, score, cls, feat=None, feat_history: int = 50):
        super().__init__(xyxy, score, cls)
        x1, y1, x2, y2 = xyxy
        self._xyah = np.array(
            [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], np.float32
        )  # actually xywh for this filter
        self.curr_feat = feat
        self.smooth_feat = feat
        self.alpha = 0.9

    def update_features(self, feat):
        feat = feat / (np.linalg.norm(feat) + 1e-9)
        self.curr_feat = feat
        self.smooth_feat = (
            feat if self.smooth_feat is None
            else self.alpha * self.smooth_feat + (1 - self.alpha) * feat
        )
        self.smooth_feat /= np.linalg.norm(self.smooth_feat) + 1e-9

    @property
    def xyxy(self):
        cx, cy, w, h = self.xyah  # mean stores xywh here
        return np.array([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], np.float32)


class BOTSORT(BYTETracker):
    def __init__(self, args=None, frame_rate: int = 30):
        super().__init__(args, frame_rate)
        a = args or {}
        get = (lambda k, d: getattr(a, k, d)) if not isinstance(a, dict) else (lambda k, d: a.get(k, d))
        self.proximity_thresh = get("proximity_thresh", 0.5)
        self.appearance_thresh = get("appearance_thresh", 0.25)
        self.with_reid = bool(get("with_reid", False))
        self.gmc = GMC(method=get("gmc_method", "sparseOptFlow"))

    def _kf(self):
        return KalmanFilterXYWH()

    def _new_strack(self, xyxy, score, cls, det):
        return BOTrack(xyxy, score, cls)

    def apply_gmc(self, tracks, img):
        H = self.gmc.apply(img)
        R, t = H[:2, :2], H[:2, 2]
        for trk in tracks:
            if trk.mean is not None:
                trk.mean[:2] = R @ trk.mean[:2] + t
                trk.mean[4:6] = R @ trk.mean[4:6]

    def get_dists(self, tracks, detections):
        dists = matching.iou_distance(tracks, detections)
        dists_mask = dists > (1 - self.proximity_thresh)
        dists = matching.fuse_score(dists, detections)
        if self.with_reid and tracks and detections and tracks[0].smooth_feat is not None:
            emb = matching.embedding_distance(tracks, detections) / 2.0
            emb[emb > self.appearance_thresh] = 1.0
            emb[dists_mask] = 1.0
            dists = np.minimum(dists, emb)
        return dists
