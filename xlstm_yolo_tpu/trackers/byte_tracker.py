"""BYTETracker: two-stage association over high/low-confidence detections.

Re-derivation of the ByteTrack algorithm (Zhang et al. 2022) with the
same interface as ref:ultralytics/trackers/byte_tracker.py:12-380:
``update(results, img)`` consumes one frame's (N, 6) detections
[xyxy, conf, cls] and returns (M, 7+) [xyxy, track_id, conf, cls, det_idx].
"""

from __future__ import annotations

import numpy as np

from xlstm_yolo_tpu.trackers import matching
from xlstm_yolo_tpu.trackers.kalman_filter import KalmanFilterXYAH


class TrackState:
    New = 0
    Tracked = 1
    Lost = 2
    Removed = 3


class STrack:
    """Single tracked object with shared-per-tracker Kalman filter."""

    _count = 0
    shared_kalman = KalmanFilterXYAH()

    def __init__(self, xyxy, score, cls):
        x1, y1, x2, y2 = xyxy
        # store as (cx, cy, a, h)
        w, h = x2 - x1, y2 - y1
        self._xyah = np.array([x1 + w / 2, y1 + h / 2, w / max(h, 1e-6), h], np.float32)
        self.score = float(score)
        self.cls = int(cls)
        self.idx = -1  # detection index within the frame
        self.mean = None
        self.covariance = None
        self.kalman_filter = None
        self.track_id = 0
        self.state = TrackState.New
        self.is_activated = False
        self.frame_id = 0
        self.start_frame = 0
        self.tracklet_len = 0

    # -- geometry -----------------------------------------------------------
    @property
    def xyah(self):
        if self.mean is None:
            return self._xyah
        return self.mean[:4].copy()

    @property
    def xyxy(self):
        cx, cy, a, h = self.xyah
        w = a * h
        return np.array([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], np.float32)

    @staticmethod
    def next_id():
        STrack._count += 1
        return STrack._count

    @staticmethod
    def reset_id():
        STrack._count = 0

    # -- lifecycle ------------------------------------------------------------
    def activate(self, kalman_filter, frame_id):
        self.kalman_filter = kalman_filter
        self.track_id = self.next_id()
        self.mean, self.covariance = kalman_filter.initiate(self._xyah)
        self.tracklet_len = 0
        self.state = TrackState.Tracked
        self.is_activated = frame_id == 1
        self.frame_id = frame_id
        self.start_frame = frame_id

    def re_activate(self, new_track, frame_id, new_id=False):
        self.mean, self.covariance = self.kalman_filter.update(
            self.mean, self.covariance, new_track._xyah
        )
        self.tracklet_len = 0
        self.state = TrackState.Tracked
        self.is_activated = True
        self.frame_id = frame_id
        if new_id:
            self.track_id = self.next_id()
        self.score = new_track.score
        self.cls = new_track.cls
        self.idx = new_track.idx

    def update(self, new_track, frame_id):
        self.frame_id = frame_id
        self.tracklet_len += 1
        self.mean, self.covariance = self.kalman_filter.update(
            self.mean, self.covariance, new_track._xyah
        )
        self.state = TrackState.Tracked
        self.is_activated = True
        self.score = new_track.score
        self.cls = new_track.cls
        self.idx = new_track.idx

    def predict(self):
        mean = self.mean.copy()
        if self.state != TrackState.Tracked:
            mean[7] = 0  # zero height velocity when lost
        self.mean, self.covariance = self.kalman_filter.predict(mean, self.covariance)

    def mark_lost(self):
        self.state = TrackState.Lost

    def mark_removed(self):
        self.state = TrackState.Removed

    @property
    def end_frame(self):
        return self.frame_id

    @property
    def result(self):
        return np.r_[self.xyxy, self.track_id, self.score, self.cls, self.idx]


class BYTETracker:
    """Two-stage matcher: confident dets first, then low-score leftovers."""

    def __init__(self, args=None, frame_rate: int = 30):
        a = args or {}
        get = (lambda k, d: getattr(a, k, d)) if not isinstance(a, dict) else (lambda k, d: a.get(k, d))
        self.track_high_thresh = get("track_high_thresh", 0.25)
        self.track_low_thresh = get("track_low_thresh", 0.1)
        self.new_track_thresh = get("new_track_thresh", 0.25)
        self.match_thresh = get("match_thresh", 0.8)
        self.fuse_score_flag = get("fuse_score", True)
        self.track_buffer = get("track_buffer", 30)
        self.max_time_lost = int(frame_rate / 30.0 * self.track_buffer)
        self.kalman_filter = self._kf()
        self.tracked_stracks: list[STrack] = []
        self.lost_stracks: list[STrack] = []
        self.removed_stracks: list[STrack] = []
        self.frame_id = 0

    def _kf(self):
        return KalmanFilterXYAH()

    def _init_track(self, dets):
        out = []
        for di, d in enumerate(dets):
            t = self._new_strack(d[:4], d[4], d[5], d)
            t.idx = di
            out.append(t)
        return out

    def _new_strack(self, xyxy, score, cls, det):
        return STrack(xyxy, score, cls)

    def get_dists(self, tracks, detections):
        dists = matching.iou_distance(tracks, detections)
        if self.fuse_score_flag:
            dists = matching.fuse_score(dists, detections)
        return dists

    def multi_predict(self, tracks):
        for t in tracks:
            t.predict()

    def update(self, dets: np.ndarray, img=None) -> np.ndarray:
        """dets: (N, 6) [xyxy, conf, cls] for one frame."""
        self.frame_id += 1
        dets = np.asarray(dets, np.float32).reshape(-1, 6)
        scores = dets[:, 4]
        high = scores >= self.track_high_thresh
        low = (scores > self.track_low_thresh) & ~high
        dets_high = self._init_track(dets[high])
        dets_low = self._init_track(dets[low])

        activated, refind, lost, removed = [], [], [], []

        unconfirmed = [t for t in self.tracked_stracks if not t.is_activated]
        tracked = [t for t in self.tracked_stracks if t.is_activated]
        pool = _join(tracked, self.lost_stracks)
        self.multi_predict(pool)
        if img is not None and hasattr(self, "gmc"):
            self.apply_gmc(pool, img)

        # stage 1: confident detections vs (tracked + lost)
        dists = self.get_dists(pool, dets_high)
        matches, u_track, u_det = matching.linear_assignment(dists, self.match_thresh)
        for it, idet in matches:
            t, d = pool[it], dets_high[idet]
            if t.state == TrackState.Tracked:
                t.update(d, self.frame_id)
                activated.append(t)
            else:
                t.re_activate(d, self.frame_id)
                refind.append(t)

        # stage 2: low-confidence leftovers vs remaining tracked
        r_tracked = [pool[i] for i in u_track if pool[i].state == TrackState.Tracked]
        dists = matching.iou_distance(r_tracked, dets_low)
        matches, u_track2, _ = matching.linear_assignment(dists, 0.5)
        for it, idet in matches:
            t, d = r_tracked[it], dets_low[idet]
            if t.state == TrackState.Tracked:
                t.update(d, self.frame_id)
                activated.append(t)
            else:
                t.re_activate(d, self.frame_id)
                refind.append(t)
        for i in u_track2:
            t = r_tracked[i]
            if t.state != TrackState.Lost:
                t.mark_lost()
                lost.append(t)

        # unconfirmed tracks vs remaining confident dets
        leftover = [dets_high[i] for i in u_det]
        dists = self.get_dists(unconfirmed, leftover)
        matches, u_unconf, u_det2 = matching.linear_assignment(dists, 0.7)
        for it, idet in matches:
            unconfirmed[it].update(leftover[idet], self.frame_id)
            activated.append(unconfirmed[it])
        for i in u_unconf:
            unconfirmed[i].mark_removed()
            removed.append(unconfirmed[i])

        # births
        for i in u_det2:
            d = leftover[i]
            if d.score >= self.new_track_thresh:
                d.activate(self.kalman_filter, self.frame_id)
                activated.append(d)

        # deaths
        for t in self.lost_stracks:
            if self.frame_id - t.end_frame > self.max_time_lost:
                t.mark_removed()
                removed.append(t)

        self.tracked_stracks = [t for t in self.tracked_stracks if t.state == TrackState.Tracked]
        self.tracked_stracks = _join(self.tracked_stracks, activated)
        self.tracked_stracks = _join(self.tracked_stracks, refind)
        self.lost_stracks = _sub(self.lost_stracks, self.tracked_stracks)
        self.lost_stracks.extend(lost)
        self.lost_stracks = _sub(self.lost_stracks, removed)
        self.tracked_stracks, self.lost_stracks = _dedup(self.tracked_stracks, self.lost_stracks)
        self.removed_stracks.extend(removed)
        self.removed_stracks = self.removed_stracks[-999:]

        return np.asarray(
            [t.result for t in self.tracked_stracks if t.is_activated], np.float32
        ).reshape(-1, 8)

    def reset(self):
        self.tracked_stracks, self.lost_stracks, self.removed_stracks = [], [], []
        self.frame_id = 0
        STrack.reset_id()


def _join(a, b):
    seen = {t.track_id for t in a}
    return list(a) + [t for t in b if t.track_id not in seen or t.track_id == 0]


def _sub(a, b):
    ids = {t.track_id for t in b}
    return [t for t in a if t.track_id not in ids]


def _dedup(a, b, thresh: float = 0.15):
    d = matching.iou_distance(a, b)
    pairs = np.argwhere(d < thresh)
    dup_a, dup_b = set(), set()
    for ia, ib in pairs:
        if a[ia].frame_id - a[ia].start_frame > b[ib].frame_id - b[ib].start_frame:
            dup_b.add(ib)
        else:
            dup_a.add(ia)
    return (
        [t for i, t in enumerate(a) if i not in dup_a],
        [t for i, t in enumerate(b) if i not in dup_b],
    )
