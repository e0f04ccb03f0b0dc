"""Tracker tests: Kalman consistency + ByteTrack id stability on a
synthetic moving-boxes sequence."""

import numpy as np

from xlstm_yolo_tpu.trackers.bot_sort import BOTSORT, GMC
from xlstm_yolo_tpu.trackers.byte_tracker import BYTETracker, STrack
from xlstm_yolo_tpu.trackers.kalman_filter import KalmanFilterXYAH


def test_kalman_predict_update_cycle():
    kf = KalmanFilterXYAH()
    m = np.array([100.0, 100.0, 0.5, 50.0])
    mean, cov = kf.initiate(m)
    for _ in range(5):
        mean, cov = kf.predict(mean, cov)
        mean, cov = kf.update(mean, cov, m + [1, 1, 0, 0])
    assert np.isfinite(mean).all() and np.isfinite(cov).all()
    assert abs(mean[0] - 105) < 6  # tracked the drift


def _frame_dets(t, n=2):
    """Two boxes moving right at 5 px/frame."""
    dets = []
    for j in range(n):
        x = 50 + 5 * t + 120 * j
        y = 60 + 80 * j
        dets.append([x, y, x + 40, y + 60, 0.9, j])
    return np.asarray(dets, np.float32)


def test_bytetrack_stable_ids():
    STrack.reset_id()
    trk = BYTETracker({"track_high_thresh": 0.25}, frame_rate=30)
    ids_per_frame = []
    for t in range(10):
        out = trk.update(_frame_dets(t))
        ids_per_frame.append(sorted(out[:, 4].astype(int).tolist()))
    # after activation, ids persist across frames
    assert ids_per_frame[2] == ids_per_frame[9]
    assert len(set(ids_per_frame[9])) == 2


def test_bytetrack_handles_dropout_and_rebirth():
    STrack.reset_id()
    trk = BYTETracker({}, frame_rate=30)
    for t in range(5):
        trk.update(_frame_dets(t))
    ids_before = sorted(trk.update(_frame_dets(5))[:, 4].astype(int).tolist())
    trk.update(np.zeros((0, 6), np.float32))  # miss one frame
    out = trk.update(_frame_dets(7))
    ids_after = sorted(out[:, 4].astype(int).tolist())
    assert ids_after == ids_before  # re-associated from lost pool


def test_botsort_with_gmc_static_camera():
    STrack.reset_id()
    trk = BOTSORT({}, frame_rate=30)
    img = np.full((240, 320, 3), 120, np.uint8)
    ids = []
    for t in range(6):
        out = trk.update(_frame_dets(t), img)
        if t >= 2:
            ids.append(sorted(out[:, 4].astype(int).tolist()))
    assert ids[0] == ids[-1]


def test_gmc_identity_on_static_frames():
    g = GMC()
    img = (np.random.default_rng(0).random((240, 320, 3)) * 255).astype(np.uint8)
    g.apply(img)
    H = g.apply(img)
    np.testing.assert_allclose(H, np.eye(2, 3), atol=0.15)
