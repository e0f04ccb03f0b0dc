"""Solutions depth tests: frame-level flows on synthetic trajectories.

Each solution's ``process``-style entrypoint is exercised with a stubbed
``extract_tracks`` (no model needed) so the region geometry, counting
semantics, and annotation paths are asserted end-to-end — the behaviors
of ref:ultralytics/solutions/*.py.
"""

from __future__ import annotations

import numpy as np
import pytest


def rows(*specs):
    """specs: (x1, y1, x2, y2, tid, cls) -> (N, 7) track rows."""
    out = []
    for x1, y1, x2, y2, tid, cls in specs:
        out.append([x1, y1, x2, y2, tid, 0.9, cls])
    return np.asarray(out, np.float32) if out else np.zeros((0, 7), np.float32)


def stub(sol, frames):
    """Make extract_tracks yield successive synthetic frames."""
    it = iter(frames)
    sol.extract_tracks = lambda im0: next(it)
    return sol


def img(h=120, w=160):
    return np.zeros((h, w, 3), np.uint8)


def test_region_counter_frame_flow():
    from xlstm_yolo_tpu.solutions import RegionCounter

    rc = RegionCounter(regions={"A": [(0, 0), (80, 0), (80, 120), (0, 120)],
                                "B": [(80, 0), (160, 0), (160, 120), (80, 120)]},
                       names={0: "car"})
    # two objects left half, one right half
    frame = rows((10, 10, 30, 30, 1, 0), (40, 40, 60, 60, 2, 0),
                 (100, 10, 120, 30, 3, 0))
    out = stub(rc, [frame]).count(img())
    assert rc.counts == {"A": 2, "B": 1}
    assert out.any()  # region outlines drawn


def test_heatmap_circular_footprint_and_counting():
    from xlstm_yolo_tpu.solutions import Heatmap

    hm = Heatmap(region=[(80, 0), (80, 120)], names={0: "car"})
    # track 1 crosses x=80 between frames -> one IN/OUT count
    f1 = rows((50, 40, 70, 60, 1, 0))
    f2 = rows((90, 40, 110, 60, 1, 0))
    stub(hm, [f1, f2])
    hm.generate_heatmap(img())
    hm.generate_heatmap(img())
    # circular footprint: center of the box got heat, its corner did not
    assert hm.map[50, 60] > 0          # center of first box
    assert hm.map[41, 51] == 0         # box corner outside the circle
    assert hm.in_count + hm.out_count == 1


def test_trackzone_masks_outside():
    from xlstm_yolo_tpu.solutions import TrackZone

    tz = TrackZone(region=[(40, 30), (120, 30), (120, 90), (40, 90)])
    seen = {}

    def capture(im0):
        seen["frame"] = im0.copy()
        return rows((50, 40, 70, 60, 1, 0))

    tz.extract_tracks = capture
    frame = np.full((120, 160, 3), 255, np.uint8)
    tz.trackzone(frame)
    assert seen["frame"][60, 80].all()      # inside zone kept
    assert not seen["frame"][5, 5].any()    # outside zone zeroed
    assert not seen["frame"][110, 150].any()


def test_queue_needs_history():
    from xlstm_yolo_tpu.solutions import QueueManager

    qm = QueueManager(region=[(0, 0), (160, 0), (160, 120), (0, 120)])
    f = rows((10, 10, 30, 30, 1, 0))
    stub(qm, [f, f])
    qm.process_queue(img())
    assert qm.queue_count == 0  # first sighting: history < 2
    qm.process_queue(img())
    assert qm.queue_count == 1


def test_speed_estimator_region_crossing():
    from xlstm_yolo_tpu.solutions import SpeedEstimator

    se = SpeedEstimator(region=[(0, 60), (160, 60)], names={0: "car"})
    frames = [rows((70, 20 + 30 * t, 90, 40 + 30 * t, 1, 0)) for t in range(3)]
    stub(se, frames)
    se.estimate_speed(img(), now=0.0)
    assert 1 not in se.spd  # no crossing yet
    se.estimate_speed(img(), now=1.0)   # center moves 30px/s across y=60
    assert se.spd.get(1) == pytest.approx(30.0)
    spd_before = se.spd[1]
    se.estimate_speed(img(), now=2.0)   # stamped once, never re-estimated
    assert se.spd[1] == spd_before


def test_distance_mouse_selection():
    import cv2

    from xlstm_yolo_tpu.solutions import DistanceCalculation

    dc = DistanceCalculation(px_per_meter=10, names={0: "car"})
    f = rows((10, 10, 30, 30, 1, 0), (100, 10, 120, 30, 2, 0))
    stub(dc, [f, f])
    dc.process(img())  # populates last_tracks
    dc.mouse_event(cv2.EVENT_LBUTTONDOWN, 20, 20)
    dc.mouse_event(cv2.EVENT_LBUTTONDOWN, 110, 20)
    assert dc.selected == [1, 2]
    d = dc.update(f)
    assert d == pytest.approx(9.0)  # 90 px apart / 10 ppm
    dc.process(img())
    dc.mouse_event(cv2.EVENT_RBUTTONDOWN, 0, 0)
    assert dc.selected == []


def test_parking_management(tmp_path):
    from xlstm_yolo_tpu.solutions import ParkingManagement, save_slots

    slots = [[(0, 0), (40, 0), (40, 40), (0, 40)],
             [(50, 0), (90, 0), (90, 40), (50, 40)],
             [(100, 0), (140, 0), (140, 40), (100, 40)]]
    path = tmp_path / "slots.json"
    save_slots(slots, str(path))
    pm = ParkingManagement(json_file=str(path), names={2: "car"})
    f = rows((5, 5, 35, 35, 1, 2), (104, 4, 136, 36, 2, 2))
    stub(pm, [f])
    pm.process_data(img())
    assert pm.pr_info == {"Occupancy": 2, "Available": 1}


def test_security_alarm_one_shot():
    from xlstm_yolo_tpu.solutions import SecurityAlarm

    sent = []

    class FakeServer:
        def send_message(self, msg):
            sent.append(msg)

    sa = SecurityAlarm(records=2, names={0: "person"})
    sa.server = FakeServer()
    sa.from_email = "a@x"
    sa.to_email = "b@x"
    low = rows((0, 0, 10, 10, 1, 0))
    high = rows(*[(i * 12, 0, i * 12 + 10, 10, i, 0) for i in range(4)])
    stub(sa, [low, high, high])
    sa.monitor(img())
    assert not sa.email_sent and not sent
    sa.monitor(img())
    assert sa.email_sent and len(sent) == 1
    assert sent[0]["Subject"] == "Security Alert"
    sa.monitor(img())
    assert len(sent) == 1  # one-shot


def test_analytics_chart_kinds():
    from xlstm_yolo_tpu.solutions import Analytics

    a = Analytics(names={0: "car", 1: "bus"})
    for t in range(4):
        a.update(rows((0, 0, 10, 10, 1, 0), (20, 0, 30, 10, 2, t % 2)), t)
    for kind in ("line", "multiline", "area", "bar", "pie"):
        im = a.chart(kind)
        assert im.ndim == 3 and im.shape[-1] == 3 and im.size > 0


def test_ai_gym_monitor_counts_reps():
    from xlstm_yolo_tpu.solutions import AIGym

    class KP:
        def __init__(self, data):
            self.data = data

    class BX:
        def __init__(self, data):
            self.data = data

        def __len__(self):
            return len(self.data)

    class Res:
        def __init__(self, boxes, kpts):
            self.boxes = BX(boxes)
            self.keypoints = KP(kpts)

    def kp17(angle_deg):
        """Arm chain 5-7-9 with the given elbow angle."""
        kp = np.zeros((17, 3), np.float32)
        kp[5] = [0, 0, 1]
        kp[7] = [10, 0, 1]
        rad = np.radians(180 - angle_deg)
        kp[9] = [10 + 10 * np.cos(rad), 10 * np.sin(rad), 1]
        return kp

    g = AIGym("pushup")
    box = np.asarray([[0, 0, 20, 20, 1, 0.9, 0]], np.float32)
    seq = [kp17(160), kp17(60), kp17(160)]  # up -> down -> up = 1 rep
    it = iter(seq)

    class FakeModel:
        def track(self, im0, **kw):
            return [Res(box, np.asarray([next(it)]))]

    g._model = FakeModel()
    for _ in range(3):
        g.monitor(img())
    assert g.count.get(1) == 1
