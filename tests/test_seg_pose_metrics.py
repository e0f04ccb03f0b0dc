"""Golden tests for mask/keypoint metric primitives vs the torch reference,
plus unit checks of the SegmentMetrics/PoseMetrics aggregation."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
import ref_loader  # noqa: E402

HAS_REF = ref_loader.REF.exists()


def _rand_masks(rng, n, h, w):
    return (rng.random((n, h, w)) > 0.6).astype(np.float32)


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
def test_mask_iou_golden():
    import torch

    ref_loader.load_reference()
    from ultralytics.utils.metrics import mask_iou as ref_mask_iou

    from xlstm_yolo_tpu.utils.metrics import mask_iou

    rng = np.random.default_rng(0)
    m1 = _rand_masks(rng, 5, 32, 40).reshape(5, -1)
    m2 = _rand_masks(rng, 7, 32, 40).reshape(7, -1)
    ours = mask_iou(m1, m2)
    theirs = ref_mask_iou(torch.from_numpy(m1), torch.from_numpy(m2)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
def test_kpt_iou_golden():
    import torch

    ref_loader.load_reference()
    from ultralytics.utils.metrics import kpt_iou as ref_kpt_iou

    from xlstm_yolo_tpu.utils.metrics import OKS_SIGMA, kpt_iou

    rng = np.random.default_rng(1)
    k1 = rng.random((4, 17, 3)).astype(np.float32) * 100
    k1[..., 2] = (rng.random((4, 17)) > 0.3).astype(np.float32) * 2
    k2 = rng.random((6, 17, 3)).astype(np.float32) * 100
    area = rng.random(4).astype(np.float32) * 500 + 50
    ours = kpt_iou(k1, k2, area, OKS_SIGMA)
    theirs = ref_kpt_iou(
        torch.from_numpy(k1), torch.from_numpy(k2), torch.from_numpy(area),
        sigma=OKS_SIGMA.tolist(),
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
def test_process_mask_golden():
    import torch

    ref_loader.load_reference()
    from ultralytics.utils.ops import process_mask as ref_process_mask

    from xlstm_yolo_tpu.utils.ops import process_mask

    rng = np.random.default_rng(2)
    Hm = Wm = 40
    nm, n, imgsz = 8, 5, 160
    proto_hwc = rng.standard_normal((Hm, Wm, nm)).astype(np.float32)
    coeffs = rng.standard_normal((n, nm)).astype(np.float32)
    boxes = np.stack(
        [
            rng.uniform(0, 80, n),
            rng.uniform(0, 80, n),
            rng.uniform(80, 160, n),
            rng.uniform(80, 160, n),
        ],
        axis=1,
    ).astype(np.float32)
    ours = process_mask(proto_hwc, coeffs, boxes, (imgsz, imgsz))
    theirs = ref_process_mask(
        torch.from_numpy(proto_hwc.transpose(2, 0, 1)),  # CHW
        torch.from_numpy(coeffs),
        torch.from_numpy(boxes),
        (imgsz, imgsz),
    ).numpy()
    np.testing.assert_array_equal(np.asarray(ours), theirs.astype(bool))


def test_segment_pose_metrics_aggregate():
    from xlstm_yolo_tpu.utils.metrics import PoseMetrics, SegmentMetrics

    rng = np.random.default_rng(3)
    n = 50
    tp_b = rng.random((n, 10)) > 0.4
    tp_m = rng.random((n, 10)) > 0.6
    conf = rng.random(n).astype(np.float32)
    pred_cls = rng.integers(0, 3, n).astype(np.float32)
    target_cls = rng.integers(0, 3, 40).astype(np.float32)

    sm = SegmentMetrics(names={0: "a", 1: "b", 2: "c"})
    sm.process(tp_b, tp_m, conf, pred_cls, target_cls)
    rd = sm.results_dict
    assert "metrics/mAP50-95(M)" in rd and "metrics/mAP50-95(B)" in rd
    assert rd["fitness"] == pytest.approx(sm.box.fitness + sm.seg.fitness)
    # the box TP table is strictly richer -> box mAP >= mask mAP
    assert sm.box.map >= sm.seg.map

    pm = PoseMetrics(names={0: "p"})
    pm.process(tp_b, tp_m, conf, np.zeros(n), np.zeros(40))
    assert "metrics/mAP50-95(P)" in pm.results_dict
    assert pm.results_dict["fitness"] == pytest.approx(pm.box.fitness + pm.pose.fitness)
