"""End-to-end segment/pose task tests (VERDICT r2 items 1-2).

Two layers:
- oracle-validator tests: a jittable 'oracle model' derives perfect
  predictions from the image pixels, so SegmentationValidator /
  PoseValidator must report ~1.0 mAP50 — this checks the whole val
  pipeline (NMS, mask assembly, OKS matching, AP aggregation)
  deterministically with no training;
- slow train->val roundtrips on the tiny ViL seg/pose models.
"""

import random
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest
import yaml

sys.path.insert(0, str(Path(__file__).parent))
from test_instance_augment import _write_pose_dataset, _write_seg_dataset  # noqa: E402

CFG_DIR = Path(__file__).resolve().parents[1] / "xlstm_yolo_tpu" / "cfg" / "models"


def _val_args(data_yaml, task, **kw):
    from xlstm_yolo_tpu.cfg import get_cfg

    return get_cfg(overrides={
        "task": task, "data": str(data_yaml), "imgsz": 160, "batch": 2,
        "workers": 2, "max_targets": 16, "conf": 0.25, "iou": 0.7,
        "max_det": 8, "plots": False, "save_json": False, **kw,
    })


def _mask_to_box(mask):
    """jnp: binary (H, W) -> xyxy box of the true region (0s if empty)."""
    import jax.numpy as jnp

    H, W = mask.shape
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    any_x = mask.any(axis=0)
    any_y = mask.any(axis=1)
    big = jnp.float32(1e9)
    x1 = jnp.min(jnp.where(any_x, xs, big))
    x2 = jnp.max(jnp.where(any_x, xs, -big))
    y1 = jnp.min(jnp.where(any_y, ys, big))
    y2 = jnp.max(jnp.where(any_y, ys, -big))
    ok = mask.any()
    z = jnp.float32(0)
    return jnp.where(ok, jnp.stack([x1, y1, x2 + 1, y2 + 1]), jnp.stack([z, z, z, z]))


class _SegOracle:
    """model.apply(variables, x) -> ((B, A, 4+nc+nm), {'proto': ...}).

    Finds the red blob (the synthetic dataset draws one color per
    instance class 0), emits its bbox as one confident detection and a
    proto map equal to the blob mask."""

    def apply(self, variables, x):
        import jax.numpy as jnp

        B, H, W, _ = x.shape  # RGB float 0-1
        red = (x[..., 0] > 0.6) & (x[..., 1] < 0.4)  # (B, H, W)
        boxes = jnp.stack([_mask_to_box(red[b]) for b in range(B)])  # (B, 4) xyxy
        conf = red.reshape(B, -1).any(-1).astype(jnp.float32) * 0.9
        # NMS consumes head-decode format: cxcywh
        cxy = (boxes[:, :2] + boxes[:, 2:]) / 2
        wh = boxes[:, 2:] - boxes[:, :2]
        A = 4
        y = jnp.zeros((B, A, 4 + 1 + 1), jnp.float32)
        y = y.at[:, 0, :4].set(jnp.concatenate([cxy, wh], -1))
        y = y.at[:, 0, 4].set(conf)
        y = y.at[:, 0, 5].set(10.0)  # mask coeff
        proto = jnp.where(red, 10.0, -10.0)[..., None]  # (B, H, W, 1) wrong res
        # downsample to H//4 proto resolution by striding
        proto = proto[:, ::4, ::4, :]
        return y, {"proto": proto}


class _PoseOracle:
    """Emits the blue box + its 4 corner keypoints (matches the synthetic
    pose dataset written by test_instance_augment)."""

    def apply(self, variables, x):
        import jax.numpy as jnp

        B = x.shape[0]
        blue = (x[..., 2] > 0.6) & (x[..., 1] < 0.4)
        boxes = jnp.stack([_mask_to_box(blue[b]) for b in range(B)])
        conf = blue.reshape(B, -1).any(-1).astype(jnp.float32) * 0.9
        x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
        cxy = (boxes[:, :2] + boxes[:, 2:]) / 2
        wh = boxes[:, 2:] - boxes[:, :2]
        kpts = jnp.stack([
            jnp.stack([x1, y1, jnp.ones_like(x1)], -1),
            jnp.stack([x2, y1, jnp.ones_like(x1)], -1),
            jnp.stack([x1, y2, jnp.ones_like(x1)], -1),
            jnp.stack([x2, y2, jnp.ones_like(x1)], -1),
        ], axis=1)  # (B, 4, 3)
        A = 4
        y = jnp.zeros((B, A, 4 + 1 + 12), jnp.float32)
        y = y.at[:, 0, :4].set(jnp.concatenate([cxy, wh], -1))
        y = y.at[:, 0, 4].set(conf)
        y = y.at[:, 0, 5:].set(kpts.reshape(B, 12))
        return y, {}


def test_segmentation_validator_oracle(tmp_path):
    # one instance per image: the pixel-oracle can't separate two
    # same-color blobs, and the point here is the val pipeline
    data_yaml = _write_seg_dataset(tmp_path, max_inst=1)
    from xlstm_yolo_tpu.models.yolo.segment.val import SegmentationValidator

    args = _val_args(data_yaml, "segment")
    v = SegmentationValidator(args, data=str(data_yaml), save_dir=tmp_path / "v")
    res = v(dict(model=_SegOracle(), variables={}), batch_size=2)
    assert res["metrics/mAP50(B)"] > 0.9, res
    assert res["metrics/mAP50(M)"] > 0.9, res
    assert res["fitness"] > 1.0
    # the blob bbox-mask is a triangle's bbox fill? no: proto IS the
    # triangle mask, gt mask is the triangle -> high-IoU mask AP at 50
    assert res["metrics/mAP50-95(M)"] > 0.5, res


def test_pose_validator_oracle(tmp_path):
    data_yaml = _write_pose_dataset(tmp_path)
    from xlstm_yolo_tpu.models.yolo.pose.val import PoseValidator

    args = _val_args(data_yaml, "pose")
    v = PoseValidator(args, data=str(data_yaml), save_dir=tmp_path / "v")
    assert v.kpt_shape == (4, 3)
    res = v(dict(model=_PoseOracle(), variables={}), batch_size=2)
    assert res["metrics/mAP50(B)"] > 0.9, res
    assert res["metrics/mAP50(P)"] > 0.9, res
    assert res["fitness"] > 1.0


@pytest.mark.slow
def test_segment_train_val_roundtrip(tmp_path):
    data_yaml = _write_seg_dataset(tmp_path / "ds")
    from xlstm_yolo_tpu.engine.trainer import DetectionTrainer

    tr = DetectionTrainer(overrides={
        "task": "segment",
        "model": str(CFG_DIR / "vil-det-tiny-seg.yaml"),
        "data": str(data_yaml),
        "imgsz": 160, "epochs": 1, "batch": 2, "workers": 2,
        "max_targets": 16, "optimizer": "SGD", "lr0": 0.01, "amp": False,
        "project": str(tmp_path / "runs"), "mosaic": 1.0, "val": True,
        "plots": False,
    }, model_cfg=str(CFG_DIR / "vil-det-tiny-seg.yaml"))
    metrics = tr.train()
    assert "metrics/mAP50(M)" in metrics
    assert np.isfinite(metrics["fitness"])
    assert (tr.wdir / "last").exists()


@pytest.mark.slow
def test_pose_train_val_roundtrip(tmp_path):
    data_yaml = _write_pose_dataset(tmp_path / "ds")
    from xlstm_yolo_tpu.engine.trainer import DetectionTrainer

    tr = DetectionTrainer(overrides={
        "task": "pose",
        "model": str(CFG_DIR / "vil-det-tiny-pose.yaml"),
        "data": str(data_yaml),
        "imgsz": 160, "epochs": 1, "batch": 2, "workers": 2,
        "max_targets": 16, "optimizer": "SGD", "lr0": 0.01, "amp": False,
        "project": str(tmp_path / "runs"), "mosaic": 1.0, "val": True,
        "plots": False,
    }, model_cfg=str(CFG_DIR / "vil-det-tiny-pose.yaml"))
    metrics = tr.train()
    assert "metrics/mAP50(P)" in metrics
    assert np.isfinite(metrics["fitness"])
    assert (tr.wdir / "last").exists()
