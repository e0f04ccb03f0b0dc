"""YOLO-NAS plugin: raw (boxes, scores) postprocess + facade wiring.

Parity targets: ref:ultralytics/models/nas/{model,predict,val}.py. The
architecture is external (super-gradients) upstream too, so the fakes
here stand in for a loaded NAS network and the tests exercise the
plugin's actual content: the cat+NMS decode, the predictor flow, the
torch pure_callback bridge, and the validator hookup.
"""

import random
from pathlib import Path

import numpy as np
import pytest
import yaml


class _FakeNASModule:
    """Flax-shaped fake: fixed raw preds regardless of pixels."""

    def __init__(self, boxes, scores):
        import jax.numpy as jnp

        self._b = jnp.asarray(boxes, jnp.float32)
        self._s = jnp.asarray(scores, jnp.float32)

    def apply(self, variables, x):
        import jax.numpy as jnp

        b = x.shape[0]
        boxes = jnp.broadcast_to(self._b, (b, *self._b.shape))
        scores = jnp.broadcast_to(self._s, (b, *self._s.shape))
        return (boxes, scores), {}


RAW_BOXES = [[10.0, 10.0, 50.0, 50.0],   # kept (cls 0, conf .9)
             [12.0, 12.0, 52.0, 52.0],   # suppressed by the first
             [100.0, 100.0, 140.0, 140.0]]  # kept (cls 1, conf .8)
RAW_SCORES = [[0.9, 0.05], [0.6, 0.05], [0.05, 0.8]]


def test_nas_raw_to_dets_nms():
    import jax.numpy as jnp

    from xlstm_yolo_tpu.models.nas.predict import nas_raw_to_dets

    out = np.asarray(nas_raw_to_dets(
        jnp.asarray([RAW_BOXES], jnp.float32),
        jnp.asarray([RAW_SCORES], jnp.float32),
        conf_thres=0.25, iou_thres=0.45, max_det=10))
    assert out.shape == (1, 10, 6)
    kept = out[0][out[0, :, 4] > 0]
    assert len(kept) == 2
    np.testing.assert_allclose(kept[0, :4], RAW_BOXES[0], atol=1e-4)
    assert kept[0, 5] == 0 and kept[1, 5] == 1
    np.testing.assert_allclose(kept[:, 4], [0.9, 0.8], atol=1e-5)


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("nasimgs")
    for i in range(2):
        cv2.imwrite(str(d / f"f{i}.png"),
                    np.full((96, 128, 3), 60 + i, np.uint8))
    return d


def test_nas_predict_from_jax(img_dir):
    from xlstm_yolo_tpu.models.nas import NAS

    m = NAS.from_jax(_FakeNASModule(RAW_BOXES, RAW_SCORES), {},
                     names={0: "a", 1: "b"})
    results = m.predict(img_dir, imgsz=160, conf=0.25)
    assert len(results) == 2
    for r in results:
        assert len(r.boxes) == 2
        h, w = r.orig_img.shape[:2]
        xy = r.boxes.xyxy
        assert (xy[:, [0, 2]] <= w).all() and (xy[:, [1, 3]] <= h).all()
        assert set(r.boxes.cls.astype(int)) == {0, 1}


def test_nas_from_torch_bridge(img_dir):
    torch = pytest.importorskip("torch")

    from xlstm_yolo_tpu.models.nas import NAS

    class TorchNAS(torch.nn.Module):
        def forward(self, x):
            b = x.shape[0]
            boxes = torch.tensor(RAW_BOXES).repeat(b, 1, 1)
            scores = torch.tensor(RAW_SCORES).repeat(b, 1, 1)
            return ((boxes, scores), None)

    m = NAS.from_torch(TorchNAS(), names={0: "a", 1: "b"}, imgsz=160)
    results = m.predict(img_dir, imgsz=160, conf=0.25)
    assert len(results) == 2 and len(results[0].boxes) == 2


def test_nas_weights_entry_gated():
    from xlstm_yolo_tpu.models.nas import NAS

    with pytest.raises((ImportError, AssertionError)):
        NAS("yolo_nas_s.pt")
    with pytest.raises(AssertionError):
        NAS("model.yaml")


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("nasds")
    for split in ("train", "val"):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        rng = random.Random(0)
        for i in range(4):
            img = np.full((160, 160, 3), 90, np.uint8)
            w, h = rng.randint(20, 60), rng.randint(20, 60)
            x, y = rng.randint(0, 159 - w), rng.randint(0, 159 - h)
            cv2.rectangle(img, (x, y), (x + w, y + h), (0, 0, 255), -1)
            cv2.imwrite(str(root / "images" / split / f"{i:03d}.jpg"), img)
            (root / "labels" / split / f"{i:03d}.txt").write_text(
                f"0 {(x + w / 2) / 160:.4f} {(y + h / 2) / 160:.4f} "
                f"{w / 160:.4f} {h / 160:.4f}")
    data_yaml = root / "data.yaml"
    data_yaml.write_text(yaml.safe_dump({
        "path": str(root), "train": "images/train", "val": "images/val",
        "names": {0: "red", 1: "blue"}, "nc": 2}))
    return data_yaml


def test_nas_validator_runs(synth_dataset, tmp_path):
    from xlstm_yolo_tpu.cfg import get_cfg
    from xlstm_yolo_tpu.models.nas.val import NASValidator

    cfg = get_cfg(overrides={"task": "detect", "mode": "val", "imgsz": 160,
                             "batch": 2, "data": str(synth_dataset),
                             "workers": 0})
    v = NASValidator(cfg, data=str(synth_dataset), save_dir=tmp_path)
    bundle = {"model": _FakeNASModule(RAW_BOXES, RAW_SCORES), "variables": {}}
    metrics = v(bundle, batch_size=2, verbose=False)
    assert np.isfinite(list(metrics.values())).all()
