"""End-to-end slice tests: dataset -> train loop -> val -> predict.

Uses a synthetic on-disk YOLO-format dataset and the tiny 160px model so
the whole loop runs on the CPU test harness in seconds.
"""

import random
from pathlib import Path

import numpy as np
import pytest
import yaml

CFG_TINY = Path(__file__).resolve().parents[1] / "xlstm_yolo_tpu" / "cfg" / "models" / "vil-det-tiny.yaml"


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    """8 images with 1-3 colored boxes; YOLO txt labels."""
    import cv2

    root = tmp_path_factory.mktemp("synthds")
    for split in ("train", "val"):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        rng = random.Random(0)
        for i in range(8):
            img = np.full((160, 160, 3), 90, np.uint8)
            lines = []
            for _ in range(rng.randint(1, 3)):
                w, h = rng.randint(20, 60), rng.randint(20, 60)
                x, y = rng.randint(0, 159 - w), rng.randint(0, 159 - h)
                c = rng.randint(0, 1)
                color = (0, 0, 255) if c == 0 else (255, 0, 0)
                cv2.rectangle(img, (x, y), (x + w, y + h), color, -1)
                lines.append(
                    f"{c} {(x + w / 2) / 160:.4f} {(y + h / 2) / 160:.4f} {w / 160:.4f} {h / 160:.4f}"
                )
            cv2.imwrite(str(root / "images" / split / f"{i:03d}.jpg"), img)
            (root / "labels" / split / f"{i:03d}.txt").write_text("\n".join(lines))
    data_yaml = root / "data.yaml"
    data_yaml.write_text(yaml.safe_dump({
        "path": str(root),
        "train": "images/train",
        "val": "images/val",
        "names": {0: "red", 1: "blue"},
        "nc": 2,
    }))
    return data_yaml


def test_dataset_and_loader(synth_dataset):
    from xlstm_yolo_tpu.cfg import get_cfg
    from xlstm_yolo_tpu.data.build import build_dataloader, build_yolo_dataset
    from xlstm_yolo_tpu.data.dataset import check_det_dataset

    cfg = get_cfg(overrides={"imgsz": 160, "max_targets": 16, "workers": 2})
    data = check_det_dataset(str(synth_dataset))
    ds = build_yolo_dataset(cfg, data["train"], 4, data, mode="train")
    assert len(ds) == 8
    loader = build_dataloader(ds, 4, workers=2, shuffle=True)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["img"].shape == (4, 160, 160, 3) and b["img"].dtype == np.uint8
    assert b["bboxes"].shape == (4, 16, 4)
    assert b["mask"].any()
    # boxes within image bounds
    assert b["bboxes"].min() >= 0 and b["bboxes"].max() <= 160


def test_process_loader_matches_threads(synth_dataset):
    """Fork-pool workers produce byte-identical batches to the thread
    pool: augmentation rng is keyed by (seed, epoch, batch index), not by
    which worker raced to the task."""
    from xlstm_yolo_tpu.cfg import get_cfg
    from xlstm_yolo_tpu.data.build import build_dataloader, build_yolo_dataset
    from xlstm_yolo_tpu.data.dataset import check_det_dataset

    cfg = get_cfg(overrides={"imgsz": 160, "max_targets": 16})
    data = check_det_dataset(str(synth_dataset))
    ds = build_yolo_dataset(cfg, data["train"], 4, data, mode="train")
    lt = build_dataloader(ds, 4, workers=2, shuffle=True, seed=7)
    lp = build_dataloader(ds, 4, workers=2, shuffle=True, seed=7)
    lp.use_processes = True
    try:
        bt = list(lt._iter_epoch(0)) + list(lt._iter_epoch(1))
        bp = list(lp._iter_epoch(0)) + list(lp._iter_epoch(1))
        assert len(bt) == len(bp) == 4
        for a, b in zip(bt, bp):
            for k in ("img", "cls", "bboxes", "mask"):
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    finally:
        lp.close()


@pytest.mark.slow
def test_train_val_predict_roundtrip(synth_dataset, tmp_path):
    from xlstm_yolo_tpu.engine.trainer import DetectionTrainer

    tr = DetectionTrainer(
        overrides={
            "model": str(CFG_TINY),
            "data": str(synth_dataset),
            "imgsz": 160,
            "epochs": 2,
            "batch": 4,
            "workers": 2,
            "max_targets": 16,
            "optimizer": "SGD",
            "lr0": 0.01,
            "amp": False,
            "project": str(tmp_path / "runs"),
            "mosaic": 0.0,
            "val": True,
            "plots": False,
        },
        model_cfg=str(CFG_TINY),
    )
    metrics = tr.train()
    assert (tr.wdir / "last").exists()
    assert tr.csv_path.exists()
    assert "fitness" in metrics
    # final_eval ran and the deploy-stripped checkpoints were written
    # (ref:engine/trainer.py:684, utils/torch_utils.py:553)
    assert (tr.wdir / "best_stripped").exists()
    assert (tr.wdir / "last_stripped").exists()

    # resume-style checkpoint restore
    from xlstm_yolo_tpu.utils.checkpoint import load_checkpoint

    state2, start_epoch, best = load_checkpoint(tr.wdir / "last", tr.state)
    assert start_epoch == 2
    leaves_a = [np.asarray(x) for x in __import__("jax").tree.leaves(tr.state.params)]
    leaves_b = [np.asarray(x) for x in __import__("jax").tree.leaves(state2.params)]
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(a, b)

    # AutoBackend self-configures from the checkpoint's meta.json sidecar
    # (ref:nn/autobackend.py:303-318 restores names/task from the payload)
    from xlstm_yolo_tpu.nn.autobackend import AutoBackend

    ab = AutoBackend(tr.wdir / "best", compute_dtype=None)
    assert ab.format.startswith("orbax")
    assert ab.imgsz == 160 and ab.task == "detect"
    assert ab.names is not None and len(ab.names) >= 1
    y = np.asarray(ab.forward(np.zeros((1, 160, 160, 3), np.uint8)))
    assert y.shape[-1] == 6


@pytest.mark.slow
def test_train_tensor_parallel_hybrid(synth_dataset, tmp_path, monkeypatch):
    """XY_TP=2: the trainer builds a (data x model) mesh, shards the ViL
    projections, and trains with the hybrid flat/tree optimizer —
    end-to-end with val, checkpoint write and resume-style restore."""
    import jax

    from xlstm_yolo_tpu.engine.steps import HybridTrainState
    from xlstm_yolo_tpu.engine.trainer import DetectionTrainer

    monkeypatch.setenv("XY_TP", "2")
    tr = DetectionTrainer(
        overrides={
            "model": str(CFG_TINY),
            "data": str(synth_dataset),
            "imgsz": 160,
            "epochs": 1,
            "batch": 4,
            "workers": 2,
            "max_targets": 16,
            "optimizer": "SGD",
            "lr0": 0.01,
            "amp": False,
            "project": str(tmp_path / "runs"),
            "name": "tp2",
            "mosaic": 0.0,
            "val": True,
            "plots": False,
        },
        model_cfg=str(CFG_TINY),
    )
    metrics = tr.train()
    assert isinstance(tr.state, HybridTrainState)
    assert len(tr.state.sharded_params) > 0, "TP sharded nothing"
    # the sharded leaves really live on the 'model' axis
    specs = [x.sharding.spec for x in tr.state.sharded_params]
    assert any("model" in str(s) for s in specs), specs
    assert "fitness" in metrics
    assert (tr.wdir / "last").exists()

    # checkpoint round-trips through the tree layout back into hybrid form
    from xlstm_yolo_tpu.utils.checkpoint import load_checkpoint

    state2, start_epoch, _ = load_checkpoint(tr.wdir / "last", tr.state)
    assert start_epoch == 1
    a = [np.asarray(x) for x in jax.tree.leaves(tr.state.params)]
    b = [np.asarray(x) for x in jax.tree.leaves(state2.params)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


@pytest.mark.slow
def test_resume_pre_flat_checkpoint_falls_back(synth_dataset, tmp_path, monkeypatch, capsys):
    """A checkpoint written by the per-leaf tree optimizer (pre-flat-opt
    runs, or XY_FLAT_OPT=0) must still resume when the flat-buffer
    optimizer is the default: the trainer detects the opt_state layout
    mismatch and falls back to the tree path for that run."""
    from xlstm_yolo_tpu.engine.steps import TrainState
    from xlstm_yolo_tpu.engine.trainer import DetectionTrainer

    overrides = {
        "model": str(CFG_TINY),
        "data": str(synth_dataset),
        "imgsz": 160,
        "epochs": 1,
        "batch": 4,
        "workers": 2,
        "max_targets": 16,
        "optimizer": "SGD",
        "amp": False,
        "project": str(tmp_path / "runs"),
        "name": "resume_flat",
        "mosaic": 0.0,
        "val": False,
        "plots": False,
        "save": True,
    }
    monkeypatch.setenv("XY_FLAT_OPT", "0")
    tr = DetectionTrainer(overrides=dict(overrides), model_cfg=str(CFG_TINY))
    tr.train()
    assert isinstance(tr.state, TrainState)  # tree layout on disk
    monkeypatch.delenv("XY_FLAT_OPT")

    overrides.update(epochs=2, resume=True, exist_ok=True)
    tr2 = DetectionTrainer(overrides=overrides, model_cfg=str(CFG_TINY))
    tr2.train()
    out = capsys.readouterr().out
    assert "falling back to the per-leaf optimizer" in out
    assert tr2.start_epoch == 1
    assert isinstance(tr2.state, TrainState)


def test_predictor_on_image(tmp_path):
    import cv2

    from xlstm_yolo_tpu.engine.model import YOLO

    img = np.random.default_rng(0).integers(0, 255, (120, 200, 3), dtype=np.uint8)
    p = tmp_path / "im.jpg"
    cv2.imwrite(str(p), img)

    m = YOLO(str(CFG_TINY))
    results = m.predict(str(p), imgsz=160, conf=0.0)
    assert len(results) == 1
    r = results[0]
    assert r.boxes is not None
    # boxes scaled back into original image bounds
    if len(r.boxes):
        assert r.boxes.xyxy[:, 2].max() <= 200 + 1e-3
        assert r.boxes.xyxy[:, 3].max() <= 120 + 1e-3
    js = r.summary()
    assert isinstance(js, list)


@pytest.mark.slow
def test_flagship_predict_bus_jpg():
    """BASELINE config 1: 640-base192 single-image predict on bus.jpg (CPU)."""
    from pathlib import Path

    import pytest

    bus = Path("/root/reference/ultralytics/assets/bus.jpg")
    if not bus.exists():
        pytest.skip("reference assets not mounted")

    from xlstm_yolo_tpu.engine.model import YOLO

    m = YOLO("vil-det-192.yaml")
    results = m.predict(str(bus), conf=0.25)
    assert len(results) == 1
    r = results[0]
    assert r.orig_img.shape[:2] == (1080, 810)
    if len(r.boxes):  # random weights: boxes exist but are meaningless
        assert r.boxes.xyxy[:, [0, 2]].max() <= 810 + 1e-3
        assert r.boxes.xyxy[:, [1, 3]].max() <= 1080 + 1e-3
    assert r.speed["inference"] > 0


@pytest.mark.slow
def test_video_track_bytetrack(tmp_path):
    """BASELINE config 4: video stream predict + ByteTrack ids."""
    import cv2

    from xlstm_yolo_tpu.engine.model import YOLO

    vid = tmp_path / "clip.mp4"
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 10, (160, 160))
    for t in range(6):
        frame = np.full((160, 160, 3), 100, np.uint8)
        cv2.rectangle(frame, (20 + 5 * t, 40), (60 + 5 * t, 100), (0, 0, 255), -1)
        w.write(frame)
    w.release()

    m = YOLO(str(CFG_TINY))
    results = m.track(str(vid), tracker="bytetrack.yaml", imgsz=160, conf=0.0)
    assert len(results) == 6
    for r in results:
        assert r.boxes is not None
        if len(r.boxes) and r.boxes.is_track:
            assert (r.boxes.id >= 0).all()


def test_validator_save_json(synth_dataset, tmp_path):
    from xlstm_yolo_tpu.cfg import get_cfg
    from xlstm_yolo_tpu.engine.model import YOLO
    from xlstm_yolo_tpu.engine.validator import DetectionValidator
    import json

    m = YOLO(str(CFG_TINY))
    bundle = m._get_bundle(imgsz=160)
    cfg = get_cfg(overrides={
        "imgsz": 160, "batch": 4, "workers": 2, "max_targets": 16,
        "data": str(synth_dataset), "save_json": True, "plots": True,
        "conf": 0.01,
    })
    v = DetectionValidator(cfg, data=str(synth_dataset), save_dir=tmp_path)
    res = v(bundle, batch_size=4)
    assert "fitness" in res and "metrics/mAP50-95(B)" in res
    pred_file = tmp_path / "predictions.json"
    assert pred_file.exists()
    j = json.loads(pred_file.read_text())
    if j:
        assert {"image_id", "category_id", "bbox", "score"} <= set(j[0])
    assert v.confusion_matrix.matrix.shape == (3, 3)


@pytest.mark.slow
def test_augmented_loader_mosaic_mixup(synth_dataset):
    """Config-5 semantics: mosaic/mixup/HSV/affine pipeline yields valid
    fixed-shape batches with in-bounds labels."""
    from xlstm_yolo_tpu.cfg import get_cfg
    from xlstm_yolo_tpu.data.build import build_dataloader, build_yolo_dataset
    from xlstm_yolo_tpu.data.dataset import check_det_dataset

    cfg = get_cfg(overrides={
        "imgsz": 160, "max_targets": 32, "workers": 2,
        "mosaic": 1.0, "mixup": 0.5, "degrees": 10.0, "scale": 0.5,
        "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4, "fliplr": 0.5,
    })
    data = check_det_dataset(str(synth_dataset))
    ds = build_yolo_dataset(cfg, data["train"], 4, data, mode="train")
    assert ds.transforms is not None and ds.transforms.mosaic == 1.0
    loader = build_dataloader(ds, 4, workers=2, shuffle=True, seed=3)
    for batch in loader:
        assert batch["img"].shape == (4, 160, 160, 3)
        assert batch["img"].dtype == np.uint8
        b = batch["bboxes"][batch["mask"]]
        if len(b):
            assert b.min() >= -1e-3 and b.max() <= 160 + 1e-3
            assert (b[:, 2] >= b[:, 0]).all() and (b[:, 3] >= b[:, 1]).all()
    # close_mosaic switch
    ds.transforms.mosaic_enabled = False
    s = ds.get_sample(0, __import__("random").Random(0))
    assert s["img"].shape == (160, 160, 3)


@pytest.fixture(scope="module")
def synth_obb_dataset(tmp_path_factory):
    """8 images with 1-3 rotated colored boxes; DOTA yolo-obb labels
    (class + 4 corner points, normalized)."""
    import cv2

    root = tmp_path_factory.mktemp("synthobb")
    for split in ("train", "val"):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        rng = random.Random(3)
        for i in range(8):
            img = np.full((160, 160, 3), 90, np.uint8)
            lines = []
            for _ in range(rng.randint(1, 3)):
                cx, cy = rng.randint(40, 120), rng.randint(40, 120)
                w, h = rng.randint(24, 56), rng.randint(16, 40)
                ang = rng.uniform(0, np.pi / 2)
                c = rng.randint(0, 1)
                color = (0, 0, 255) if c == 0 else (255, 0, 0)
                box = cv2.boxPoints(((cx, cy), (w, h), np.degrees(ang)))
                cv2.fillPoly(img, [box.astype(np.int32)], color)
                pts = np.clip(box / 160.0, 0, 1).reshape(-1)
                lines.append(f"{c} " + " ".join(f"{p:.4f}" for p in pts))
            cv2.imwrite(str(root / "images" / split / f"{i:03d}.jpg"), img)
            (root / "labels" / split / f"{i:03d}.txt").write_text("\n".join(lines))
    data_yaml = root / "data.yaml"
    data_yaml.write_text(yaml.safe_dump({
        "path": str(root), "train": "images/train", "val": "images/val",
        "names": {0: "red", 1: "blue"}, "nc": 2,
    }))
    return data_yaml


@pytest.mark.slow
def test_obb_train_val_predict(synth_obb_dataset, tmp_path):
    """OBB task end-to-end: dataset rbox targets -> train epoch -> rotated
    val -> predictor Results.obb."""
    from xlstm_yolo_tpu.engine.trainer import DetectionTrainer

    cfg_obb = CFG_TINY.parent / "vil-det-tiny-obb.yaml"
    tr = DetectionTrainer(
        overrides={
            "model": str(cfg_obb), "data": str(synth_obb_dataset),
            "task": "obb", "imgsz": 160, "epochs": 1, "batch": 4,
            "workers": 2, "max_targets": 16, "optimizer": "SGD",
            "lr0": 0.01, "amp": False, "project": str(tmp_path / "runs"),
            "val": True, "plots": False,
        },
        model_cfg=str(cfg_obb),
    )
    metrics = tr.train()
    assert "fitness" in metrics

    from xlstm_yolo_tpu.engine.model import YOLO

    m = YOLO(str(cfg_obb), task="obb")
    img = np.full((200, 300, 3), 90, np.uint8)
    res = m.predict(source=img, imgsz=160, conf=0.0)
    assert res[0].obb is not None
    if len(res[0].obb):
        assert res[0].obb.xyxyxyxy.shape[1:] == (4, 2)


@pytest.mark.slow
def test_classify_train_val_predict(tmp_path):
    """Classification task end-to-end on a folder dataset."""
    import cv2

    root = tmp_path / "clsds"
    rng = random.Random(5)
    for split in ("train", "val"):
        for c, color in (("red", (0, 0, 255)), ("blue", (255, 0, 0))):
            d = root / split / c
            d.mkdir(parents=True)
            for i in range(4):
                img = np.full((180, 200, 3), 80, np.uint8)
                cv2.circle(img, (rng.randint(60, 140), rng.randint(60, 120)),
                           rng.randint(20, 50), color, -1)
                cv2.imwrite(str(d / f"{i}.jpg"), img)

    from xlstm_yolo_tpu.engine.trainer import DetectionTrainer

    cfg_cls = CFG_TINY.parent / "vil-cls-tiny.yaml"
    tr = DetectionTrainer(
        overrides={
            "model": str(cfg_cls), "data": str(root), "task": "classify",
            "imgsz": 160, "epochs": 2, "batch": 4, "workers": 2,
            "optimizer": "SGD", "lr0": 0.05, "amp": False,
            "project": str(tmp_path / "runs"), "val": True, "plots": False,
        },
        model_cfg=str(cfg_cls),
    )
    metrics = tr.train()
    assert "metrics/accuracy_top1" in metrics

    from xlstm_yolo_tpu.engine.model import YOLO

    m = YOLO(str(cfg_cls), task="classify")
    img = np.full((180, 200, 3), 80, np.uint8)
    res = m.predict(source=img, imgsz=160)
    assert res[0].probs is not None and res[0].probs.top1 is not None


@pytest.mark.slow
def test_int8_ptq_export_roundtrip(tmp_path):
    """orbax_int8 export -> AutoBackend load: outputs match bf16 weights
    closely (weight-only PTQ)."""
    from types import SimpleNamespace

    import jax
    import jax.numpy as jnp

    from xlstm_yolo_tpu.engine.exporter import Exporter
    from xlstm_yolo_tpu.nn.autobackend import AutoBackend
    from xlstm_yolo_tpu.nn.tasks import build_detection_model
    from xlstm_yolo_tpu.utils.quantize import (
        dequantize_tree, is_quantized_tree, quantize_tree,
    )

    cfg = "xlstm_yolo_tpu/cfg/models/vil-det-tiny.yaml"
    model, _ = build_detection_model(cfg)
    img = jnp.zeros((1, 160, 160, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)

    qt = quantize_tree(jax.tree.map(np.asarray, variables["params"]))
    assert is_quantized_tree(qt)
    dq = dequantize_tree(qt)
    # per-leaf relative error bounded by the int8 grid
    for a, b in zip(jax.tree.leaves(variables["params"]), jax.tree.leaves(dq)):
        a = np.asarray(a)
        if a.ndim >= 2 and a.size >= 1024:
            assert np.abs(a - b).max() <= np.abs(a).max() / 127 + 1e-6

    args = SimpleNamespace(format="orbax_int8", imgsz=160, batch=1)
    path = Exporter(args)(
        {"model": model, "variables": variables}, out_dir=tmp_path)
    ab = AutoBackend(path, model_cfg=cfg, imgsz=160, compute_dtype=None)
    assert ab.format == "orbax_int8"

    u8 = (np.random.default_rng(0).uniform(0, 255, (1, 160, 160, 3))).astype(np.uint8)
    y_ref = np.asarray(model.apply(variables, jnp.asarray(u8, jnp.float32) / 255.0)[0])
    y_q = np.asarray(ab.forward(jnp.asarray(u8)))
    assert y_q.shape == y_ref.shape
    # random-init logits amplify the int8 grid through top-k reordering;
    # bound the *distributional* drift (trained weights track much closer)
    assert abs(y_q[..., 4].mean() - y_ref[..., 4].mean()) < 0.05
    assert np.abs(np.sort(y_q[..., 4], -1) - np.sort(y_ref[..., 4], -1)).max() < 0.2


@pytest.mark.slow
def test_tflite_export_roundtrip(tmp_path):
    """tflite export (jax2tf + flex ops) -> AutoBackend TF interpreter:
    outputs match the jitted flax forward."""
    from types import SimpleNamespace

    import jax
    import jax.numpy as jnp

    pytest.importorskip("tensorflow")
    from xlstm_yolo_tpu.engine.exporter import Exporter
    from xlstm_yolo_tpu.nn.autobackend import AutoBackend
    from xlstm_yolo_tpu.nn.tasks import build_detection_model

    cfg = "xlstm_yolo_tpu/cfg/models/vil-det-tiny.yaml"
    model, _ = build_detection_model(cfg, training=False)
    img = jnp.zeros((1, 96, 96, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)

    args = SimpleNamespace(format="tflite", imgsz=96, batch=1)
    path = Exporter(args)(
        {"model": model, "variables": variables}, out_dir=tmp_path)
    assert Path(path).suffix == ".tflite"
    ab = AutoBackend(path, imgsz=96)
    assert ab.format == "tflite"

    u8 = np.random.default_rng(0).integers(0, 255, (1, 96, 96, 3), np.uint8)
    y_ref = np.asarray(model.apply(variables, jnp.asarray(u8, jnp.float32) / 255.0)[0])
    y_tfl = np.asarray(ab.forward(u8))
    assert y_tfl.shape == y_ref.shape
    assert np.abs(y_tfl - y_ref).max() < 0.05


def test_throughput_engine_scan_parity():
    """ThroughputEngine yields the same results as per-batch predict."""
    import jax.numpy as jnp

    from xlstm_yolo_tpu.engine.serving import ThroughputEngine

    W = jnp.asarray(np.random.default_rng(1).normal(size=(12, 4)), jnp.float32)

    def predict(img_u8):
        x = img_u8.astype(jnp.float32) / 255.0
        return x.reshape(x.shape[0], -1, 12) @ W

    eng = ThroughputEngine(predict, scan=3)
    rng = np.random.default_rng(2)
    batches = [rng.integers(0, 255, (2, 2, 2, 3), np.uint8) for _ in range(7)]
    outs = list(eng(batches))
    assert len(outs) == 7
    for b, o in zip(batches, outs):
        np.testing.assert_allclose(
            o, np.asarray(predict(jnp.asarray(b))), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_fastsam_prompted_predict(synth_dataset):
    """FastSAM: segment-everything + bbox/point prompt selection
    (ref:models/fastsam/predict.py:47-123)."""
    from xlstm_yolo_tpu.models.fastsam import FastSAM

    img_dir = Path(synth_dataset).parent / "images" / "train"
    src = sorted(img_dir.glob("*.jpg"))[0]

    m = FastSAM("xlstm_yolo_tpu/cfg/models/vil-det-tiny-seg.yaml")
    base = m.predict(str(src), conf=0.0, imgsz=160)
    assert len(base) == 1
    r = base[0]
    n_all = len(r)

    # bbox prompt selects exactly one mask per box (argmax IoU)
    bb = [10, 10, 100, 100]
    sel = m.predict(str(src), conf=0.0, imgsz=160, bboxes=[bb])
    assert len(sel) == 1
    if n_all:
        assert len(sel[0]) == 1

    # point prompt: masks containing the point
    sel2 = m.predict(str(src), conf=0.0, imgsz=160, points=[[50, 50]])
    assert len(sel2) == 1

    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        m.predict(str(src), conf=0.0, imgsz=160, texts="a red box")


@pytest.mark.slow
def test_rtdetr_predict_and_val(synth_dataset):
    """RT-DETR plugin: tiny graph builds, predicts, and validates e2e
    (ref:models/rtdetr/{model,predict,val}.py)."""
    from xlstm_yolo_tpu.models.rtdetr import RTDETR

    root = Path(synth_dataset).parent
    src = sorted((root / "images" / "train").glob("*.jpg"))[0]

    m = RTDETR("xlstm_yolo_tpu/cfg/models/rtdetr-tiny.yaml")
    res = m.predict(str(src), conf=0.0, imgsz=160)
    assert len(res) == 1
    r = res[0]
    if len(r):
        xyxy = r.boxes.xyxy
        assert (xyxy[:, 2] >= xyxy[:, 0]).all()

    metrics = m.val(data=str(synth_dataset), imgsz=160, batch=4, conf=0.001)
    assert "metrics/mAP50-95(B)" in metrics or hasattr(metrics, "box")


@pytest.mark.slow
def test_rtdetr_train_short(synth_dataset):
    """RT-DETR trains a couple of steps through the standard trainer
    (Hungarian DETR loss via pure_callback under jit)."""
    from xlstm_yolo_tpu.models.rtdetr import RTDETR

    m = RTDETR("xlstm_yolo_tpu/cfg/models/rtdetr-tiny.yaml")
    res = m.train(data=str(synth_dataset), epochs=1, batch=4, imgsz=160,
                  workers=0, val=False, save=False, plots=False,
                  warmup_epochs=0.0)
    assert res is not None


@pytest.mark.slow
def test_benchmark_over_formats(tmp_path):
    """Facade benchmark() exports each XLA format, reloads and times it
    (ref:utils/benchmarks.py:51 exports+reloads+times each format)."""
    from xlstm_yolo_tpu.engine.model import YOLO
    from xlstm_yolo_tpu.utils.benchmarks import benchmark

    m = YOLO(str(CFG_TINY))
    rows = benchmark(m, imgsz=160, batch=1,
                     formats=("jit", "stablehlo", "orbax", "orbax_int8"),
                     verbose=False, out_dir=tmp_path)
    by_fmt = {r["format"]: r for r in rows}
    assert set(by_fmt) == {"jit", "stablehlo", "orbax", "orbax_int8"}
    for fmt, r in by_fmt.items():
        assert r["status"] == "ok", f"{fmt}: {r['status']}"
        assert r["img/s"] > 0
