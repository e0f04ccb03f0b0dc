"""Hyperparameter tuning: mutation evolution + facade/CLI wiring + ray gate.

Parity targets: ref:ultralytics/engine/tuner.py (Tuner), ref:engine/
model.py Model.tune, ref:utils/tuner.py run_ray_tune.
"""

import random
from pathlib import Path

import numpy as np
import pytest
import yaml

CFG_TINY = Path(__file__).resolve().parents[1] / "xlstm_yolo_tpu" / "cfg" / "models" / "vil-det-tiny.yaml"


def test_mutation_stays_in_bounds():
    from xlstm_yolo_tpu.engine.tuner import SPACE, Tuner

    t = Tuner({}, save_dir="runs/tune_test_bounds")
    rng = random.Random(0)
    parent = {k: (lo + hi) / 2 for k, (lo, hi, _g) in SPACE.items()}
    for _ in range(20):
        child = t._mutate(parent, rng)
        for k, (lo, hi, _g) in SPACE.items():
            assert lo <= child[k] <= hi
        parent = child


def test_ray_tune_space_and_gate():
    from xlstm_yolo_tpu.engine.tuner import ray_tune_space, run_ray_tune

    s = ray_tune_space()
    assert {"lr0", "momentum", "copy_paste", "warmup_momentum"} <= set(s)
    assert all(len(v) == 2 and v[0] <= v[1] for v in s.values())
    with pytest.raises(ModuleNotFoundError, match="[Rr]ay"):
        run_ray_tune(object())


def test_cli_mode_includes_tune():
    from xlstm_yolo_tpu.cfg import MODES

    assert "tune" in MODES


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("tuneds")
    for split in ("train", "val"):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        rng = random.Random(0)
        for i in range(8):
            img = np.full((160, 160, 3), 90, np.uint8)
            w, h = rng.randint(30, 60), rng.randint(30, 60)
            x, y = rng.randint(0, 159 - w), rng.randint(0, 159 - h)
            cv2.rectangle(img, (x, y), (x + w, y + h), (0, 0, 255), -1)
            cv2.imwrite(str(root / "images" / split / f"{i:03d}.jpg"), img)
            (root / "labels" / split / f"{i:03d}.txt").write_text(
                f"0 {(x + w / 2) / 160:.4f} {(y + h / 2) / 160:.4f} "
                f"{w / 160:.4f} {h / 160:.4f}")
    data_yaml = root / "data.yaml"
    data_yaml.write_text(yaml.safe_dump({
        "path": str(root), "train": "images/train", "val": "images/val",
        "names": {0: "red"}, "nc": 1}))
    return data_yaml


@pytest.mark.slow
def test_tune_end_to_end(synth_dataset, tmp_path):
    """YOLO.tune runs generations, logs csv, returns best hyps in bounds."""
    from xlstm_yolo_tpu.engine.model import YOLO
    from xlstm_yolo_tpu.engine.tuner import SPACE

    m = YOLO(str(CFG_TINY), task="detect")
    best_hyp, best_fit = m.tune(
        data=str(synth_dataset), iterations=2, epochs_per_iter=1,
        save_dir=str(tmp_path / "tune"), imgsz=160, batch=2, workers=0,
        plots=False)
    assert np.isfinite(best_fit) and best_fit >= 0.0
    for k, v in best_hyp.items():
        if k in SPACE:
            lo, hi, _ = SPACE[k]
            assert lo <= v <= hi
    assert (tmp_path / "tune" / "tune_results.csv").exists()
    assert (tmp_path / "tune" / "best_hyperparameters.yaml").exists()
