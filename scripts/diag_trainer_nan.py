#!/usr/bin/env python
"""Run the REAL trainer once with the fused backwards toggled by env —
the trainer-level control for the r5 e2e NaN.

Usage: XY_EPI_FUSE=0 XY_FFN_FUSE=0 python scripts/diag_trainer_nan.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import exp_host_pipeline  # noqa: E402
from exp_host_pipeline import make_dataset  # noqa: E402


def main():
    exp_host_pipeline.N_IMGS = 240
    tmp = Path(tempfile.mkdtemp(prefix="nantrain"))
    data_yaml = make_dataset(tmp)

    from xlstm_yolo_tpu.engine.trainer import DetectionTrainer

    cfg_path = str(REPO / "xlstm_yolo_tpu/cfg/models/vil-det-192.yaml")
    tr = DetectionTrainer(
        overrides=dict(
            model=cfg_path, data=str(data_yaml), imgsz=640, batch=8,
            epochs=3, nbs=8, val=False, plots=False, workers=4,
            cache="ram", save=False, seed=0,
            project=tempfile.mkdtemp(prefix="nantrainrun")),
        model_cfg=cfg_path)
    tr.train()


if __name__ == "__main__":
    main()
