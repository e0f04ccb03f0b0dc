#!/usr/bin/env python
"""OBB training-improves-rotated-mAP artifact (completes the
detect/segment/pose/obb convergence quartet — convergence_demo.py,
convergence_seg.py, convergence_pose.py).

Trains the tiny 160px ViL-YOLO-obb on a synthetic rotated-box dataset
(filled rotated rectangles, 2 classes, DOTA yolo-obb labels) for N
epochs, validating rotated (probiou-matched) mAP every epoch via
OBBValidator, and writes:
- runs/obb/convergence/results.csv
- docs/CONVERGENCE_OBB.md

Exit criterion: final fitness > first and rotated mAP50 > 0.3.
Run: python scripts/convergence_obb.py [--epochs 120]
"""

from __future__ import annotations

import argparse
import csv
import random
import shutil
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import cv2  # noqa: E402
import yaml  # noqa: E402


def write_dataset(root: Path, n_train=64, n_val=16, size=160):
    rng = random.Random(0)
    for split, n in (("train", n_train), ("val", n_val)):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = np.full((size, size, 3), 90, np.uint8)
            img = cv2.add(img, np.random.default_rng(i).integers(
                0, 25, (size, size, 3), np.uint8))
            lines = []
            for _ in range(rng.randint(1, 3)):
                cx, cy = rng.randint(40, size - 40), rng.randint(40, size - 40)
                w, h = rng.randint(28, 56), rng.randint(16, 36)
                ang = rng.uniform(0, 90.0)
                c = rng.randint(0, 1)
                color = (0, 0, 220) if c == 0 else (220, 0, 0)
                box = cv2.boxPoints(((cx, cy), (w, h), ang))
                cv2.fillPoly(img, [box.astype(np.int32)], color)
                pts = np.clip(box / size, 0, 1).reshape(-1)
                lines.append(f"{c} " + " ".join(f"{p:.4f}" for p in pts))
            cv2.imwrite(str(root / "images" / split / f"{i:03d}.jpg"), img)
            (root / "labels" / split / f"{i:03d}.txt").write_text("\n".join(lines))
    data_yaml = root / "data.yaml"
    data_yaml.write_text(yaml.safe_dump({
        "path": str(root), "train": "images/train", "val": "images/val",
        "names": {0: "red", 1: "blue"}, "nc": 2,
    }))
    return data_yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=120)
    args = ap.parse_args()

    from xlstm_yolo_tpu.engine.trainer import DetectionTrainer

    ds_root = Path("/tmp/convergence_obb_ds")
    if ds_root.exists():
        shutil.rmtree(ds_root)
    data_yaml = write_dataset(ds_root)
    run_dir = REPO / "runs" / "obb" / "convergence"
    if run_dir.exists():
        shutil.rmtree(run_dir)

    cfg = str(REPO / "xlstm_yolo_tpu/cfg/models/vil-det-tiny-obb.yaml")
    tr = DetectionTrainer(overrides={
        "task": "obb",
        "model": cfg,
        "data": str(data_yaml),
        "imgsz": 160, "epochs": args.epochs, "batch": 8, "workers": 4,
        "max_targets": 16, "optimizer": "AdamW", "lr0": 1e-3, "lrf": 0.1,
        "amp": False, "project": str(REPO / "runs" / "obb"),
        "name": "convergence", "exist_ok": True,
        "mosaic": 0.0, "fliplr": 0.5, "scale": 0.2, "translate": 0.1,
        "val": True, "plots": False, "patience": 1000, "close_mosaic": 0,
    }, model_cfg=cfg)
    tr.train()

    rows = list(csv.DictReader(open(tr.csv_path)))
    f0 = float(rows[0].get("fitness") or 0)
    f1 = float(rows[-1].get("fitness") or 0)
    m_key = "metrics/mAP50(B)"
    map50 = float(rows[-1].get(m_key) or 0)

    lines = [
        "# OBB convergence artifact (round 3)",
        "",
        f"Tiny 160px ViL-YOLO-obb, synthetic rotated-box set, {args.epochs}",
        "epochs, AdamW 1e-3, flip/scale aug, CPU run via",
        "`python scripts/convergence_obb.py`. Rotated mAP is probiou-matched",
        "(OBBValidator). Full log: `runs/obb/convergence/results.csv`",
        "(committed).",
        "",
        "| epoch | loss | rotated mAP50 | rotated mAP50-95 | fitness |",
        "|---|---|---|---|---|",
    ]
    show = [r for i, r in enumerate(rows) if i % max(1, len(rows) // 15) == 0]
    if rows and rows[-1] not in show:
        show.append(rows[-1])
    for r in show:
        lines.append(
            f"| {r['epoch']} | {float(r.get('loss') or 0):.2f} "
            f"| {float(r.get(m_key) or 0):.4f} "
            f"| {float(r.get('metrics/mAP50-95(B)') or 0):.4f} "
            f"| {float(r.get('fitness') or 0):.4f} |")
    verdict = "PASS" if (f1 > f0 and map50 > 0.3) else "FAIL"
    lines += ["", f"**Exit criterion** (final fitness > first and rotated mAP50 > 0.3): "
                  f"**{verdict}** (fitness {f0:.4f} -> {f1:.4f}, final rotated mAP50 {map50:.4f})"]
    (REPO / "docs" / "CONVERGENCE_OBB.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines[-3:]))


if __name__ == "__main__":
    main()
