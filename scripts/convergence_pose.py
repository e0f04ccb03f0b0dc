#!/usr/bin/env python
"""Pose training-improves-OKS-mAP artifact (completes the
detect/segment/pose convergence trio — scripts/convergence_demo.py,
scripts/convergence_seg.py).

Trains the tiny 160px ViL-YOLO-pose on a synthetic keypoint dataset
(filled rectangles whose 4 corners are the keypoints, plus distractor
blobs) for N epochs, validating pose (OKS) mAP every epoch via
PoseValidator, and writes:
- runs/pose/convergence/results.csv
- docs/CONVERGENCE_POSE.md

Exit criterion: final fitness > first and pose mAP50 > 0.3.
Run: python scripts/convergence_pose.py [--epochs 120]
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

K = 4  # keypoints per instance: the 4 rectangle corners


def write_dataset(root: Path, n_train=64, n_val=16, size=160):
    rng = random.Random(0)
    for split, n in (("train", n_train), ("val", n_val)):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = np.full((size, size, 3), 70, np.uint8)
            img = cv2.add(img, np.random.default_rng(i).integers(
                0, 25, (size, size, 3), np.uint8))
            # distractor circle (no label) so the model must learn shape
            cv2.circle(img, (rng.randint(10, size - 10), rng.randint(10, size - 10)),
                       rng.randint(5, 12), (0, 160, 0), -1)
            lines = []
            for _ in range(rng.randint(1, 2)):
                w, h = rng.randint(28, 55), rng.randint(28, 55)
                x, y = rng.randint(4, size - 4 - w), rng.randint(4, size - 4 - h)
                cv2.rectangle(img, (x, y), (x + w, y + h), (0, 0, 220), -1)
                # corner markers make the keypoints visually localizable
                for kx, ky in ((x, y), (x + w, y), (x, y + h), (x + w, y + h)):
                    cv2.circle(img, (kx, ky), 3, (255, 255, 255), -1)
                kpts = [(x, y), (x + w, y), (x, y + h), (x + w, y + h)]
                ks = " ".join(f"{kx / size:.4f} {ky / size:.4f} 2" for kx, ky in kpts)
                lines.append(
                    f"0 {(x + w / 2) / size:.4f} {(y + h / 2) / size:.4f} "
                    f"{w / size:.4f} {h / size:.4f} {ks}")
            cv2.imwrite(str(root / "images" / split / f"{i:03d}.jpg"), img)
            (root / "labels" / split / f"{i:03d}.txt").write_text("\n".join(lines))
    data_yaml = root / "data.yaml"
    data_yaml.write_text(yaml.safe_dump({
        "path": str(root), "train": "images/train", "val": "images/val",
        "names": {0: "rect"}, "nc": 1,
        "kpt_shape": [K, 3], "flip_idx": [1, 0, 3, 2],
    }))
    return data_yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=120)
    args = ap.parse_args()

    from xlstm_yolo_tpu.engine.trainer import DetectionTrainer

    ds_root = Path("/tmp/convergence_pose_ds")
    if ds_root.exists():
        shutil.rmtree(ds_root)
    data_yaml = write_dataset(ds_root)
    run_dir = REPO / "runs" / "pose" / "convergence"
    if run_dir.exists():
        shutil.rmtree(run_dir)

    cfg = str(REPO / "xlstm_yolo_tpu/cfg/models/vil-det-tiny-pose.yaml")
    tr = DetectionTrainer(overrides={
        "task": "pose",
        "model": cfg,
        "data": str(data_yaml),
        "imgsz": 160, "epochs": args.epochs, "batch": 8, "workers": 4,
        "max_targets": 16, "optimizer": "AdamW", "lr0": 1e-3, "lrf": 0.1,
        "amp": False, "project": str(REPO / "runs" / "pose"),
        "name": "convergence", "exist_ok": True,
        "mosaic": 0.0, "fliplr": 0.5, "scale": 0.2, "translate": 0.1,
        "val": True, "plots": False, "patience": 1000, "close_mosaic": 0,
    }, model_cfg=cfg)
    tr.train()

    rows = list(csv.DictReader(open(tr.csv_path)))
    f0 = float(rows[0].get("fitness") or 0)
    f1 = float(rows[-1].get("fitness") or 0)
    m_key = "metrics/mAP50(P)"
    map50p = float(rows[-1].get(m_key) or 0)

    lines = [
        "# Pose convergence artifact (round 3)",
        "",
        f"Tiny 160px ViL-YOLO-pose, synthetic corner-keypoint set, {args.epochs}",
        "epochs, AdamW 1e-3, flip/scale aug, CPU run via",
        "`python scripts/convergence_pose.py`. Full log:",
        "`runs/pose/convergence/results.csv` (committed).",
        "",
        "| epoch | loss | box mAP50 | pose mAP50 | pose mAP50-95 | fitness |",
        "|---|---|---|---|---|---|",
    ]
    show = [r for i, r in enumerate(rows) if i % max(1, len(rows) // 15) == 0]
    if rows and rows[-1] not in show:
        show.append(rows[-1])
    for r in show:
        lines.append(
            f"| {r['epoch']} | {float(r.get('loss') or 0):.2f} "
            f"| {float(r.get('metrics/mAP50(B)') or 0):.4f} "
            f"| {float(r.get(m_key) or 0):.4f} "
            f"| {float(r.get('metrics/mAP50-95(P)') or 0):.4f} "
            f"| {float(r.get('fitness') or 0):.4f} |")
    verdict = "PASS" if (f1 > f0 and map50p > 0.3) else "FAIL"
    lines += ["", f"**Exit criterion** (final fitness > first and pose mAP50 > 0.3): "
                  f"**{verdict}** (fitness {f0:.4f} -> {f1:.4f}, final pose mAP50 {map50p:.4f})"]
    (REPO / "docs" / "CONVERGENCE_POSE.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines[-3:]))


if __name__ == "__main__":
    main()
