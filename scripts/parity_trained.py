#!/usr/bin/env python
"""Trained-checkpoint mAP parity (VERDICT r2 item 6).

The round-2 parity used seeded random-init weights; random-init gates
sit where the documented CPU/GPU gate-math divergence is invisible.
This script briefly TRAINS the reference torch model on the synthetic
set (CPU, a few dozen steps with its own v8DetectionLoss — enough to
push gates/soft-caps into their nonlinear regimes), then re-runs the
round-2 protocol on the trained weights:

1. torch-seed 0 reference DetectionModel (640-base192.yaml)
2. short CPU train loop on synthetic images w/ pseudo-labels
3. regenerate pseudo-labels from the TRAINED model
4. reference DetectionValidator vs ours on converted weights
5. append the numbers to PARITY.md + PARITY_TRAINED.json

Run: python scripts/parity_trained.py [--steps 30]   (~45-60 min CPU)
"""

from __future__ import annotations

import argparse
import copy
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))
sys.path.insert(0, str(REPO / "scripts"))

import ref_loader  # noqa: E402
import parity_map as pm  # noqa: E402


def short_train(tm, files, out_root: Path, steps: int, imgsz: int = 640):
    """A few optimizer steps with the reference's own loss on the
    pseudo-labeled synthetic set (ref:engine/trainer.py hot loop,
    reduced to the bare math — model.loss + AdamW)."""
    import cv2
    import torch
    from ultralytics.data.augment import LetterBox

    letterbox = LetterBox((imgsz, imgsz), auto=False, scaleup=False)
    lbdir = out_root / "labels" / "val"

    def load_one(f: Path):
        im0 = cv2.imread(str(f))
        im = letterbox(image=im0)
        img = torch.from_numpy(im[..., ::-1].copy()).permute(2, 0, 1).float() / 255.0
        rows = []
        lp = lbdir / f"{f.stem}.txt"
        if lp.exists():
            for line in lp.read_text().splitlines():
                v = line.split()
                rows.append([float(v[0]), *map(float, v[1:5])])
        lab = np.asarray(rows, np.float32).reshape(-1, 5)
        # labels are normalized to the ORIGINAL image; map through the
        # letterbox so gt matches the training tensor
        h0, w0 = im0.shape[:2]
        r = min(imgsz / h0, imgsz / w0, 1.0)
        padw = (imgsz - w0 * r) / 2
        padh = (imgsz - h0 * r) / 2
        cxy = lab[:, 1:3] * [w0, h0] * r + [padw, padh]
        wh = lab[:, 3:5] * [w0, h0] * r
        lab[:, 1:3] = cxy / imgsz
        lab[:, 3:5] = wh / imgsz
        return img, lab

    tm.train()
    tm.args = type("A", (), {"box": 7.5, "cls": 0.5, "dfl": 1.5})()
    opt = torch.optim.AdamW(tm.parameters(), lr=1e-3, weight_decay=0.0)
    n = len(files)
    for it in range(steps):
        f = files[it % n]
        img, lab = load_one(f)
        batch = {
            "img": img[None],
            "batch_idx": torch.zeros(len(lab)),
            "cls": torch.from_numpy(lab[:, 0:1]),
            "bboxes": torch.from_numpy(lab[:, 1:5]),
        }
        loss, items = tm.loss(batch)
        opt.zero_grad()
        loss.sum().backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), 10.0)
        opt.step()
        if it % 5 == 0:
            print(f"train step {it}: loss={float(loss.sum()):.3f}", flush=True)
    tm.eval()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    out_root = Path("/tmp/parity_ds_trained")
    rng = np.random.default_rng(20260817)

    ref_loader.load_reference()
    import torch
    from ultralytics.nn.tasks import DetectionModel as TorchDetectionModel

    torch.manual_seed(0)
    tm = TorchDetectionModel(pm.MODEL_YAML, verbose=False).eval()

    files = pm.make_images(out_root, rng)
    sd_path = out_root / "trained_sd.pt"
    if sd_path.exists():
        tm.load_state_dict(torch.load(sd_path, map_location="cpu"))
        tm.eval()
        print("loaded cached trained weights", flush=True)
    else:
        # bootstrap labels from the random-init model, train on them, then
        # re-label with the trained model (so the val labels are the trained
        # model's own confident predictions — the round-2 protocol)
        pm.pseudo_labels(tm, files, out_root)
        short_train(tm, files, out_root, steps=args.steps)
        torch.save(tm.state_dict(), sd_path)
    for f in (out_root / "labels" / "val").glob("*.txt"):
        f.unlink()
    n_labels = pm.pseudo_labels(tm, files, out_root)
    print(f"trained pseudo-labels: {n_labels} boxes", flush=True)

    names = {i: f"c{i}" for i in range(len(tm.names))}
    yaml_path = out_root / "parity.yaml"
    yaml_path.write_text(
        f"path: {out_root}\ntrain: images/val\nval: images/val\n"
        f"nc: {len(names)}\nnames:\n"
        + "".join(f"  {k}: {v}\n" for k, v in names.items())
    )

    torch_sd = copy.deepcopy(dict(tm.state_dict()))
    ref_stats = pm.run_reference_val(tm, yaml_path)
    print("reference:", json.dumps(ref_stats), flush=True)
    our_stats = pm.run_our_val(torch_sd, yaml_path)
    print("ours:     ", json.dumps(our_stats), flush=True)

    delta = our_stats.get("metrics/mAP50-95(B)", float("nan")) - ref_stats.get(
        "metrics/mAP50-95(B)", float("nan"))
    (REPO / "PARITY_TRAINED.json").write_text(json.dumps({
        "steps": args.steps, "reference": ref_stats, "ours": our_stats,
        "delta_map5095": delta, "n_labels": n_labels,
    }, indent=1))
    print(f"delta mAP50-95 (trained weights): {delta:+.4f}")

    md = REPO / "PARITY.md"
    txt = md.read_text()
    marker = "## Trained-weights parity"
    section = (
        f"\n{marker}\n\n"
        f"Same protocol after {args.steps} AdamW steps of CPU training on the\n"
        f"reference side (its own v8DetectionLoss), labels regenerated from the\n"
        f"trained model (`python scripts/parity_trained.py`), so gates/soft-caps\n"
        f"sit in trained regimes:\n\n"
        f"| metric | reference | ours | delta |\n|---|---|---|---|\n"
        f"| mAP50 | {ref_stats['metrics/mAP50(B)']:.4f} | {our_stats['metrics/mAP50(B)']:.4f} | {our_stats['metrics/mAP50(B)'] - ref_stats['metrics/mAP50(B)']:+.4f} |\n"
        f"| mAP50-95 | {ref_stats['metrics/mAP50-95(B)']:.4f} | {our_stats['metrics/mAP50-95(B)']:.4f} | {delta:+.4f} |\n"
    )
    if marker in txt:
        txt = txt[: txt.index(marker)].rstrip() + "\n" + section
    else:
        txt = txt.rstrip() + "\n" + section
    md.write_text(txt)


if __name__ == "__main__":
    main()
