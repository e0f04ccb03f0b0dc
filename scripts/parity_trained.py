#!/usr/bin/env python
"""Trained-checkpoint mAP parity (VERDICT r2 item 6).

The round-2 parity used seeded random-init weights; random-init gates
sit where the documented CPU/GPU gate-math divergence is invisible.

Protocol (v2 — real labels, see PARITY.md for the v1 post-mortem):
1. synthetic shape images with REAL ground-truth labels
   (rect = class 0, circle = class 1) — not pseudo-labels, so the
   target set cannot be tie-degenerate;
2. train the reference torch model on them on CPU (its own
   v8DetectionLoss + AdamW) until it emits confident, well-separated
   detections — gates/soft-caps reach genuinely trained regimes;
3. reference DetectionValidator vs ours on the converted weights,
   both against the same real labels at the standard conf;
4. write PARITY_TRAINED.json + a PARITY.md section.

The v1 protocol (pseudo-labels from a 30-step model) measured
tie-ordering noise, not parity: the briefly-trained model's top-20
confidences collapse to a uniform ~7e-4, so both validators pick among
near-identical boxes and 3/48 flips cost -0.0101 mAP while the raw
outputs agreed to <1e-6 in conf (scripts/parity_trained_diag.py).

Run: python scripts/parity_trained.py [--steps 150]  (~45-90 min CPU)
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


def make_images_real(root: Path, rng: np.random.Generator) -> list[Path]:
    """pm.make_images drawing loop + REAL yolo-format labels on disk."""
    import cv2

    imdir = root / "images" / "val"
    lbdir = root / "labels" / "val"
    imdir.mkdir(parents=True, exist_ok=True)
    lbdir.mkdir(parents=True, exist_ok=True)
    files = []
    for i in range(pm.N_IMAGES):
        h, w = pm.SIZES[i % len(pm.SIZES)]
        img = rng.integers(0, 80, size=(h, w, 3), dtype=np.uint8)
        lines = []
        for _ in range(rng.integers(4, 9)):
            x0, y0 = int(rng.integers(0, w - 40)), int(rng.integers(0, h - 40))
            bw, bh = int(rng.integers(30, w // 2)), int(rng.integers(30, h // 2))
            color = tuple(int(c) for c in rng.integers(60, 255, 3))
            if rng.random() < 0.5:
                x1, y1 = min(x0 + bw, w - 1), min(y0 + bh, h - 1)
                cv2.rectangle(img, (x0, y0), (x1, y1), color, -1)
                cls = 0
            else:
                cx, cy, r = x0 + bw // 2, y0 + bh // 2, min(bw, bh) // 2
                cv2.circle(img, (cx, cy), r, color, -1)
                x0, y0 = max(cx - r, 0), max(cy - r, 0)
                x1, y1 = min(cx + r, w - 1), min(cy + r, h - 1)
                cls = 1
            bcx, bcy = (x0 + x1) / 2 / w, (y0 + y1) / 2 / h
            bww, bhh = (x1 - x0) / w, (y1 - y0) / h
            if bww > 1e-3 and bhh > 1e-3:
                lines.append(f"{cls} {bcx:.6f} {bcy:.6f} {bww:.6f} {bhh:.6f}")
        f = imdir / f"im{i:03d}.jpg"
        cv2.imwrite(str(f), img, [cv2.IMWRITE_JPEG_QUALITY, 95])
        (lbdir / f"im{i:03d}.txt").write_text("\n".join(lines) + "\n")
        files.append(f)
    return files


def short_train(tm, files, out_root: Path, steps: int, imgsz: int = 640):
    """Optimizer steps with the reference's own loss on the real-labeled
    synthetic set (ref:engine/trainer.py hot loop, reduced to the bare
    math — model.loss + AdamW)."""
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
    cached = [load_one(f) for f in files]
    for it in range(steps):
        img, lab = cached[it % n]
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
        if it % 10 == 0:
            print(f"train step {it}: loss={float(loss.sum()):.3f}", flush=True)
    tm.eval()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--images", type=int, default=0,
                    help="override pm.N_IMAGES (VERDICT r3 item 6: scale "
                         "the label set to >= 1000; ~160 images suffice)")
    args = ap.parse_args()

    if args.images:
        pm.N_IMAGES = args.images

    out_root = Path(f"/tmp/parity_ds_trained_v2_{pm.N_IMAGES}"
                    if args.images else "/tmp/parity_ds_trained_v2")
    rng = np.random.default_rng(20260817)

    ref_loader.load_reference()
    import torch
    from ultralytics.nn.tasks import DetectionModel as TorchDetectionModel

    torch.manual_seed(0)
    tm = TorchDetectionModel(pm.MODEL_YAML, verbose=False).eval()

    files = make_images_real(out_root, rng)
    sd_path = out_root / f"trained_sd_{args.steps}.pt"
    if sd_path.exists():
        tm.load_state_dict(torch.load(sd_path, map_location="cpu"))
        tm.eval()
        print("loaded cached trained weights", flush=True)
    else:
        short_train(tm, files, out_root, steps=args.steps)
        torch.save(tm.state_dict(), sd_path)

    names = {i: f"c{i}" for i in range(len(tm.names))}
    yaml_path = out_root / "parity.yaml"
    yaml_path.write_text(
        f"path: {out_root}\ntrain: images/val\nval: images/val\n"
        f"nc: {len(names)}\nnames:\n"
        + "".join(f"  {k}: {v}\n" for k, v in names.items())
    )

    # real-label protocol: standard val conf, normal det budget
    pm.CONF = 0.001
    pm.MAX_DET = 300

    torch_sd = copy.deepcopy(dict(tm.state_dict()))
    ref_stats = pm.run_reference_val(tm, yaml_path)
    print("reference:", json.dumps(ref_stats), flush=True)
    # exp-gate kernel: the math the reference itself runs on CPU
    # (vision_lstm2.py dispatches CPU to mlstm_kernels' exp-gate
    # chunkwise) — this is the apples-to-apples comparison. The default
    # siging kernel is the GPU/deployment math; at trained gate regimes
    # the two diverge BY DESIGN in the reference (docs/KNOWN_ISSUES.md).
    our_stats = pm.run_our_val(torch_sd, yaml_path,
                               kernel="chunkwise--native_stablef")
    print("ours(exp-gate):", json.dumps(our_stats), flush=True)
    our_siging = pm.run_our_val(torch_sd, yaml_path)
    print("ours(siging):  ", json.dumps(our_siging), flush=True)

    delta = our_stats.get("metrics/mAP50-95(B)", float("nan")) - ref_stats.get(
        "metrics/mAP50-95(B)", float("nan"))
    delta_siging = our_siging.get("metrics/mAP50-95(B)", float("nan")) - ref_stats.get(
        "metrics/mAP50-95(B)", float("nan"))
    n_labels = sum(
        len(p.read_text().splitlines())
        for p in (out_root / "labels" / "val").glob("*.txt")
    )
    (REPO / "PARITY_TRAINED.json").write_text(json.dumps({
        "protocol": "real-labels-v2", "steps": args.steps,
        "reference": ref_stats, "ours": our_stats,
        "ours_siging_deployment_math": our_siging,
        "delta_map5095": delta, "delta_map5095_siging": delta_siging,
        "n_labels": n_labels, "n_images": pm.N_IMAGES,
    }, indent=1))
    print(f"delta mAP50-95 (trained weights, exp-gate): {delta:+.4f}")
    print(f"delta mAP50-95 (trained weights, siging):   {delta_siging:+.4f}")

    md = REPO / "PARITY.md"
    txt = md.read_text()
    marker = "## Trained-weights parity"
    section = (
        f"\n{marker}\n\n"
        f"Real-label protocol: synthetic shape images with true boxes\n"
        f"(rect/circle classes), the reference trained on them for\n"
        f"{args.steps} AdamW steps on CPU (its own v8DetectionLoss), then both\n"
        f"validators run against the same real labels on the converted\n"
        f"weights (`python scripts/parity_trained.py`) — gates/soft-caps sit\n"
        f"in trained regimes and the target set cannot be tie-degenerate.\n\n"
        f"The val pipelines were first proven aligned stage-by-stage\n"
        f"(scripts/parity_trained_diag2.py + parity_pixels_diag.py): the\n"
        f"preprocessed val pixels are byte-identical, and TP matching and\n"
        f"AP integration are bit-identical on shared predictions. The\n"
        f"remaining knob is the mLSTM gate math itself: on CPU the\n"
        f"reference dispatches to mlstm_kernels' exp-input-gate chunkwise,\n"
        f"while GPU deployment uses siging (ref:vision_lstm2.py:640-697) —\n"
        f"the two diverge by design at trained gate regimes\n"
        f"(docs/KNOWN_ISSUES.md). Ours evaluated with each:\n\n"
        f"| metric | reference (CPU=exp-gate) | ours exp-gate | delta | ours siging | delta |\n|---|---|---|---|---|---|\n"
        f"| mAP50 | {ref_stats['metrics/mAP50(B)']:.4f} | {our_stats['metrics/mAP50(B)']:.4f} | {our_stats['metrics/mAP50(B)'] - ref_stats['metrics/mAP50(B)']:+.4f} | {our_siging['metrics/mAP50(B)']:.4f} | {our_siging['metrics/mAP50(B)'] - ref_stats['metrics/mAP50(B)']:+.4f} |\n"
        f"| mAP50-95 | {ref_stats['metrics/mAP50-95(B)']:.4f} | {our_stats['metrics/mAP50-95(B)']:.4f} | {delta:+.4f} | {our_siging['metrics/mAP50-95(B)']:.4f} | {delta_siging:+.4f} |\n"
    )
    if marker in txt:
        txt = txt[: txt.index(marker)].rstrip() + "\n" + section
    else:
        txt = txt.rstrip() + "\n" + section
    md.write_text(txt)


if __name__ == "__main__":
    main()
