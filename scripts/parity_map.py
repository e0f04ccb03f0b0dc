#!/usr/bin/env python
"""Dataset-level mAP parity: reference torch fork vs this framework.

The environment has zero egress, so the released reference weights are
unreachable; instead the protocol makes the *pipelines* comparable with
seeded random-init weights:

1. Build the reference DetectionModel (640-base192.yaml), torch seed 0.
2. Synthesize a small detection dataset (varied sizes incl. < imgsz to
   exercise the scaleup=False val letterbox). Ground-truth labels are the
   reference model's own confident predictions (pseudo-labels), so the
   reference validator scores near-1.0 against it, and ANY deviation in
   our stack — weight conversion, val preprocessing, forward math, decode,
   confidence handling, box scaling, matching, AP integration — shows up
   as a mAP gap.
3. Run the reference's own DetectionValidator (torch CPU) on it.
4. Convert the weights (utils/torch_convert.py) and run our
   DetectionValidator (JAX CPU) on the same yaml.
5. Print both and write PARITY.md. Pass criterion: |Δ mAP50-95| <= 0.002
   in absolute AP units (the north-star "within 0.2" of BASELINE.md,
   which quotes mAP in percent).

ref: ultralytics/models/yolo/detect/val.py (protocol),
     ultralytics/engine/validator.py:109 (val loop semantics).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import ref_loader  # noqa: E402

N_IMAGES = 16
IMGSZ = 640
MODEL_YAML = "/root/reference/640-base192.yaml"
SIZES = [
    (480, 640), (640, 480), (544, 960), (720, 540),
    (640, 640), (320, 416), (800, 608), (416, 320),
]


def make_images(root: Path, rng: np.random.Generator) -> list[Path]:
    import cv2

    imdir = root / "images" / "val"
    imdir.mkdir(parents=True, exist_ok=True)
    files = []
    for i in range(N_IMAGES):
        h, w = SIZES[i % len(SIZES)]
        img = rng.integers(0, 80, size=(h, w, 3), dtype=np.uint8)
        # structured content: filled rectangles + circles at random scales
        for _ in range(rng.integers(4, 9)):
            x0, y0 = int(rng.integers(0, w - 40)), int(rng.integers(0, h - 40))
            bw, bh = int(rng.integers(30, w // 2)), int(rng.integers(30, h // 2))
            color = tuple(int(c) for c in rng.integers(60, 255, 3))
            if rng.random() < 0.5:
                cv2.rectangle(img, (x0, y0), (min(x0 + bw, w - 1), min(y0 + bh, h - 1)), color, -1)
            else:
                cv2.circle(img, (x0 + bw // 2, y0 + bh // 2), min(bw, bh) // 2, color, -1)
        f = imdir / f"im{i:03d}.jpg"
        cv2.imwrite(str(f), img, [cv2.IMWRITE_JPEG_QUALITY, 95])
        files.append(f)
    return files


def pseudo_labels(tm, files: list[Path], root: Path) -> int:
    """Label each image with the reference model's own predictions."""
    import cv2
    import torch
    from ultralytics.data.augment import LetterBox
    from ultralytics.utils import ops as tops

    lbdir = root / "labels" / "val"
    lbdir.mkdir(parents=True, exist_ok=True)
    letterbox = LetterBox((IMGSZ, IMGSZ), auto=False, scaleup=False)
    end2end = getattr(tm, "end2end", False)
    total = 0
    for f in files:
        im0 = cv2.imread(str(f))
        im = letterbox(image=im0)
        x = torch.from_numpy(im[..., ::-1].copy().transpose(2, 0, 1)).float()[None] / 255.0
        with torch.no_grad():
            preds = tm(x)
        dets = tops.non_max_suppression(
            preds, 0.0, 0.7, nc=len(tm.names), max_det=40, end2end=end2end,
        )[0]
        dets = dets[: 20]  # top-20 by confidence = ground truth
        boxes = tops.scale_boxes((IMGSZ, IMGSZ), dets[:, :4].clone(), im0.shape[:2])
        h0, w0 = im0.shape[:2]
        lines = []
        for b, d in zip(boxes.numpy(), dets.numpy()):
            x1, y1, x2, y2 = b
            cx, cy = (x1 + x2) / 2 / w0, (y1 + y2) / 2 / h0
            bw, bh = (x2 - x1) / w0, (y2 - y1) / h0
            if bw <= 1e-4 or bh <= 1e-4:
                continue
            lines.append(f"{int(d[5])} {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}")
        (lbdir / f"{f.stem}.txt").write_text("\n".join(lines) + "\n")
        total += len(lines)
    return total


MAX_DET = 20  # == the pseudo-label count: random-init scores are near-tied,
# so surplus detections would make AP measure tie-ordering noise, not parity.
CONF = 1e-6  # random-init v10 cls biases put all scores ~1e-5; the usual
# 0.001 val threshold would zero out every prediction on both sides.


def run_reference_val(tm, yaml_path: Path) -> dict:
    from ultralytics.models.yolo.detect import DetectionValidator as RefVal

    args = dict(
        model="ref", data=str(yaml_path), imgsz=IMGSZ, batch=4, device="cpu",
        workers=0, rect=False, conf=CONF, iou=0.7, plots=False,
        save_json=False, half=False, task="detect", mode="val", verbose=False,
        save_txt=False, save_conf=False, max_det=MAX_DET,
    )
    v = RefVal(args=args)
    stats = v(model=tm.float())
    return {k: float(x) for k, x in stats.items()}


def run_our_val(torch_sd: dict, yaml_path: Path, kernel: str | None = None) -> dict:
    """kernel: chunkwise registry key override. 'chunkwise--native_stablef'
    selects the exp-input-gate math the reference dispatches to on CPU
    (ref:vision_lstm2.py:640-697 routes CPU to chunkwise--native_autograd
    == mlstm_kernels' exp-gate xl_chunk); the default siging kernel is the
    GPU/deployment math (docs/KNOWN_ISSUES.md 'CPU vs GPU gate math')."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from xlstm_yolo_tpu.cfg import get_cfg
    from xlstm_yolo_tpu.engine.validator import DetectionValidator
    from xlstm_yolo_tpu.nn.tasks import build_detection_model
    from xlstm_yolo_tpu.utils.torch_convert import convert_torch_state_dict

    kw = {"chunkwise_kernel": kernel} if kernel else {}
    model, _ = build_detection_model(MODEL_YAML, **kw)
    variables = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, IMGSZ, IMGSZ, 3), jnp.float32)
    )
    variables = convert_torch_state_dict(variables, torch_sd)
    variables = jax.tree.map(jnp.asarray, variables)

    cfg = get_cfg(overrides=dict(
        data=str(yaml_path), imgsz=IMGSZ, batch=4, conf=CONF, iou=0.7,
        workers=0, split="val", task="detect", plots=False, save_json=False,
        max_det=MAX_DET,
    ))
    val = DetectionValidator(cfg, data=str(yaml_path))
    res = val({"model": model, "variables": variables}, batch_size=4)
    return {k: float(x) for k, x in res.items()}


def main():
    out_root = Path("/tmp/parity_ds")
    rng = np.random.default_rng(20260816)

    ref_loader.load_reference()
    import torch
    from ultralytics.nn.tasks import DetectionModel as TorchDetectionModel

    torch.manual_seed(0)
    tm = TorchDetectionModel(MODEL_YAML, verbose=False).eval()

    lbdir = out_root / "labels" / "val"
    if lbdir.exists() and len(list(lbdir.glob("*.txt"))) == N_IMAGES:
        files = sorted((out_root / "images" / "val").glob("*.jpg"))
        n_labels = sum(len(f.read_text().splitlines()) for f in lbdir.glob("*.txt"))
        print(f"dataset cached: {len(files)} images, {n_labels} boxes")
    else:
        files = make_images(out_root, rng)
        n_labels = pseudo_labels(tm, files, out_root)
        print(f"dataset: {len(files)} images, {n_labels} pseudo-label boxes")

    names = {i: f"c{i}" for i in range(len(tm.names))}
    yaml_path = out_root / "parity.yaml"
    yaml_path.write_text(
        f"path: {out_root}\ntrain: images/val\nval: images/val\n"
        f"nc: {len(names)}\nnames:\n"
        + "".join(f"  {k}: {v}\n" for k, v in names.items())
    )

    # snapshot BEFORE the reference val: its AutoBackend fuses conv+bn
    # in-place, dropping the running stats our converter maps.
    import copy

    torch_sd = copy.deepcopy(dict(tm.state_dict()))

    ref_stats = run_reference_val(tm, yaml_path)
    print("reference:", json.dumps(ref_stats))
    our_stats = run_our_val(torch_sd, yaml_path)
    print("ours:     ", json.dumps(our_stats))

    key_map = [
        ("mAP50", "metrics/mAP50(B)", "metrics/mAP50(B)"),
        ("mAP50-95", "metrics/mAP50-95(B)", "metrics/mAP50-95(B)"),
        ("precision", "metrics/precision(B)", "metrics/precision(B)"),
        ("recall", "metrics/recall(B)", "metrics/recall(B)"),
    ]
    rows = []
    for label, rk, ok in key_map:
        r, o = ref_stats.get(rk, float("nan")), our_stats.get(ok, float("nan"))
        rows.append((label, r, o, o - r))
        print(f"{label:>10}: ref={r:.4f} ours={o:.4f} delta={o - r:+.4f}")

    d = dict(rows=rows, n_images=len(files), n_labels=n_labels)
    (REPO / "PARITY.json").write_text(json.dumps({
        "reference": ref_stats, "ours": our_stats,
        "delta_map5095": rows[1][3], "n_images": len(files), "n_labels": n_labels,
    }, indent=1))
    return d


if __name__ == "__main__":
    main()
