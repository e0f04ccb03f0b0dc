#!/usr/bin/env python
"""Quantify the rect-val vs fixed-square-val protocol delta (VERDICT r2).

Our validator letterboxes every image to a full square (imgsz, imgsz)
because TPU programs need fixed shapes; the reference defaults to
rect=True val (stride-rounded minimal rectangles per batch,
ref:ultralytics/data/base.py:261). That protocol difference has a mAP
effect that was never quantified. Here: the reference validator run
BOTH ways on the same trained checkpoint + real-label set as
scripts/parity_trained.py, so the delta is isolated to the rect choice
within one framework.

Run: python scripts/rect_val_cost.py   (CPU, ~5 min)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))
sys.path.insert(0, str(REPO / "scripts"))

import ref_loader  # noqa: E402

ref_loader.load_reference()
import torch  # noqa: E402
from ultralytics.nn.tasks import DetectionModel as TorchDetectionModel  # noqa: E402

import parity_map as pm  # noqa: E402

OUT = Path("/tmp/parity_ds_trained_v2")
pm.CONF = 0.001
pm.MAX_DET = 300

tm = TorchDetectionModel(pm.MODEL_YAML, verbose=False).eval()
tm.load_state_dict(torch.load(OUT / "trained_sd_1200.pt", map_location="cpu"))
yaml_path = OUT / "parity.yaml"

from ultralytics.models.yolo.detect import DetectionValidator as RefVal  # noqa: E402

results = {}
for rect in (False, True):
    args = dict(
        model="ref", data=str(yaml_path), imgsz=pm.IMGSZ, batch=4, device="cpu",
        workers=0, rect=rect, conf=pm.CONF, iou=0.7, plots=False,
        save_json=False, half=False, task="detect", mode="val", verbose=False,
        save_txt=False, save_conf=False, max_det=pm.MAX_DET,
    )
    v = RefVal(args=dict(args))
    try:
        res = v(model=tm.float())
        results["rect" if rect else "square"] = {k: float(x) for k, x in res.items()}
        print(f"rect={rect}:", {k: round(float(x), 4) for k, x in res.items()})
    except Exception as e:  # noqa: BLE001
        # Finding (measured 2026-08-17): the reference ViL backbone
        # hard-codes the square token grid — vision_lstm2's
        # `rearrange(x, "b (h w) d -> b d h w", h=80)` — so rect=True
        # (e.g. a 512x704 letterbox -> 5632 tokens) crashes inside the
        # reference model itself. Rect val is structurally impossible
        # for the xlstm-yolo model family; the fixed-square val protocol
        # is not a TPU-side departure.
        results["rect"] = {"error": f"{type(e).__name__}: {e}"}
        print(f"rect={rect}: INCOMPATIBLE — {type(e).__name__}: {e}")

key = "metrics/mAP50-95(B)"
if key in results.get("rect", {}):
    delta = results["rect"][key] - results["square"][key]
    print(f"\nrect-val mAP50-95 delta over square-val: {delta:+.4f}")
    results["rect_minus_square_map5095"] = delta
Path("/tmp/rect_val_cost.json").write_text(json.dumps(results, indent=1))
print("wrote /tmp/rect_val_cost.json")
