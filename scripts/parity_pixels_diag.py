#!/usr/bin/env python
"""Byte-compare the val pixels each framework feeds the model.

parity_trained_diag2.py proved matching + AP math are bit-identical and
the residual trained-parity delta lives in the preds/pixels. This
captures the reference validator's preprocessed val batch (after its
dataloader + letterbox + /255) and our dataloader's batch for the same
images, and reports per-image max|diff| in pixel space, plus the
ratio_pad each side will use to scale boxes back.

Run: python scripts/parity_pixels_diag.py   (CPU, ~2 min)
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

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

cap = {"imgs": {}, "rp": {}, "files": {}}


class PixelCapture(RefVal):
    def preprocess(self, batch):
        b = super().preprocess(batch)
        for si in range(b["img"].shape[0]):
            i = len(cap["imgs"])
            cap["imgs"][i] = b["img"][si].cpu().numpy()  # (3, H, W) float 0-1
            cap["rp"][i] = tuple(np.asarray(batch["ratio_pad"][si]).reshape(-1))
            cap["files"][i] = batch["im_file"][si]
        return b

    def __call__(self, *a, **k):  # stop after capturing one full epoch
        try:
            return super().__call__(*a, **k)
        finally:
            pass


args = dict(
    model="ref", data=str(yaml_path), imgsz=pm.IMGSZ, batch=4, device="cpu",
    workers=0, rect=False, conf=pm.CONF, iou=0.7, plots=False,
    save_json=False, half=False, task="detect", mode="val", verbose=False,
    save_txt=False, save_conf=False, max_det=pm.MAX_DET,
)
rv = PixelCapture(args=dict(args))
_ = rv(model=tm.float())
print(f"captured {len(cap['imgs'])} reference val images")

# ---- ours ----
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from xlstm_yolo_tpu.cfg import get_cfg  # noqa: E402
from xlstm_yolo_tpu.data.build import build_dataloader, build_yolo_dataset  # noqa: E402
from xlstm_yolo_tpu.data.dataset import check_det_dataset  # noqa: E402

cfg = get_cfg(overrides=dict(
    data=str(yaml_path), imgsz=pm.IMGSZ, batch=4, conf=pm.CONF, iou=0.7,
    workers=0, split="val", task="detect", plots=False, save_json=False,
    max_det=pm.MAX_DET))
data = check_det_dataset(str(yaml_path))
ds = build_yolo_dataset(cfg, data["val"], 4, data, mode="val")
loader = build_dataloader(ds, 4, workers=0, shuffle=False, drop_last=False)

ours = {}
for batch in loader:
    for si in range(batch["img"].shape[0]):
        i = len(ours)
        ours[i] = {
            "img": batch["img"][si].astype(np.float32) / 255.0,  # (H, W, 3) RGB
            "rp": batch["ratio_pad"][si],
            "file": batch["im_file"][si],
        }
print(f"captured {len(ours)} of our val images")

worst = 0.0
for i in sorted(cap["imgs"]):
    ref_img = cap["imgs"][i].transpose(1, 2, 0)  # CHW RGB -> HWC
    # align by file name
    j = next(k for k in ours if Path(ours[k]["file"]).name == Path(cap["files"][i]).name)
    our_img = ours[j]["img"]
    d = float(np.abs(ref_img - our_img).max()) if ref_img.shape == our_img.shape else float("inf")
    nz = float((np.abs(ref_img - our_img) > 1e-6).mean()) if ref_img.shape == our_img.shape else 1.0
    print(f"{Path(cap['files'][i]).name}: shape ref={ref_img.shape} ours={our_img.shape} "
          f"max|d|={d:.6f} frac_diff={nz:.4f} rp_ref={cap['rp'][i]} rp_ours={np.asarray(ours[j]['rp']).reshape(-1)}")
    worst = max(worst, d)
print(f"\nworst pixel delta: {worst:.6f}")
