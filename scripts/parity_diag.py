#!/usr/bin/env python
"""Diagnose the parity gap on one image: run both stacks, compare dets."""

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import ref_loader

ref_loader.load_reference()
import torch
from ultralytics.nn.tasks import DetectionModel as TorchDetectionModel

torch.manual_seed(0)
tm = TorchDetectionModel("/root/reference/640-base192.yaml", verbose=False).eval()
import copy

sd = copy.deepcopy(dict(tm.state_dict()))

import cv2
from ultralytics.data.augment import LetterBox

IMG = "/tmp/parity_ds/images/val/im000.jpg"
im0 = cv2.imread(IMG)
lb = LetterBox((640, 640), auto=False, scaleup=False)
im = lb(image=im0)
x_np = im[..., ::-1].astype(np.float32) / 255.0  # RGB HWC

xt = torch.from_numpy(x_np.transpose(2, 0, 1))[None]
with torch.no_grad():
    yt, _ = tm(xt)
yt = yt[0].numpy()  # (300, 6) sorted
print("torch top-8 (xyxy, conf, cls):")
print(np.round(yt[:8], 4))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from xlstm_yolo_tpu.nn.tasks import build_detection_model
from xlstm_yolo_tpu.utils.torch_convert import convert_torch_state_dict

model, _ = build_detection_model("/root/reference/640-base192.yaml")
variables = jax.eval_shape(
    model.init, jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3), jnp.float32)
)
variables = convert_torch_state_dict(variables, sd)
variables = jax.tree.map(jnp.asarray, variables)
yj, _ = model.apply(variables, jnp.asarray(x_np)[None])
yj = np.asarray(yj[0])
print("jax top-8 (xyxy, conf, cls):")
print(np.round(yj[:8], 4))

# overlap of the top-20 sets
from xlstm_yolo_tpu.utils.metrics import box_iou_matrix

iou = box_iou_matrix(yt[:20, :4], yj[:20, :4])
match = (iou > 0.9).any(1)
print(f"top-20 overlap at IoU>0.9: {match.sum()}/20")
print("score ranges: torch", yt[:20, 4].min(), yt[:20, 4].max(),
      "jax", yj[:20, 4].min(), yj[:20, 4].max())
same_cls = yt[:8, 5], yj[:8, 5]
print("classes:", same_cls)
