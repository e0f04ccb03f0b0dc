#!/usr/bin/env python
"""Diagnose the trained-weights parity gap: raw per-image output diff.

Loads the cached trained reference state dict
(/tmp/parity_ds_trained/trained_sd.pt), runs every val image through
both stacks (torch reference forward vs our converted flax model, both
CPU f32) and reports per-image top-k box/score agreement — pinning
whether the -0.0101 mAP delta is model numerics or val protocol.
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

sd_path = Path("/tmp/parity_ds_trained/trained_sd.pt")
tm = TorchDetectionModel(pm.MODEL_YAML, verbose=False).eval()
tm.load_state_dict(torch.load(sd_path, map_location="cpu"))
sd = dict(tm.state_dict())

import cv2  # noqa: E402
from ultralytics.data.augment import LetterBox  # noqa: E402

files = sorted(Path("/tmp/parity_ds_trained/images/val").glob("*.jpg"))
lb = LetterBox((640, 640), auto=False, scaleup=False)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from xlstm_yolo_tpu.nn.tasks import build_detection_model  # noqa: E402
from xlstm_yolo_tpu.utils.torch_convert import convert_torch_state_dict  # noqa: E402

model, _ = build_detection_model(pm.MODEL_YAML)
variables = jax.eval_shape(
    model.init, jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3), jnp.float32)
)
variables = convert_torch_state_dict(variables, sd)
variables = jax.tree.map(jnp.asarray, variables)
fwd = jax.jit(lambda v, x: model.apply(v, x)[0])

K = 8
tot_boxes = tot_match = 0
worst = 0.0
for f in files:
    im0 = cv2.imread(str(f))
    im = lb(image=im0)
    x_np = im[..., ::-1].astype(np.float32) / 255.0
    with torch.no_grad():
        yt, _ = tm(torch.from_numpy(x_np.transpose(2, 0, 1))[None])
    yt = yt[0].numpy()  # (300, 6) sorted by conf
    yj = np.asarray(fwd(variables, jnp.asarray(x_np)[None])[0])
    # ours is also (max_det, 6) [xyxy, conf, cls] sorted
    n = min(K, len(yt), len(yj))
    dbox = np.abs(yt[:n, :4] - yj[:n, :4]).max()
    dconf = np.abs(yt[:n, 4] - yj[:n, 4]).max()
    cls_ok = (yt[:n, 5] == yj[:n, 5]).all()
    # conf-threshold crossing count at the val conf (0.001 default here)
    print(
        f"{f.name}: top{n} dbox={dbox:9.5f} dconf={dconf:8.6f} cls_match={cls_ok}"
        f"  t-conf[{yt[0,4]:.4f}..{yt[n-1,4]:.4f}] j-conf[{yj[0,4]:.4f}..{yj[n-1,4]:.4f}]"
    )
    worst = max(worst, dconf)
    tot_boxes += n
    tot_match += int(
        (np.abs(yt[:n, :4] - yj[:n, :4]).max(1) < 1.0).sum()
    )
print(f"\nboxes within 1px on top-{K}: {tot_match}/{tot_boxes}; worst dconf {worst:.6f}")
