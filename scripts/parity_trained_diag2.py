#!/usr/bin/env python
"""Decompose the trained-parity mAP delta into preds vs matching vs AP math.

The real-labels-v2 run (PARITY_TRAINED.json) reports ours +0.087
mAP50-95 over the reference ON THE SAME CONVERTED WEIGHTS, while the
raw top-k outputs agree to <1e-6 conf. Both validators are end2end
(no NMS), so the gap must enter in one of three places:

  (1) the pixels each val pipeline feeds the model (loaders differ:
      ref ceils the pre-resize, ours rounds; ref resizes twice),
  (2) TP matching (greedy per-threshold unique matching order),
  (3) the AP integration (ap_per_class interpolation).

Protocol: run the reference validator, capturing its final stats
arrays (tp/conf/pred_cls/target_cls) AND its per-image native-space
predictions; run our validator capturing the same; then cross-score:

  A = refAP(ref stats)      (the reported reference number)
  B = ourAP(ref stats)      A-B isolates AP math on identical matching
  C = ourAP(our stats)      (the reported ours number)
  D = refAP(our stats)      C-D isolates AP math the other way
  E = ourMatch+ourAP(ref predn, ref gt)   E-C isolates the pixels/preds

Run: python scripts/parity_trained_diag2.py   (CPU, ~5-10 min)
"""

from __future__ import annotations

import json
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
SD = OUT / "trained_sd_1200.pt"

pm.CONF = 0.001
pm.MAX_DET = 300

tm = TorchDetectionModel(pm.MODEL_YAML, verbose=False).eval()
tm.load_state_dict(torch.load(SD, map_location="cpu"))
torch_sd = dict(tm.state_dict())
yaml_path = OUT / "parity.yaml"

# ---------------- reference validator, instrumented ----------------
from ultralytics.models.yolo.detect import DetectionValidator as RefVal  # noqa: E402

ref_capture = {"predn": {}, "gt": {}}


class CapturingRefVal(RefVal):
    def _prepare_batch(self, si, batch):
        pbatch = super()._prepare_batch(si, batch)
        ref_capture["gt"][len(ref_capture["gt"])] = (
            pbatch["bbox"].cpu().numpy().copy(), pbatch["cls"].cpu().numpy().copy())
        return pbatch

    def _prepare_pred(self, pred, pbatch):
        predn = super()._prepare_pred(pred, pbatch)
        # key by the image index of the gt captured just before (so a
        # zero-pred image cannot shift the alignment)
        ref_capture["predn"][len(ref_capture["gt"]) - 1] = predn.cpu().numpy().copy()
        return predn


args = dict(
    model="ref", data=str(yaml_path), imgsz=pm.IMGSZ, batch=4, device="cpu",
    workers=0, rect=False, conf=pm.CONF, iou=0.7, plots=False,
    save_json=False, half=False, task="detect", mode="val", verbose=False,
    save_txt=False, save_conf=False, max_det=pm.MAX_DET,
)
rv = CapturingRefVal(args=dict(args))
ref_res = rv(model=tm.float())
ref_stats = {
    "tp": rv.stats["tp"] if isinstance(rv.stats, dict) else None,
}
# ultralytics stores the concatenated arrays on the metrics object after
# finalization; rebuild them from the capture instead (robust across
# versions): rerun matching with the reference's own _process_batch.
print("reference reported:", {k: round(float(v), 4) for k, v in ref_res.items()})

# ---------------- our validator, instrumented ----------------
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from xlstm_yolo_tpu.cfg import get_cfg  # noqa: E402
from xlstm_yolo_tpu.engine import validator as V  # noqa: E402
from xlstm_yolo_tpu.nn.tasks import build_detection_model  # noqa: E402
from xlstm_yolo_tpu.utils.metrics import DetMetrics  # noqa: E402
from xlstm_yolo_tpu.utils.torch_convert import convert_torch_state_dict  # noqa: E402

model, _ = build_detection_model(pm.MODEL_YAML)
variables = jax.eval_shape(
    model.init, jax.random.PRNGKey(0), jnp.zeros((1, pm.IMGSZ, pm.IMGSZ, 3), jnp.float32))
variables = convert_torch_state_dict(variables, torch_sd)
variables = jax.tree.map(jnp.asarray, variables)

our_capture = []
_orig_match = V.match_predictions


def capturing_match(pred_cls, true_cls, iou):
    tp = _orig_match(pred_cls, true_cls, iou)
    our_capture.append(tp)
    return tp


V.match_predictions = capturing_match
cfg = get_cfg(overrides=dict(
    data=str(yaml_path), imgsz=pm.IMGSZ, batch=4, conf=pm.CONF, iou=0.7,
    workers=0, split="val", task="detect", plots=False, save_json=False,
    max_det=pm.MAX_DET))
val = V.DetectionValidator(cfg, data=str(yaml_path))
our_res = val({"model": model, "variables": variables}, batch_size=4)
V.match_predictions = _orig_match
print("ours reported:     ", {k: round(float(v), 4) for k, v in our_res.items()})

# our stats arrays were consumed by DetMetrics inside val(); recompute by
# re-matching from the captured tp list is not enough (need conf/cls). So
# instead re-run our loop minimally: easier — rematch ref predn with OUR
# matcher and score with OUR DetMetrics (E), and score ref's own matching
# with OUR AP (B).

# (B) reference matching + our AP: rebuild ref tp via ref _process_batch
stats_B = {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}
stats_E = {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}
for i in sorted(ref_capture["gt"]):
    predn = ref_capture["predn"].get(i, np.zeros((0, 6), np.float32))
    gt_boxes, gt_cls = ref_capture["gt"][i]
    # ref matching (torch path)
    tpb = rv._process_batch(
        torch.from_numpy(predn), torch.from_numpy(gt_boxes), torch.from_numpy(gt_cls))
    stats_B["tp"].append(np.asarray(tpb))
    stats_B["conf"].append(predn[:, 4])
    stats_B["pred_cls"].append(predn[:, 5])
    stats_B["target_cls"].append(gt_cls.reshape(-1))
    # our matching on the same preds
    iou = V.box_iou_matrix(gt_boxes, predn[:, :4]) if len(predn) and len(gt_boxes) else np.zeros((len(gt_boxes), len(predn)))
    tpo = _orig_match(predn[:, 5], gt_cls.reshape(-1), iou)
    stats_E["tp"].append(tpo)
    stats_E["conf"].append(predn[:, 4])
    stats_E["pred_cls"].append(predn[:, 5])
    stats_E["target_cls"].append(gt_cls.reshape(-1))


def our_ap(stats):
    m = DetMetrics(names=val.names)
    m.process(
        np.concatenate(stats["tp"]), np.concatenate(stats["conf"]),
        np.concatenate(stats["pred_cls"]), np.concatenate(stats["target_cls"]))
    return {k: float(v) for k, v in m.results_dict.items()}


B = our_ap(stats_B)
E = our_ap(stats_E)
print("\nB refPreds+refMatch+ourAP:", {k: round(v, 4) for k, v in B.items()})
print("E refPreds+ourMatch+ourAP:", {k: round(v, 4) for k, v in E.items()})

report = {
    "A_ref_reported": {k: float(v) for k, v in ref_res.items()},
    "C_our_reported": {k: float(v) for k, v in our_res.items()},
    "B_refpreds_refmatch_ourAP": B,
    "E_refpreds_ourmatch_ourAP": E,
}
Path("/tmp/parity_diag2.json").write_text(json.dumps(report, indent=1))
print("\nwrote /tmp/parity_diag2.json")
key = "metrics/mAP50-95(B)"
print(f"\nA (ref full)          : {ref_res[key]:.4f}")
print(f"B (ref match, our AP) : {B[key]:.4f}   -> AP-math delta {B[key]-ref_res[key]:+.4f}")
print(f"E (our match, our AP) : {E[key]:.4f}   -> matching delta {E[key]-B[key]:+.4f}")
print(f"C (ours full)         : {our_res[key]:.4f}   -> pixels/preds delta {our_res[key]-E[key]:+.4f}")
