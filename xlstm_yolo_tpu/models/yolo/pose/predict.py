"""Pose predictor (parity: ref:models/yolo/pose/predict.py)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from xlstm_yolo_tpu.engine.predictor import BasePredictor
from xlstm_yolo_tpu.engine.results import Keypoints, Results
from xlstm_yolo_tpu.utils import ops


class PosePredictor(BasePredictor):
    kpt_shape = (17, 3)

    def __init__(self, cfg, model_bundle, names):
        super().__init__(cfg, model_bundle, names)
        # read the head's actual keypoint shape from the model spec
        # (the data yaml may override it, ref:models/yolo/pose/train.py:38)
        for s in getattr(self.model, "specs", ()):
            if s["module"] == "Pose" and len(s.get("args") or []) > 1:
                self.kpt_shape = tuple(s["args"][1])

    def _forward(self, variables, img_u8):
        x = img_u8.astype(jnp.float32) / 255.0
        y, aux = self.model.apply(variables, x)  # (B, A, 4+nc+K*nd)
        nk = self.kpt_shape[0] * self.kpt_shape[1]
        nc = y.shape[-1] - 4 - nk
        dets, ok, idx = ops.non_max_suppression(
            y[..., : 4 + nc],
            conf_thres=self.args.conf if self.args.conf is not None else 0.25,
            iou_thres=self.args.iou if getattr(self.args, "iou", None) else 0.45,
            max_det=int(getattr(self.args, "max_det", 300) or 300),
            nc=nc, return_idx=True,
        )
        kpts = jnp.take_along_axis(y[..., 4 + nc :], idx[..., None], axis=1)
        return dets, ok, kpts

    def postprocess(self, preds, im0s, paths):
        dets_b, ok_b, kpts_b = (np.asarray(p) for p in preds)
        K, nd = self.kpt_shape
        results = []
        for i, im0 in enumerate(im0s):
            keep = ok_b[i]
            det = dets_b[i][keep]
            kp = kpts_b[i][keep].reshape(-1, K, nd)
            boxes = ops.scale_boxes((self.imgsz, self.imgsz), det[:, :4].copy(), im0.shape[:2])
            if len(kp):
                kp_xy = ops.scale_boxes(
                    (self.imgsz, self.imgsz),
                    np.concatenate([kp[..., :2].reshape(-1, 2)] * 2, -1),
                    im0.shape[:2],
                )[:, :2].reshape(-1, K, 2)
                kp = np.concatenate([kp_xy, kp[..., 2:]], -1) if nd == 3 else kp_xy
            det_out = np.concatenate([boxes, det[:, 4:6]], axis=1)
            r = Results(im0, str(paths[i]), self.names).update(det_out)
            if len(kp):
                r.keypoints = Keypoints(kp, im0.shape[:2])
            results.append(r)
        return results
