"""Segmentation predictor (parity: ref:models/yolo/segment/predict.py).

Device program: decode + NMS + coefficient gather; mask assembly
(coeff . proto, crop, upsample, threshold) happens on host from the
small fetched tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from xlstm_yolo_tpu.engine.predictor import BasePredictor
from xlstm_yolo_tpu.engine.results import Masks, Results
from xlstm_yolo_tpu.utils import ops


class SegmentationPredictor(BasePredictor):
    def _forward(self, variables, img_u8):
        x = img_u8.astype(jnp.float32) / 255.0
        y, aux = self.model.apply(variables, x)  # (B, A, 4+nc+nm), aux has proto
        nm = aux["proto"].shape[-1]
        nc = y.shape[-1] - 4 - nm
        dets, ok, idx = ops.non_max_suppression(
            y[..., : 4 + nc],
            conf_thres=self.args.conf if self.args.conf is not None else 0.25,
            iou_thres=self.args.iou if getattr(self.args, "iou", None) else 0.45,
            max_det=int(getattr(self.args, "max_det", 300) or 300),
            nc=nc, return_idx=True,
        )
        coeffs = jnp.take_along_axis(y[..., 4 + nc :], idx[..., None], axis=1)
        return dets, ok, coeffs, aux["proto"]

    def postprocess(self, preds, im0s, paths):
        import cv2

        dets_b, ok_b, coeffs_b, proto_b = (np.asarray(p) for p in preds)
        results = []
        for i, im0 in enumerate(im0s):
            keep = ok_b[i]
            det = dets_b[i][keep]
            coeff = coeffs_b[i][keep]
            proto = proto_b[i]  # (Hm, Wm, nm)
            Hm, Wm, nm = proto.shape
            boxes = ops.scale_boxes((self.imgsz, self.imgsz), det[:, :4].copy(), im0.shape[:2])
            masks = None
            if len(det):
                logits = coeff @ proto.reshape(-1, nm).T  # (n, Hm*Wm)
                m = (1 / (1 + np.exp(-logits))).reshape(-1, Hm, Wm)
                # crop to (model-space) boxes in mask coords, then upsample
                scale = np.array([Wm, Hm, Wm, Hm]) / self.imgsz
                mboxes = det[:, :4] * scale
                ys = np.arange(Hm)[None, :, None]
                xs = np.arange(Wm)[None, None, :]
                inside = (
                    (xs >= mboxes[:, 0, None, None]) & (xs < mboxes[:, 2, None, None])
                    & (ys >= mboxes[:, 1, None, None]) & (ys < mboxes[:, 3, None, None])
                )
                m = m * inside
                h0, w0 = im0.shape[:2]
                masks = np.stack([
                    cv2.resize(mi, (w0, h0), interpolation=cv2.INTER_LINEAR) > 0.5
                    for mi in m
                ]).astype(np.uint8) if len(m) else None
            det_out = np.concatenate([boxes, det[:, 4:6]], axis=1)
            r = Results(im0, str(paths[i]), self.names).update(det_out)
            if masks is not None:
                r.masks = Masks(masks, im0.shape[:2])
            results.append(r)
        return results
