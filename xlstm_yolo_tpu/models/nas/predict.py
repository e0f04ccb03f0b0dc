"""YOLO-NAS predictor (parity: ref:ultralytics/models/nas/predict.py:10-57).

NAS models emit raw ``(boxes_xyxy (B, A, 4), class_scores (B, A, nc))``
with no objectness and no in-graph NMS; the predictor's whole job is the
postprocess: cat boxes+scores, NMS, scale to original frames. Here the
cat + fixed-shape NMS run inside the jitted device program (the
reference does them on host tensors) and the base class handles
letterbox/scale/Results.
"""

from __future__ import annotations

import jax.numpy as jnp

from xlstm_yolo_tpu.engine.predictor import BasePredictor
from xlstm_yolo_tpu.utils import ops

__all__ = ["NASPredictor", "nas_raw_to_dets"]


def nas_raw_to_dets(boxes, scores, conf_thres: float, iou_thres: float,
                    max_det: int):
    """Raw NAS output -> (B, max_det, 6) [xyxy, conf, cls], zero-padded.

    Parity: ref:models/nas/predict.py:35-47 (xyxy2xywh + cat + NMS),
    as one fixed-shape jittable transform.
    """
    preds = jnp.concatenate(
        [ops.xyxy2xywh(boxes), scores.astype(boxes.dtype)], -1)
    out, ok = ops.non_max_suppression(
        preds, conf_thres=conf_thres, iou_thres=iou_thres,
        max_det=max_det, nc=scores.shape[-1])
    return jnp.where(ok[..., None], out, 0.0)


class NASPredictor(BasePredictor):
    """Postprocesses raw NAS predictions into Results."""

    def _forward(self, variables, img_u8):
        x = img_u8.astype(jnp.float32) / 255.0
        (boxes, scores), _ = self.model.apply(variables, x)
        return nas_raw_to_dets(
            boxes, scores,
            conf_thres=self.args.conf if self.args.conf is not None else 0.25,
            iou_thres=getattr(self.args, "iou", 0.45) or 0.45,
            max_det=int(getattr(self.args, "max_det", 300) or 300))
