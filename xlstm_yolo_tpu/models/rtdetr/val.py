"""RT-DETR validator (parity: ref:ultralytics/models/rtdetr/val.py).

Same mAP pipeline as DetectionValidator; only the raw-output decode
differs: the decoder emits normalized cxcywh + per-class sigmoid scores
with one-to-one queries, so decode = xywh2xyxy * imgsz + max-class —
no NMS, no topk truncation beyond the query count.
"""

from __future__ import annotations

import jax.numpy as jnp

from xlstm_yolo_tpu.engine.validator import DetectionValidator


class RTDETRValidator(DetectionValidator):
    def decode_raw(self, y):  # (B, nq, 4+nc) -> (B, nq, 6)
        imgsz = float(self.args.imgsz)
        cxcywh, scores = y[..., :4], y[..., 4:]
        xy = cxcywh[..., :2]
        wh = cxcywh[..., 2:4]
        boxes = jnp.concatenate([xy - wh / 2, xy + wh / 2], -1) * imgsz
        conf = scores.max(-1)
        cls = scores.argmax(-1).astype(y.dtype)
        # score-sort so the validator's truncation keeps the best queries
        order = jnp.argsort(-conf, axis=1)
        det = jnp.concatenate([boxes, conf[..., None], cls[..., None]], -1)
        return jnp.take_along_axis(det, order[..., None], axis=1)
