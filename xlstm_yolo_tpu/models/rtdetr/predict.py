"""RT-DETR predictor (parity: ref:ultralytics/models/rtdetr/predict.py).

RT-DETR consumes square *stretched* inputs (LetterBox scale_fill), emits
(B, nq, 4+nc) with normalized cxcywh boxes and per-class sigmoid scores;
postprocess is a pure conf filter — no NMS (the decoder's one-to-one
matching already deduplicates).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from xlstm_yolo_tpu.data.augment import LetterBox
from xlstm_yolo_tpu.engine.predictor import BasePredictor
from xlstm_yolo_tpu.engine.results import Results
from xlstm_yolo_tpu.utils.ops import xywh2xyxy


class RTDETRPredictor(BasePredictor):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        # square stretch instead of aspect-preserving letterbox
        self.letterbox = LetterBox((self.imgsz, self.imgsz), auto=False,
                                   scale_fill=True)
        self._native_letterbox = None  # native path pads; stretch needs cv2

    def _forward(self, variables, img_u8):
        x = img_u8.astype(jnp.float32) / 255.0
        y, _aux = self.model.apply(variables, x)
        return y  # (B, nq, 4+nc), boxes normalized cxcywh

    def postprocess(self, preds, im0s, paths):
        preds = np.asarray(preds)
        conf_thres = self.args.conf if self.args.conf is not None else 0.25
        results = []
        for i, im0 in enumerate(im0s):
            p = preds[i]
            boxes = xywh2xyxy(p[:, :4])
            scores, cls = p[:, 4:].max(-1), p[:, 4:].argmax(-1)
            keep = scores > conf_thres
            h0, w0 = im0.shape[:2]
            det = np.concatenate(
                [boxes[keep] * np.array([w0, h0, w0, h0], np.float32),
                 scores[keep, None], cls[keep, None].astype(np.float32)], -1)
            results.append(Results(im0, str(paths[i]), self.names).update(det))
        return results
