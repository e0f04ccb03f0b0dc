"""OBB predictor (parity: ref:models/yolo/obb/predict.py).

Decoded head output (B, A, 4+nc+1) -> rotated probiou NMS on device ->
host scaling of centers/extents back to native space -> Results.obb.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from xlstm_yolo_tpu.engine.predictor import BasePredictor
from xlstm_yolo_tpu.engine.results import OBB, Results
from xlstm_yolo_tpu.utils import ops


class OBBPredictor(BasePredictor):
    def _forward(self, variables, img_u8):
        x = img_u8.astype(jnp.float32) / 255.0
        y, _ = self.model.apply(variables, x)  # (B, A, 4+nc+1)
        dets, ok = ops.non_max_suppression_rotated(
            y,
            conf_thres=self.args.conf if self.args.conf is not None else 0.25,
            iou_thres=self.args.iou if getattr(self.args, "iou", None) else 0.45,
            max_det=int(getattr(self.args, "max_det", 300) or 300),
        )
        return dets, ok

    def postprocess(self, preds, im0s, paths):
        dets_b, ok_b = (np.asarray(p) for p in preds)
        results = []
        for i, im0 in enumerate(im0s):
            det = dets_b[i][ok_b[i]]  # (n, 7) xywhr+conf+cls, letterbox px
            if len(det):
                # rescale centers (pad + gain) and extents (gain only);
                # the angle is scale-invariant under aspect-preserving resize
                gain = min(self.imgsz / im0.shape[0], self.imgsz / im0.shape[1])
                pad = (
                    round((self.imgsz - im0.shape[1] * gain) / 2 - 0.1),
                    round((self.imgsz - im0.shape[0] * gain) / 2 - 0.1),
                )
                det = det.copy()
                det[:, 0] = (det[:, 0] - pad[0]) / gain
                det[:, 1] = (det[:, 1] - pad[1]) / gain
                det[:, 2:4] /= gain
            r = Results(im0, str(paths[i]), self.names)
            r.obb = OBB(det, im0.shape[:2])
            results.append(r)
        return results
