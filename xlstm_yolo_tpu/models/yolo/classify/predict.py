"""Classification predictor (parity: ref:models/yolo/classify/predict.py)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from xlstm_yolo_tpu.engine.predictor import BasePredictor
from xlstm_yolo_tpu.engine.results import Probs, Results


class ClassificationPredictor(BasePredictor):
    def _forward(self, variables, img_u8):
        x = img_u8.astype(jnp.float32) / 255.0
        probs, _ = self.model.apply(variables, x)  # (B, nc)
        return (probs,)

    def postprocess(self, preds, im0s, paths):
        (probs_b,) = (np.asarray(p) for p in preds)
        results = []
        for i, im0 in enumerate(im0s):
            r = Results(im0, str(paths[i]), self.names)
            r.probs = Probs(probs_b[i])
            results.append(r)
        return results
