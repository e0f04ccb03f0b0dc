"""Streaming predictor: host letterbox -> jitted TPU forward -> Results.

Re-design of ref:ultralytics/engine/predictor.py:67-420: same streaming
generator API, but preprocessing pads every frame to the model's static
square input (one compiled program; the reference's per-batch rectangle
shapes would force recompiles on TPU), normalization happens on device,
and the last incomplete batch is padded to the compiled batch size.
"""

from __future__ import annotations

import time
from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from xlstm_yolo_tpu.data.augment import LetterBox
from xlstm_yolo_tpu.data.loaders import load_inference_source
from xlstm_yolo_tpu.engine.results import Results
from xlstm_yolo_tpu.utils import ops


class BasePredictor:
    """Streaming inference loop (parity: predictor.py:222-330)."""

    def __init__(self, cfg: Any, model_bundle: dict, names: dict):
        self.args = cfg
        self.model = model_bundle["model"]          # eval-mode flax module
        self.variables = model_bundle["variables"]  # {'params', 'batch_stats'}
        self.names = names
        self.imgsz = int(getattr(cfg, "imgsz", 640) or 640)
        self.letterbox = LetterBox((self.imgsz, self.imgsz), auto=False, scaleup=True)
        self._predict_jit = jax.jit(self._forward)
        try:
            from xlstm_yolo_tpu.native import (
                get_letterbox_native,
                letterbox_native,
                letterbox_native_batch,
            )

            ok = get_letterbox_native() is not None
            self._native_letterbox = letterbox_native if ok else None
            self._native_letterbox_batch = letterbox_native_batch if ok else None
        except Exception:
            self._native_letterbox = None
            self._native_letterbox_batch = None
        self.seen = 0
        self.speed = {"preprocess": 0.0, "inference": 0.0, "postprocess": 0.0}

    # -- device program ----------------------------------------------------
    def _forward(self, variables, img_u8):
        x = img_u8.astype(jnp.float32) / 255.0
        if getattr(self.args, "augment", False):
            from xlstm_yolo_tpu.nn.tasks import predict_augment

            y, _aux = predict_augment(self.model, variables, x)
            if y.shape[-1] != 6:  # anchor-level (B, A, 4+nc): fixed-shape NMS
                out, ok = ops.non_max_suppression(
                    y,
                    conf_thres=self.args.conf if self.args.conf is not None else 0.25,
                    iou_thres=getattr(self.args, "iou", 0.7) or 0.7,
                    max_det=int(getattr(self.args, "max_det", 300) or 300),
                    nc=y.shape[-1] - 4,
                )
                y = jnp.where(ok[..., None], out, 0.0)
            return y
        y, _aux = self.model.apply(variables, x)
        return y  # (B, max_det, 6) xyxy(model scale), conf, cls

    # -- host stages ---------------------------------------------------------
    def preprocess(self, im_list: list[np.ndarray]):
        if self._native_letterbox_batch is not None:
            # fused C++ resize+pad+BGR->RGB, all frames written straight
            # into one batch array, GIL-free across a thread pool
            batch, meta = self._native_letterbox_batch(
                im_list, self.imgsz, swap_rb=True)
            return batch, [((r, r), pad) for r, pad in meta]
        out, ratios_pads = [], []
        for im in im_list:
            lb, ratio, pad = self.letterbox(im)
            out.append(lb[..., ::-1])  # BGR -> RGB
            ratios_pads.append((ratio, pad))
        batch = np.ascontiguousarray(np.stack(out), dtype=np.uint8)
        return batch, ratios_pads

    def postprocess(self, preds: np.ndarray, im0s: list[np.ndarray], paths: list[str]):
        results = []
        conf_thres = self.args.conf if self.args.conf is not None else 0.25
        for i, im0 in enumerate(im0s):
            det = preds[i]
            det = det[det[:, 4] > conf_thres]
            if self.args.classes:
                det = det[np.isin(det[:, 5].astype(int), list(self.args.classes))]
            boxes = ops.scale_boxes((self.imgsz, self.imgsz), det[:, :4], im0.shape[:2])
            det = np.concatenate([boxes, det[:, 4:6]], axis=1)
            results.append(
                Results(im0, str(paths[i]), self.names).update(det)
            )
        return results

    # -- loop ----------------------------------------------------------------
    def stream_inference(self, source) -> Iterator[Results]:
        dataset = load_inference_source(
            source,
            batch=int(getattr(self.args, "batch", 1) or 1),
            vid_stride=int(getattr(self.args, "vid_stride", 1) or 1),
        )
        self.dataset = dataset
        compiled_bs = None
        for paths, im0s, infos in dataset:
            t0 = time.perf_counter()
            batch, _ = self.preprocess(im0s)
            n = batch.shape[0]
            if compiled_bs is None:
                compiled_bs = n
            if n < compiled_bs:  # pad the tail batch to the compiled size
                pad = np.zeros((compiled_bs - n, *batch.shape[1:]), batch.dtype)
                batch = np.concatenate([batch, pad], 0)
            t1 = time.perf_counter()
            out = self._predict_jit(self.variables, jnp.asarray(batch))
            if isinstance(out, tuple):  # task heads return extras (coeffs/kpts/proto)
                preds = tuple(np.asarray(o)[:n] for o in out)
            else:
                preds = np.asarray(out)[:n]
            t2 = time.perf_counter()
            results = self.postprocess(preds, im0s, paths)
            t3 = time.perf_counter()
            per = max(n, 1)
            for r in results:
                r.speed = {
                    "preprocess": (t1 - t0) / per * 1e3,
                    "inference": (t2 - t1) / per * 1e3,
                    "postprocess": (t3 - t2) / per * 1e3,
                }
                self.seen += 1
                yield r

    def __call__(self, source=None, stream: bool = False):
        if stream:
            return self.stream_inference(source)
        return list(self.stream_inference(source))


class DetectionPredictor(BasePredictor):
    """Detect-task predictor (parity: models/yolo/detect/predict.py:23)."""
