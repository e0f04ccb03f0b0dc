"""FastSAM predictor: segment-everything + prompt selection.

Parity: ref:ultralytics/models/fastsam/predict.py:14-123 and utils.py:4.
FastSAM is a single-class YOLO-seg model; prompting is pure host-side
post-selection over the already-computed masks, so the device program is
exactly the segmentation predictor's — TPU-idiomatic (ragged prompt
logic never enters the compiled graph).

Text prompts require a CLIP model; this environment has no CLIP weights
(zero egress), so ``texts=`` raises with that explanation.
"""

from __future__ import annotations

import numpy as np

from xlstm_yolo_tpu.models.yolo.segment import SegmentationPredictor

from .utils import adjust_bboxes_to_image_border


class FastSAMPredictor(SegmentationPredictor):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.prompts: dict = {}

    def set_prompts(self, prompts: dict):
        """Stash prompts for the next call (ref:predict.py:148)."""
        self.prompts = dict(prompts or {})

    def postprocess(self, preds, im0s, paths):
        bboxes = self.prompts.pop("bboxes", None)
        points = self.prompts.pop("points", None)
        labels = self.prompts.pop("labels", None)
        texts = self.prompts.pop("texts", None)
        results = super().postprocess(preds, im0s, paths)

        # snap near-full-frame boxes to the exact frame (ref:predict.py:36-44)
        for r in results:
            if r.boxes is None or len(r) == 0:
                continue
            h, w = r.orig_img.shape[:2]
            full = np.array([0.0, 0.0, w, h], np.float32)
            xyxy = adjust_bboxes_to_image_border(r.boxes.xyxy.copy(), (h, w))
            inter = (
                np.minimum(xyxy[:, 2], full[2]) - np.maximum(xyxy[:, 0], full[0])
            ).clip(0) * (
                np.minimum(xyxy[:, 3], full[3]) - np.maximum(xyxy[:, 1], full[1])
            ).clip(0)
            area = (xyxy[:, 2] - xyxy[:, 0]) * (xyxy[:, 3] - xyxy[:, 1])
            iou = inter / (area + full[2] * full[3] - inter + 1e-9)
            xyxy[iou > 0.9] = full
            data = r.boxes.data.copy()
            data[:, :4] = xyxy
            r.update(boxes=data)

        return self.prompt(results, bboxes=bboxes, points=points, labels=labels,
                           texts=texts)

    def prompt(self, results, bboxes=None, points=None, labels=None, texts=None):
        """Select masks by box/point prompts (ref:predict.py:47-123)."""
        if bboxes is None and points is None and texts is None:
            return results
        if texts is not None:
            raise NotImplementedError(
                "text prompts need a CLIP image/text encoder; no CLIP weights "
                "are available in this environment (zero egress)"
            )
        out = []
        for r in results:
            if len(r) == 0 or r.masks is None:
                out.append(r)
                continue
            masks = np.asarray(r.masks.data)  # (N, H, W) at orig resolution
            idx = np.zeros(len(r), bool)
            if bboxes is not None:
                bb = np.atleast_2d(np.asarray(bboxes, np.int32))
                bb_areas = (bb[:, 3] - bb[:, 1]) * (bb[:, 2] - bb[:, 0])
                mask_areas = np.stack([
                    masks[:, b[1]: b[3], b[0]: b[2]].sum((1, 2)) for b in bb
                ])  # (M, N)
                full_areas = masks.sum((1, 2))  # (N,)
                union = bb_areas[:, None] + full_areas[None] - mask_areas
                idx[np.argmax(mask_areas / (union + 1e-9), axis=1)] = True
            if points is not None:
                pts = np.atleast_2d(np.asarray(points, np.int32))
                lab = (np.ones(len(pts), np.int32) if labels is None
                       else np.asarray(labels, np.int32))
                assert len(lab) == len(pts), (
                    f"labels size {len(lab)} != points size {len(pts)}")
                point_idx = (np.ones(len(r), bool) if lab.sum() == 0
                             else np.zeros(len(r), bool))
                for p, l in zip(pts, lab):
                    hits = np.nonzero(masks[:, p[1], p[0]])[0]
                    point_idx[hits] = bool(l)
                idx |= point_idx
            out.append(r[idx])
        return out
