"""YOLO-NAS validator (parity: ref:ultralytics/models/nas/val.py:11-44).

Identical to detection validation except the raw ``(boxes_xyxy,
class_scores)`` head output needs the cat + NMS decode before the
standard matching/mAP path — expressed through DetectionValidator's
``decode_raw`` hook so everything downstream (10-IoU matching,
DetMetrics, COCO json) is shared.
"""

from __future__ import annotations

from xlstm_yolo_tpu.engine.validator import DetectionValidator

from .predict import nas_raw_to_dets

__all__ = ["NASValidator"]


class NASValidator(DetectionValidator):
    """NMS-decodes raw NAS output inside the jitted val program."""

    def decode_raw(self, y):
        boxes, scores = y
        return nas_raw_to_dets(
            boxes, scores,
            conf_thres=self.args.conf if self.args.conf is not None else 0.001,
            iou_thres=getattr(self.args, "iou", 0.45) or 0.45,
            max_det=int(getattr(self.args, "max_det", 300) or 300))
