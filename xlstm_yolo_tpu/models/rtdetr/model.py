"""RT-DETR model facade (parity: ref:ultralytics/models/rtdetr/model.py)."""

from __future__ import annotations

from xlstm_yolo_tpu.engine.model import YOLO

from .predict import RTDETRPredictor
from .val import RTDETRValidator


class RTDETR(YOLO):
    """Baidu RT-DETR interface over the RTDETRDecoder graph."""

    def __init__(self, model: str = "rtdetr-l.yaml", verbose: bool = False):
        super().__init__(model, task="detect", verbose=verbose)

    @property
    def task_map(self):
        return {"detect": {"predictor": RTDETRPredictor,
                           "validator": RTDETRValidator}}

    def _task_class(self, kind: str):
        return self.task_map["detect"].get(kind) or super()._task_class(kind)
