"""Detect task triple (parity: ref:ultralytics/models/yolo/detect/)."""

from xlstm_yolo_tpu.engine.predictor import DetectionPredictor  # noqa: F401
from xlstm_yolo_tpu.engine.trainer import DetectionTrainer  # noqa: F401
from xlstm_yolo_tpu.engine.validator import DetectionValidator  # noqa: F401
