"""Task registry: per-task Trainer/Validator/Predictor triples.

Parity: ref:ultralytics/models/yolo/model.py:26 — only 'detect' is
implemented in this framework so far; segment/pose/obb/classify slots
exist so downstream code can enumerate capabilities.
"""

from xlstm_yolo_tpu.models.yolo.detect import (
    DetectionPredictor,
    DetectionTrainer,
    DetectionValidator,
)

task_map = {
    "detect": {
        "trainer": DetectionTrainer,
        "validator": DetectionValidator,
        "predictor": DetectionPredictor,
    },
}
