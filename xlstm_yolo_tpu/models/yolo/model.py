"""Task registry: per-task Trainer/Validator/Predictor triples.

Parity: ref:ultralytics/models/yolo/model.py:26.  The segment/pose
trainers reuse DetectionTrainer — the task flows through
cfg.task -> dataset (mask/kpt targets) -> make_train_step (seg/pose
losses); their predictors assemble Masks/Keypoints from the head's
extra outputs.
"""

from xlstm_yolo_tpu.models.yolo.detect import (
    DetectionPredictor,
    DetectionTrainer,
    DetectionValidator,
)
from xlstm_yolo_tpu.models.yolo.pose import PosePredictor
from xlstm_yolo_tpu.models.yolo.segment import SegmentationPredictor

task_map = {
    "detect": {
        "trainer": DetectionTrainer,
        "validator": DetectionValidator,
        "predictor": DetectionPredictor,
    },
    "segment": {
        "trainer": DetectionTrainer,  # task='segment' selects the seg loss/targets
        "validator": DetectionValidator,  # box metrics; mask mAP: see validator docstring
        "predictor": SegmentationPredictor,
    },
    "pose": {
        "trainer": DetectionTrainer,
        "validator": DetectionValidator,
        "predictor": PosePredictor,
    },
}
