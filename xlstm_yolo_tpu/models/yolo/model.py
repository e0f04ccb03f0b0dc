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
from xlstm_yolo_tpu.models.yolo.classify import ClassificationPredictor
from xlstm_yolo_tpu.models.yolo.obb import OBBPredictor
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
    "obb": {
        "trainer": DetectionTrainer,  # task='obb' selects the rotated loss/targets
        "validator": None,  # set below (lazy import keeps detect-only paths light)
        "predictor": OBBPredictor,
    },
    "classify": {
        "trainer": DetectionTrainer,
        "validator": None,
        "predictor": ClassificationPredictor,
    },
}


def _late_validators():
    from xlstm_yolo_tpu.models.yolo.classify.val import ClassificationValidator
    from xlstm_yolo_tpu.models.yolo.obb.val import OBBValidator

    task_map["obb"]["validator"] = OBBValidator
    task_map["classify"]["validator"] = ClassificationValidator


_late_validators()
