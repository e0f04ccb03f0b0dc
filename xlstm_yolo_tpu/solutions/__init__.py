"""Application-level demos built on the tracker/predict APIs.

Parity: ref:ultralytics/solutions/ (counting / heatmap / analytics) —
the demo layer showing how detection + tracking compose.
"""

from xlstm_yolo_tpu.solutions.object_counter import ObjectCounter  # noqa: F401
from xlstm_yolo_tpu.solutions.heatmap import Heatmap  # noqa: F401
from xlstm_yolo_tpu.solutions.speed_estimator import SpeedEstimator  # noqa: F401
