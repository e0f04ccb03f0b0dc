"""Application-level demos built on the tracker/predict APIs.

Parity: ref:ultralytics/solutions/ (counting / heatmap / analytics) —
the demo layer showing how detection + tracking compose.
"""

from xlstm_yolo_tpu.solutions.object_counter import ObjectCounter  # noqa: F401
from xlstm_yolo_tpu.solutions.heatmap import Heatmap  # noqa: F401
from xlstm_yolo_tpu.solutions.speed_estimator import SpeedEstimator  # noqa: F401
from xlstm_yolo_tpu.solutions.base import BaseSolution  # noqa: F401
from xlstm_yolo_tpu.solutions.queue_management import QueueManager  # noqa: F401
from xlstm_yolo_tpu.solutions.region_counter import RegionCounter  # noqa: F401
from xlstm_yolo_tpu.solutions.distance_calculation import DistanceCalculation  # noqa: F401
from xlstm_yolo_tpu.solutions.ai_gym import AIGym  # noqa: F401
from xlstm_yolo_tpu.solutions.trackzone import TrackZone  # noqa: F401
from xlstm_yolo_tpu.solutions.analytics import Analytics  # noqa: F401
from xlstm_yolo_tpu.solutions.parking_management import ParkingManagement, save_slots  # noqa: F401
from xlstm_yolo_tpu.solutions.security_alarm import SecurityAlarm  # noqa: F401
