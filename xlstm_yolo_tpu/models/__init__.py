from xlstm_yolo_tpu.models.fastsam import FastSAM, FastSAMPredictor
from xlstm_yolo_tpu.models.nas import NAS, NASPredictor, NASValidator
from xlstm_yolo_tpu.models.rtdetr import RTDETR, RTDETRPredictor, RTDETRValidator
from xlstm_yolo_tpu.models.yolo.model import task_map

__all__ = [
    "FastSAM", "FastSAMPredictor",
    "NAS", "NASPredictor", "NASValidator",
    "RTDETR", "RTDETRPredictor", "RTDETRValidator",
    "task_map",
]
