"""YOLO task plugins (parity: ref:ultralytics/models/yolo/model.py:26 task_map)."""

from xlstm_yolo_tpu.models.yolo.model import task_map  # noqa: F401
