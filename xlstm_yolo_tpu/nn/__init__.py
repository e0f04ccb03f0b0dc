"""Module zoo + YAML graph compiler."""

from xlstm_yolo_tpu.nn.tasks import (  # noqa: F401
    DetectionModel,
    build_detection_model,
    parse_model_specs,
    yaml_model_load,
)
