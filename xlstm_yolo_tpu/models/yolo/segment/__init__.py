from xlstm_yolo_tpu.models.yolo.segment.predict import SegmentationPredictor  # noqa: F401
