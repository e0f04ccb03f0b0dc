from xlstm_yolo_tpu.models.yolo.classify.predict import ClassificationPredictor  # noqa: F401
