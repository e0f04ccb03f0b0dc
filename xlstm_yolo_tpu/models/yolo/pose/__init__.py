from xlstm_yolo_tpu.models.yolo.pose.predict import PosePredictor  # noqa: F401
