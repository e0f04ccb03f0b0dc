from xlstm_yolo_tpu.models.yolo.obb.predict import OBBPredictor  # noqa: F401
