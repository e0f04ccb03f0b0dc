"""Cross-cutting utilities: assigner, losses, metrics, box ops, config."""

from xlstm_yolo_tpu.utils.logger import LOGGER, SETTINGS, SettingsManager, colorstr  # noqa: F401
