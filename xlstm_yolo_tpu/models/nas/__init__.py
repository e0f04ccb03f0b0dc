"""YOLO-NAS plugin (parity: ref:ultralytics/models/nas/__init__.py)."""

from .model import NAS
from .predict import NASPredictor
from .val import NASValidator

__all__ = ["NAS", "NASPredictor", "NASValidator"]
