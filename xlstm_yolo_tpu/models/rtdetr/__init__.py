from .model import RTDETR
from .predict import RTDETRPredictor
from .val import RTDETRValidator

__all__ = ["RTDETR", "RTDETRPredictor", "RTDETRValidator"]
