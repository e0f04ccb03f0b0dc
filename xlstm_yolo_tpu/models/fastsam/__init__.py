from .model import FastSAM
from .predict import FastSAMPredictor

__all__ = ["FastSAM", "FastSAMPredictor"]
