from .modules import (
    ImageEncoderViT,
    MaskDecoder,
    PromptEncoder,
    SAMModel,
    TwoWayTransformer,
)
from .convert import convert_sam_state_dict
from .predict import SAMPredictor, build_sam

__all__ = [
    "ImageEncoderViT", "MaskDecoder", "PromptEncoder", "SAMModel",
    "TwoWayTransformer", "convert_sam_state_dict", "SAMPredictor", "build_sam",
]
