from .modules import (
    ImageEncoderViT,
    MaskDecoder,
    PromptEncoder,
    SAMModel,
    TwoWayTransformer,
)
from .convert import convert_sam_state_dict
from .predict import SAMPredictor, build_sam


def __getattr__(name):
    # lazy: the video stack pulls in the SAM2 encoder + memory modules
    video_names = {"SAM2Base", "SAM2MaskDecoder", "SAM2VideoPredictor"}
    memory_names = {"MemoryAttention", "MemoryEncoder", "RoPEAttention"}
    if name in video_names:
        from xlstm_yolo_tpu.models.sam import video

        return getattr(video, name)
    if name in memory_names:
        from xlstm_yolo_tpu.models.sam import memory

        return getattr(memory, name)
    raise AttributeError(name)


__all__ = [
    "ImageEncoderViT", "MaskDecoder", "PromptEncoder", "SAMModel",
    "TwoWayTransformer", "convert_sam_state_dict", "SAMPredictor", "build_sam",
    "SAM2Base", "SAM2MaskDecoder", "SAM2VideoPredictor",
    "MemoryAttention", "MemoryEncoder", "RoPEAttention",
]
