"""FastSAM box utilities (parity: ref:ultralytics/models/fastsam/utils.py:4-24)."""

from __future__ import annotations

import numpy as np


def adjust_bboxes_to_image_border(boxes: np.ndarray, image_shape: tuple[int, int],
                                  threshold: int = 20) -> np.ndarray:
    """Snap boxes within ``threshold`` px of the frame edge onto the edge."""
    h, w = image_shape
    boxes = np.asarray(boxes, np.float32).copy()
    boxes[:, 0] = np.where(boxes[:, 0] < threshold, 0, boxes[:, 0])
    boxes[:, 1] = np.where(boxes[:, 1] < threshold, 0, boxes[:, 1])
    boxes[:, 2] = np.where(boxes[:, 2] > w - threshold, w, boxes[:, 2])
    boxes[:, 3] = np.where(boxes[:, 3] > h - threshold, h, boxes[:, 3])
    return boxes
