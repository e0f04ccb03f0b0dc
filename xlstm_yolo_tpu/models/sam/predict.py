"""SAM promptable-segmentation predictor (ref:ultralytics/models/sam/predict.py).

``SAMPredictor.set_image`` runs the heavy image encoder once; repeated
``predict`` calls with point/box prompts reuse the cached embedding and
only run the (cheap) prompt encoder + mask decoder program — the
interactive SAM usage pattern, with both programs jitted at fixed
prompt shapes (points are padded to ``max_points``).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .convert import convert_sam_state_dict
from .modules import SAMModel

PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)

CONFIGS = {
    "vit_b": dict(embed_dim=768, depth=12, num_heads=12,
                  global_attn_indexes=(2, 5, 8, 11)),
    "vit_l": dict(embed_dim=1024, depth=24, num_heads=16,
                  global_attn_indexes=(5, 11, 17, 23)),
    "vit_h": dict(embed_dim=1280, depth=32, num_heads=16,
                  global_attn_indexes=(7, 15, 23, 31)),
    # MobileSAM: TinyViT-5M encoder, same prompt encoder + mask decoder
    # (ref:models/sam/build.py:56)
    "mobile_sam": dict(encoder_type="tiny"),
}


def build_sam(variant: str = "vit_b", checkpoint: str | Path | None = None,
              img_size: int = 1024):
    """(SAMModel, variables|None). ``checkpoint``: a torch SAM .pt/.pth."""
    cfg = CONFIGS[variant]
    model = SAMModel(img_size=img_size, **cfg)
    variables = None
    if checkpoint is not None:
        import torch

        sd = torch.load(checkpoint, map_location="cpu")
        sd = sd.get("model", sd) if isinstance(sd, dict) else sd.state_dict()
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        if cfg.get("encoder_type") == "tiny":
            from .convert import convert_mobile_sam_state_dict

            variables = jax.tree.map(jnp.asarray,
                                     convert_mobile_sam_state_dict(sd))
        else:
            variables = jax.tree.map(
                jnp.asarray, convert_sam_state_dict(sd, depth=cfg["depth"]))
    return model, variables


class SAMPredictor:
    def __init__(self, model: SAMModel, variables: dict, max_points: int = 8):
        self.model = model
        self.variables = variables
        self.max_points = max_points
        self.img_size = model.img_size
        self._embed = None
        self._scale = 1.0
        self._orig_hw = None

        @jax.jit
        def encode(v, img):
            return model.apply(v, img, method=SAMModel.encode_image)

        @jax.jit
        def decode(v, emb, pts, labs):
            return model.apply(v, emb, points=(pts, labs),
                               method=SAMModel.decode_prompts)

        self._encode = encode
        self._decode = decode

    def set_image(self, im_bgr: np.ndarray):
        """Resize longest side, normalize, pad square, run the encoder."""
        import cv2

        h0, w0 = im_bgr.shape[:2]
        self._orig_hw = (h0, w0)
        self._scale = self.img_size / max(h0, w0)
        nh, nw = int(round(h0 * self._scale)), int(round(w0 * self._scale))
        im = cv2.resize(im_bgr[..., ::-1], (nw, nh)).astype(np.float32)
        im = (im - PIXEL_MEAN) / PIXEL_STD
        pad = np.zeros((self.img_size, self.img_size, 3), np.float32)
        pad[:nh, :nw] = im
        self._embed = self._encode(self.variables, jnp.asarray(pad[None]))
        return self._embed

    def predict(self, points=None, labels=None, box=None):
        """Masks for point/box prompts in ORIGINAL image pixel coords."""
        assert self._embed is not None, "call set_image first"
        pts = np.zeros((1, self.max_points, 2), np.float32)
        labs = -np.ones((1, self.max_points), np.int32)  # -1 = padding
        n = 0
        if points is not None:
            p = np.atleast_2d(np.asarray(points, np.float32)) * self._scale
            n = len(p)
            pts[0, :n] = p
            labs[0, :n] = 1 if labels is None else np.asarray(labels, np.int32)[:n]
        if box is not None:
            b = np.asarray(box, np.float32).reshape(2, 2) * self._scale
            pts[0, n:n + 2] = b
            labs[0, n] = 2
            labs[0, n + 1] = 3
        masks, iou = self._decode(self.variables, self._embed,
                                  jnp.asarray(pts), jnp.asarray(labs))
        masks = np.asarray(masks)  # (1, k, S/4, S/4) logits
        import cv2

        h0, w0 = self._orig_hw
        nh, nw = int(round(h0 * self._scale)), int(round(w0 * self._scale))
        out = []
        for mk in masks[0]:
            up = cv2.resize(mk, (self.img_size, self.img_size),
                            interpolation=cv2.INTER_LINEAR)[:nh, :nw]
            out.append(cv2.resize(up, (w0, h0)) > 0)
        return np.stack(out), np.asarray(iou[0])
