"""Uniform inference across weight formats (parity: ref:ultralytics/nn/autobackend.py:54).

Where the reference multiplexes 15 runtime formats, the XLA set is:
model YAML (fresh init), torch .pt (converted), orbax checkpoint dir,
and serialized StableHLO. All expose ``forward(img_u8) -> (B, max_det, 6)``.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


class AutoBackend:
    def __init__(self, weights: str | Path, model_cfg: str | Path | None = None,
                 imgsz: int = 640, compute_dtype=jnp.bfloat16):
        from xlstm_yolo_tpu.nn.tasks import build_detection_model

        p = Path(weights)
        self.format = None
        self.imgsz = imgsz

        if p.suffix in {".yaml", ".yml"}:
            self.format = "yaml"
            model, d = build_detection_model(p, compute_dtype=compute_dtype)
            img = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
            variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
        elif p.suffix == ".pt":
            self.format = "torch"
            import torch

            from xlstm_yolo_tpu.utils.torch_convert import convert_torch_state_dict

            assert model_cfg, "torch weights need a model yaml"
            model, d = build_detection_model(model_cfg, compute_dtype=compute_dtype)
            img = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
            variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), img)
            ckpt = torch.load(p, map_location="cpu", weights_only=False)
            tm = ckpt.get("ema") or ckpt.get("model") or ckpt
            sd = tm.state_dict() if hasattr(tm, "state_dict") else tm
            variables = jax.tree.map(
                jnp.asarray, convert_torch_state_dict(variables, dict(sd), strict=False)
            )
        elif p.suffix == ".stablehlo" or p.name.endswith(".stablehlo"):
            self.format = "stablehlo"
            from xlstm_yolo_tpu.engine.exporter import load_stablehlo

            self._fn = load_stablehlo(p)
            self._jit = self._fn
            return
        elif p.is_dir():
            self.format = "orbax"
            import orbax.checkpoint as ocp

            assert model_cfg, "orbax weights need a model yaml"
            model, d = build_detection_model(model_cfg, compute_dtype=compute_dtype)
            tree = ocp.PyTreeCheckpointer().restore(str(p.resolve()))
            params = tree.get("ema_params") or tree.get("params")
            from xlstm_yolo_tpu.utils.quantize import dequantize_tree, is_quantized_tree

            if is_quantized_tree(params):  # int8 weight-only PTQ export
                self.format = "orbax_int8"
                params = dequantize_tree(params)
            variables = jax.tree.map(
                jnp.asarray,
                {"params": params, "batch_stats": tree.get("batch_stats", {})},
            )
        else:
            raise ValueError(f"unsupported weights format: {weights}")

        self.model = model
        self.variables = variables

        def fn(img_u8):
            x = img_u8.astype(jnp.float32) / 255.0
            y, _ = model.apply(variables, x)
            return y

        self._fn = fn
        self._jit = jax.jit(fn)

    def forward(self, img_u8):
        return self._jit(jnp.asarray(img_u8))

    __call__ = forward

    def warmup(self, batch: int = 1):
        self.forward(np.zeros((batch, self.imgsz, self.imgsz, 3), np.uint8))
        return self
