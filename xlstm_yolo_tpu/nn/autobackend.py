"""Uniform inference across weight formats (parity: ref:ultralytics/nn/autobackend.py:54).

Where the reference multiplexes 15 runtime formats, the XLA set is:
model YAML (fresh init), torch .pt (converted), orbax checkpoint dir
(incl. ``strip_optimizer`` deploy dirs), and serialized StableHLO. All
expose ``forward(img_u8) -> (B, max_det, 6)``.

Like the reference, metadata rides with the weights: orbax checkpoint
dirs carry a sibling ``<name>.meta.json`` (written by
utils/checkpoint.save_checkpoint / strip_optimizer) holding the train
args — AutoBackend self-configures ``model_cfg``, ``imgsz``, ``task``
and class ``names`` from it so ``AutoBackend("runs/.../weights/best")``
works with no other arguments (ref behavior: names/stride/task restored
from the .pt payload, ref:nn/autobackend.py:303-318).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


class AutoBackend:
    def __init__(self, weights: str | Path, model_cfg: str | Path | None = None,
                 imgsz: int | None = None, compute_dtype=jnp.bfloat16,
                 fuse: bool = True):
        from xlstm_yolo_tpu.nn.tasks import build_detection_model

        p = Path(weights)
        self.format = None
        self.task = "detect"
        self.names: dict[int, str] | None = None
        self.meta: dict = {}

        # ---- metadata sidecar (orbax dirs) -------------------------------
        if p.is_dir():
            meta_file = p.parent / f"{p.name}.meta.json"
            if meta_file.exists():
                self.meta = json.loads(meta_file.read_text())
                args = self.meta.get("args", {})
                model_cfg = model_cfg or args.get("model")
                imgsz = imgsz or args.get("imgsz")
                self.task = args.get("task", self.task)
                data = args.get("data")
                if data and Path(str(data)).exists():
                    try:
                        import yaml

                        dd = yaml.safe_load(Path(str(data)).read_text())
                        names = dd.get("names")
                        if isinstance(names, list):
                            names = dict(enumerate(names))
                        if isinstance(names, dict):
                            self.names = {int(k): str(v) for k, v in names.items()}
                    except Exception:  # dataset yaml moved — names stay None
                        pass
        self.imgsz = int(imgsz or 640)
        # class count must match the trained head (a 2-class checkpoint
        # cannot load into the yaml's default nc=80 head)
        nc = len(self.names) if self.names else None

        if p.suffix in {".yaml", ".yml"}:
            self.format = "yaml"
            model, d = build_detection_model(p, nc=nc, compute_dtype=compute_dtype)
            img = jnp.zeros((1, self.imgsz, self.imgsz, 3), jnp.float32)
            variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
        elif p.suffix == ".pt":
            self.format = "torch"
            import torch

            from xlstm_yolo_tpu.utils.torch_convert import convert_torch_state_dict

            assert model_cfg, "torch weights need a model yaml"
            model, d = build_detection_model(model_cfg, nc=nc, compute_dtype=compute_dtype)
            img = jnp.zeros((1, self.imgsz, self.imgsz, 3), jnp.float32)
            variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), img)
            ckpt = torch.load(p, map_location="cpu", weights_only=False)
            tm = ckpt.get("ema") or ckpt.get("model") or ckpt
            if isinstance(ckpt, dict) and hasattr(tm, "names"):
                self.names = dict(getattr(tm, "names"))
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
        elif p.suffix == ".tflite":
            self.format = "tflite"
            import tensorflow as tf  # full package bundles the flex delegate

            interp = tf.lite.Interpreter(model_path=str(p))
            interp.allocate_tensors()
            inp = interp.get_input_details()[0]
            out = interp.get_output_details()[0]

            def tflite_fn(img_u8):
                interp.set_tensor(inp["index"], np.asarray(img_u8, np.uint8))
                interp.invoke()
                return jnp.asarray(interp.get_tensor(out["index"]))

            self._fn = tflite_fn
            self._jit = tflite_fn
            return
        elif p.is_dir():
            self.format = "orbax"
            import orbax.checkpoint as ocp

            assert model_cfg, (
                "orbax weights need a model yaml (none found in the "
                f"checkpoint's meta.json sidecar either: {p})"
            )
            model, d = build_detection_model(model_cfg, nc=nc, compute_dtype=compute_dtype)
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

        if self.names is None:
            nc = int(d.get("nc", 80)) if isinstance(d, dict) else 80
            self.names = {i: f"class{i}" for i in range(nc)}

        # eval-mode BN folding, like the reference's fuse() default
        # (ref:nn/autobackend.py:141 fuse=True)
        if fuse:
            try:
                from xlstm_yolo_tpu.utils.fuse import fuse_variables

                fused_np = fuse_variables(jax.tree.map(np.asarray, variables))
                model_f, _ = build_detection_model(
                    model_cfg or p, nc=nc, compute_dtype=compute_dtype, fused=True)
                variables = jax.tree.map(jnp.asarray, fused_np)
                model = model_f
            except Exception:  # model without foldable BN — keep unfused
                pass

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
