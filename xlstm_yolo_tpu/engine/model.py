"""Public Model facade: YOLO('cfg.yaml').train/val/predict/track/export.

Re-design of ref:ultralytics/engine/model.py:29-1100 — same user API,
JAX internals.  Model state is a dict bundle {model (flax eval module),
variables} resolved lazily; per-task classes come from ``task_map``
(parity: models/yolo/model.py:26).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from xlstm_yolo_tpu.cfg import get_cfg
from xlstm_yolo_tpu.nn.tasks import build_detection_model

CFG_MODELS = Path(__file__).resolve().parents[1] / "cfg" / "models"

COCO_NAMES = {
    0: "person", 1: "bicycle", 2: "car", 3: "motorcycle", 4: "airplane", 5: "bus",
    6: "train", 7: "truck", 8: "boat", 9: "traffic light", 10: "fire hydrant",
    11: "stop sign", 12: "parking meter", 13: "bench", 14: "bird", 15: "cat",
    16: "dog", 17: "horse", 18: "sheep", 19: "cow", 20: "elephant", 21: "bear",
    22: "zebra", 23: "giraffe", 24: "backpack", 25: "umbrella", 26: "handbag",
    27: "tie", 28: "suitcase", 29: "frisbee", 30: "skis", 31: "snowboard",
    32: "sports ball", 33: "kite", 34: "baseball bat", 35: "baseball glove",
    36: "skateboard", 37: "surfboard", 38: "tennis racket", 39: "bottle",
    40: "wine glass", 41: "cup", 42: "fork", 43: "knife", 44: "spoon", 45: "bowl",
    46: "banana", 47: "apple", 48: "sandwich", 49: "orange", 50: "broccoli",
    51: "carrot", 52: "hot dog", 53: "pizza", 54: "donut", 55: "cake", 56: "chair",
    57: "couch", 58: "potted plant", 59: "bed", 60: "dining table", 61: "toilet",
    62: "tv", 63: "laptop", 64: "mouse", 65: "remote", 66: "keyboard",
    67: "cell phone", 68: "microwave", 69: "oven", 70: "toaster", 71: "sink",
    72: "refrigerator", 73: "book", 74: "clock", 75: "vase", 76: "scissors",
    77: "teddy bear", 78: "hair drier", 79: "toothbrush",
}


class YOLO:
    """User-facing facade (parity: engine/model.py Model/YOLO)."""

    def __init__(self, model: str | Path = "vil-det-192.yaml", task: str = "detect",
                 verbose: bool = False):
        self.task = task
        self.overrides: dict[str, Any] = {}
        self.names = dict(COCO_NAMES)
        self.ckpt_path = None
        self.model_cfg = None
        self._bundle = None  # {'model', 'variables'}
        self._resolve(model)

    # ------------------------------------------------------------------
    def _resolve(self, model):
        p = Path(model)
        if p.suffix in {".yaml", ".yml"}:
            if not p.exists():
                cand = CFG_MODELS / p.name
                if cand.exists():
                    p = cand
            if not p.exists():
                raise FileNotFoundError(f"model yaml not found: {model}")
            self.model_cfg = str(p)
        elif p.suffix == ".pt":
            self.ckpt_path = str(p)
            self.model_cfg = str(CFG_MODELS / "vil-det-192.yaml")
        elif p.is_dir():  # orbax checkpoint dir
            self.ckpt_path = str(p)
            meta = p.parent / f"{p.name}.meta.json"
            self.model_cfg = str(CFG_MODELS / "vil-det-192.yaml")
        else:
            raise FileNotFoundError(f"cannot resolve model '{model}'")

    def _get_bundle(self, imgsz: int = 640, compute_dtype=jnp.bfloat16,
                    chunkwise_kernel: str = "auto"):
        if self._bundle is not None:
            return self._bundle
        model, d = build_detection_model(
            self.model_cfg, compute_dtype=compute_dtype,
            chunkwise_kernel=chunkwise_kernel,
        )
        rng = jax.random.PRNGKey(0)
        img = jnp.zeros((1, int(d.get("imgsz", imgsz)), int(d.get("imgsz", imgsz)), 3), jnp.float32)
        if self.ckpt_path and self.ckpt_path.endswith(".pt"):
            import torch

            from xlstm_yolo_tpu.utils.torch_convert import convert_torch_state_dict

            variables = jax.eval_shape(model.init, rng, img)
            ckpt = torch.load(self.ckpt_path, map_location="cpu", weights_only=False)
            tm = ckpt.get("ema") or ckpt.get("model") or ckpt
            sd = tm.state_dict() if hasattr(tm, "state_dict") else tm
            sd = {k: v for k, v in sd.items()}
            variables = convert_torch_state_dict(variables, sd, strict=False)
            variables = jax.tree.map(jnp.asarray, variables)
        elif self.ckpt_path:
            import orbax.checkpoint as ocp

            tree = ocp.PyTreeCheckpointer().restore(str(Path(self.ckpt_path).resolve()))
            params = tree.get("ema_params") or tree.get("params")
            variables = {"params": params, "batch_stats": tree.get("batch_stats", {})}
            variables = jax.tree.map(jnp.asarray, variables)
        else:
            variables = jax.jit(model.init)(rng, img)
        self._bundle = {"model": model, "variables": variables}
        return self._bundle

    # -- modes ----------------------------------------------------------
    def _task_class(self, kind: str):
        """Resolve the task's trainer/validator/predictor from task_map."""
        from xlstm_yolo_tpu.models.yolo.model import task_map

        return task_map.get(self.task, task_map["detect"])[kind]

    def predict(self, source=None, stream: bool = False, **kwargs):
        args = get_cfg(overrides={**self.overrides, **kwargs, "mode": "predict",
                                  "task": self.task})
        bundle = self._get_bundle(imgsz=int(args.imgsz),
                                  chunkwise_kernel=str(getattr(args, "chunkwise_kernel", "auto") or "auto"))
        predictor = self._task_class("predictor")(args, bundle, self.names)
        return predictor(source, stream=stream)

    def __call__(self, source=None, **kwargs):
        return self.predict(source, **kwargs)

    def val(self, data=None, **kwargs):
        args = get_cfg(overrides={**self.overrides, **kwargs, "mode": "val",
                                  "task": self.task,
                                  **({"data": data} if data else {})})
        bundle = self._get_bundle(imgsz=int(args.imgsz),
                                  chunkwise_kernel=str(getattr(args, "chunkwise_kernel", "auto") or "auto"))
        validator = self._task_class("validator")(args, data=args.data)
        return validator(bundle, batch_size=int(args.batch))

    def train(self, data=None, **kwargs):
        from xlstm_yolo_tpu.engine.trainer import DetectionTrainer

        overrides = {**self.overrides, **kwargs, "mode": "train"}
        if data:
            overrides["data"] = data
        if self.ckpt_path and "pretrained" not in overrides:
            overrides["pretrained"] = self.ckpt_path
        trainer = DetectionTrainer(overrides=overrides, model_cfg=self.model_cfg)
        metrics = trainer.train()
        self.trainer = trainer
        return metrics

    def track(self, source=None, tracker: str = "bytetrack.yaml", stream: bool = False, **kwargs):
        from xlstm_yolo_tpu.trackers.track import run_tracker

        return run_tracker(self, source, tracker=tracker, stream=stream, **kwargs)

    def export(self, format: str = "stablehlo", **kwargs):
        from xlstm_yolo_tpu.engine.exporter import Exporter

        args = get_cfg(overrides={**self.overrides, **kwargs, "mode": "export", "format": format})
        bundle = self._get_bundle(imgsz=int(args.imgsz))
        return Exporter(args)(bundle)

    def benchmark(self, **kwargs):
        from xlstm_yolo_tpu.utils.benchmarks import benchmark

        return benchmark(self, **kwargs)

    def tune(self, data=None, use_ray: bool = False, iterations: int = 10,
             epochs_per_iter: int = 5, save_dir: str = "runs/tune", **kwargs):
        """Hyperparameter search (parity: ref:engine/model.py Model.tune):
        in-process mutation evolution by default, Ray Tune ASHA with
        ``use_ray=True`` (ref:utils/tuner.py:7)."""
        if use_ray:
            from xlstm_yolo_tpu.engine.tuner import run_ray_tune

            return run_ray_tune(self, max_samples=iterations,
                                **({"data": data} if data else {}), **kwargs)
        from xlstm_yolo_tpu.engine.tuner import Tuner

        args = {**self.overrides, **kwargs, "task": self.task}
        data = data or args.pop("data", None)
        tuner = Tuner(args, save_dir=save_dir)
        return tuner(self.model_cfg, data, iterations=iterations,
                     epochs_per_iter=epochs_per_iter)

    @property
    def info(self):
        bundle = self._get_bundle()
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(bundle["variables"]["params"]))
        return {"params": n, "cfg": self.model_cfg}
