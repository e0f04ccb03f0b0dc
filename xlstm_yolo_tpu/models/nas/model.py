"""YOLO-NAS model facade (parity: ref:ultralytics/models/nas/model.py:27-96).

YOLO-NAS is a *weights-only* plugin upstream too: the architecture lives
in the external ``super_gradients`` package and the reference merely
wraps a loaded torch module with NMS postprocess. This environment has
neither the package nor weight downloads, so the facade offers three
entry points:

- ``NAS.from_jax(module, variables, names)`` — a native JAX forward
  (``module.apply(variables, x) -> ((boxes_xyxy, class_scores), aux)``),
  the TPU deployment path once weights are converted;
- ``NAS.from_torch(torch_module, names)`` — bridges a host torch module
  into the jitted pre/postprocess via ``jax.pure_callback`` (NCHW on
  host, NHWC on device);
- ``NAS('yolo_nas_s.pt')`` — the reference entry, gated on
  ``super_gradients`` with a clear error (its checkpoints cannot even
  unpickle without the package).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from xlstm_yolo_tpu.cfg import get_cfg
from xlstm_yolo_tpu.engine.model import COCO_NAMES

from .predict import NASPredictor
from .val import NASValidator

__all__ = ["NAS"]


class _TorchBridge:
    """Flax-shaped adapter: device NHWC -> host torch NCHW -> raw preds."""

    def __init__(self, torch_module, imgsz: int = 640):
        import torch

        self._torch = torch
        self._module = torch_module.eval()
        with torch.no_grad():  # probe output shapes once (A, nc)
            out = self._unpack(self._module(torch.zeros(1, 3, imgsz, imgsz)))
        self._a, self._nc = out[0].shape[1], out[1].shape[2]

    @staticmethod
    def _unpack(y):
        # super-gradients returns ((boxes, scores), ...) — ref predict.py:38
        y = y[0] if isinstance(y, (tuple, list)) and isinstance(y[0], (tuple, list)) else y
        return y[0], y[1]

    def _host(self, x_nhwc: np.ndarray):
        t = self._torch.from_numpy(
            np.array(x_nhwc.transpose(0, 3, 1, 2), np.float32))
        with self._torch.no_grad():
            boxes, scores = self._unpack(self._module(t))
        return (np.asarray(boxes, np.float32), np.asarray(scores, np.float32))

    def apply(self, variables, x):
        b = x.shape[0]
        shapes = (
            jax.ShapeDtypeStruct((b, self._a, 4), jnp.float32),
            jax.ShapeDtypeStruct((b, self._a, self._nc), jnp.float32),
        )
        boxes, scores = jax.pure_callback(self._host, shapes, x.astype(jnp.float32))
        return (boxes, scores), {}


class NAS:
    """YOLO-NAS interface (detect only, like the reference)."""

    def __init__(self, model: str | Path = "yolo_nas_s.pt", *,
                 _bundle: dict | None = None, names: dict | None = None):
        self.task = "detect"
        self.overrides: dict[str, Any] = {}
        self.names = dict(names or COCO_NAMES)
        if _bundle is not None:
            self._bundle = _bundle
            return
        assert Path(model).suffix not in {".yaml", ".yml"}, \
            "YOLO-NAS models only support pre-trained models."
        try:
            import super_gradients  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "YOLO-NAS weights require the super_gradients package "
                "(unavailable in this environment). Convert the weights and "
                "use NAS.from_jax(...), or wrap a loaded torch module with "
                "NAS.from_torch(...)."
            ) from e
        import torch

        suffix = Path(model).suffix
        if suffix == ".pt":
            module = torch.load(model, map_location="cpu")
        else:  # bare name -> pretrained from super-gradients (needs egress)
            module = super_gradients.training.models.get(
                str(model), pretrained_weights="coco")
        if hasattr(module, "_class_names"):
            self.names = dict(enumerate(module._class_names))
        self._bundle = {"model": _TorchBridge(module), "variables": {}}

    # -- constructors ------------------------------------------------------
    @classmethod
    def from_jax(cls, module, variables, names: dict | None = None):
        """Wrap a native JAX NAS forward (apply -> ((boxes, scores), aux))."""
        return cls(_bundle={"model": module, "variables": variables},
                   names=names)

    @classmethod
    def from_torch(cls, torch_module, names: dict | None = None,
                   imgsz: int = 640):
        """Wrap a host torch NAS module via a pure_callback bridge."""
        return cls(_bundle={"model": _TorchBridge(torch_module, imgsz),
                            "variables": {}}, names=names)

    # -- API (parity: ref model.py task_map + Model.predict/val) -----------
    @property
    def task_map(self):
        return {"detect": {"predictor": NASPredictor,
                           "validator": NASValidator}}

    def predict(self, source=None, stream: bool = False, **kwargs):
        args = get_cfg(overrides={**self.overrides, **kwargs,
                                  "mode": "predict", "task": self.task})
        predictor = NASPredictor(args, self._bundle, self.names)
        return predictor(source, stream=stream)

    def __call__(self, source=None, **kwargs):
        return self.predict(source, **kwargs)

    def val(self, data=None, **kwargs):
        args = get_cfg(overrides={**self.overrides, **kwargs, "mode": "val",
                                  "task": self.task,
                                  **({"data": data} if data else {})})
        validator = NASValidator(args, data=args.data)
        return validator(self._bundle, batch_size=int(args.batch or 16))

    def info(self):
        n = sum(np.prod(v.shape) for v in
                jax.tree.leaves(self._bundle.get("variables", {})))
        return {"task": self.task, "params": int(n)}
