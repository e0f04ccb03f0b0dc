"""Model export: StableHLO, orbax params, TF SavedModel, TFLite.

TPU-native re-design of ref:ultralytics/engine/exporter.py:207-1300:
where the reference fans out to ONNX/TensorRT/CoreML/TFLite..., the XLA
deployment story is (a) a serialized StableHLO program (jax.export) that
any PJRT runtime can load, (b) an orbax params checkpoint, (c) a TF
SavedModel and (d) a TFLite flatbuffer via jax2tf when tensorflow is
importable.  Metadata (names, imgsz, nc) is embedded as JSON next to
the artifact.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

FORMATS = {
    # name: (suffix, description)
    "stablehlo": (".stablehlo", "serialized StableHLO program (jax.export)"),
    "orbax": ("_orbax", "orbax params checkpoint"),
    "orbax_int8": ("_orbax_int8", "orbax checkpoint, int8 weight-only PTQ"),
    "savedmodel": ("_saved_model", "TF SavedModel via jax2tf"),
    "tflite": (".tflite", "TFLite flatbuffer via jax2tf (flex ops)"),
}


def export_formats():
    """Table of supported export formats (parity: exporter.py:111)."""
    return [{"format": k, "suffix": v[0], "description": v[1]} for k, v in FORMATS.items()]


class Exporter:
    def __init__(self, args):
        self.args = args

    def __call__(self, bundle: dict, out_dir: str | Path = "runs/export"):
        fmt = (self.args.format or "stablehlo").lower()
        if fmt not in FORMATS:
            raise ValueError(f"unknown export format '{fmt}'; available {list(FORMATS)}")
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        t0 = time.time()

        model = bundle["model"]
        variables = bundle["variables"]
        imgsz = int(self.args.imgsz)
        batch = int(self.args.batch or 1)

        def forward(img_u8):
            x = img_u8.astype(jnp.float32) / 255.0
            y, _ = model.apply(variables, x)
            return y

        spec = jax.ShapeDtypeStruct((batch, imgsz, imgsz, 3), jnp.uint8)
        meta = {
            "format": fmt,
            "imgsz": imgsz,
            "batch": batch,
            "output": "(batch, max_det, 6) [xyxy(pixels@imgsz), conf, cls]",
            "date": time.strftime("%Y-%m-%d %H:%M:%S"),
        }

        if fmt == "stablehlo":
            from jax import export as jexport

            exported = jexport.export(jax.jit(forward))(spec)
            path = out_dir / "model.stablehlo"
            path.write_bytes(exported.serialize())
        elif fmt in {"orbax", "orbax_int8"}:
            import orbax.checkpoint as ocp

            tree = jax.tree.map(np.asarray, variables)
            if fmt == "orbax_int8":
                from xlstm_yolo_tpu.utils.quantize import quantize_tree

                tree = dict(tree)
                tree["params"] = quantize_tree(tree["params"])
                meta["quantization"] = "int8 weight-only, per-output-channel symmetric"
            path = (out_dir / f"model_{fmt}").resolve()
            if path.exists():
                import shutil

                shutil.rmtree(path)
            ocp.PyTreeCheckpointer().save(str(path), tree)
        elif fmt == "savedmodel":
            try:
                import tensorflow as tf
                from jax.experimental import jax2tf
            except ImportError as e:
                raise RuntimeError(
                    "savedmodel export requires tensorflow (not in this env); "
                    "use format='stablehlo' instead"
                ) from e
            tf_fn = tf.function(
                jax2tf.convert(forward, with_gradient=False),
                input_signature=[tf.TensorSpec((batch, imgsz, imgsz, 3), tf.uint8)],
                autograph=False,
            )
            mod = tf.Module()
            mod.f = tf_fn
            path = out_dir / "saved_model"
            tf.saved_model.save(mod, str(path))
        elif fmt == "tflite":
            # parity: ref:engine/exporter.py TFLite path — the XLA route
            # is jax2tf -> TFLiteConverter with SELECT_TF_OPS so the
            # jax2tf-native XlaCallModule op rides the flex delegate
            # bundled in the full tensorflow package's Interpreter.
            try:
                import tensorflow as tf
                from jax.experimental import jax2tf
            except ImportError as e:
                raise RuntimeError(
                    "tflite export requires tensorflow (not in this env); "
                    "use format='stablehlo' instead"
                ) from e
            tf_fn = tf.function(
                jax2tf.convert(forward, with_gradient=False),
                input_signature=[tf.TensorSpec((batch, imgsz, imgsz, 3), tf.uint8)],
                autograph=False,
            )
            conv = tf.lite.TFLiteConverter.from_concrete_functions(
                [tf_fn.get_concrete_function()])
            conv.target_spec.supported_ops = [
                tf.lite.OpsSet.TFLITE_BUILTINS,
                tf.lite.OpsSet.SELECT_TF_OPS,
            ]
            path = out_dir / "model.tflite"
            path.write_bytes(conv.convert())

        (out_dir / "metadata.json").write_text(json.dumps(meta, indent=2))
        print(f"export: {fmt} -> {path} ({time.time() - t0:.1f}s)")
        return str(path)


def load_stablehlo(path: str | Path):
    """Rehydrate an exported StableHLO program into a callable."""
    from jax import export as jexport

    exported = jexport.deserialize(Path(path).read_bytes())
    return lambda img: exported.call(img)
