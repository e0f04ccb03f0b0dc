"""xlstm_yolo_tpu — a TPU-native Vision-LSTM (xLSTM) object-detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
DJT777/xlstm-yolo-clean (an Ultralytics 8.3.85 fork with a ViL/xLSTM
backbone backed by Triton chunkwise mLSTM kernels):

- ``ops``      — mLSTM compute kernels: pure-jnp references, chunkwise
                 scan formulations, and Pallas TPU kernels (fw+bw).
- ``nn``       — functional ViL/YOLO module zoo + YAML graph compiler.
- ``engine``   — Model facade, Trainer, Validator, Predictor, Exporter.
- ``data``     — host-side dataset/augmentation pipeline feeding jitted steps.
- ``utils``    — TAL assigner, losses, metrics, box ops, NMS (on-device).
- ``parallel`` — mesh/sharding helpers (pjit data/model parallelism).

Reference parity notes cite files under the upstream repo as
``ref:<path>:<line>`` in docstrings throughout the code base.
"""

__version__ = "0.1.0"


def __getattr__(name):  # lazy: keep `import xlstm_yolo_tpu.ops` cheap
    if name == "YOLO":
        from xlstm_yolo_tpu.engine.model import YOLO

        return YOLO
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = ["YOLO", "__version__"]
