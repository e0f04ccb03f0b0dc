"""Event callback bus (parity: ref:ultralytics/utils/callbacks/base.py:146-173).

Same 23-event vocabulary; integrations (tensorboard/csv) register
themselves onto a Callbacks instance.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Callable

EVENTS = [
    "on_pretrain_routine_start", "on_pretrain_routine_end",
    "on_train_start", "on_train_epoch_start", "on_train_batch_start",
    "optimizer_step", "on_before_zero_grad", "on_train_batch_end",
    "on_train_epoch_end", "on_fit_epoch_end", "on_model_save",
    "on_train_end", "on_params_update", "teardown",
    "on_val_start", "on_val_batch_start", "on_val_batch_end", "on_val_end",
    "on_predict_start", "on_predict_batch_start", "on_predict_batch_end",
    "on_predict_postprocess_end", "on_predict_end",
    "on_export_start", "on_export_end",
]


class Callbacks:
    def __init__(self):
        self._hooks: dict[str, list[Callable]] = defaultdict(list)

    def add(self, event: str, fn: Callable):
        assert event in EVENTS, f"unknown event '{event}'"
        self._hooks[event].append(fn)

    def run(self, event: str, *args, **kwargs):
        for fn in self._hooks.get(event, []):
            fn(*args, **kwargs)

    def get(self, event: str):
        return list(self._hooks.get(event, []))


def add_tensorboard(callbacks: Callbacks, log_dir: str):
    """TensorBoard integration via flax.metrics or a no-op fallback."""
    try:
        from flax.metrics import tensorboard as tb
    except Exception:
        return

    writer = tb.SummaryWriter(log_dir)

    def on_fit_epoch_end(trainer):
        for k, v in (trainer.metrics or {}).items():
            try:
                writer.scalar(k, float(v), trainer.epoch)
            except Exception:
                pass

    callbacks.add("on_fit_epoch_end", on_fit_epoch_end)
