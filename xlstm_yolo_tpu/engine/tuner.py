"""Mutation-based hyperparameter evolution (parity: ref:ultralytics/engine/tuner.py:40+).

Each generation mutates the best-so-far hyperparameters within bounded
search spaces (gaussian perturbation, clipped), trains a short run, and
logs fitness to tune_results.csv; the best generation's args are kept.
Runs in-process (no subprocess relaunch — JAX state is cheap to rebuild).
"""

from __future__ import annotations

import csv
import random
import shutil
from pathlib import Path

import numpy as np

# (min, max, gain) per hyperparameter — parity with the reference space
SPACE = {
    "lr0": (1e-5, 1e-1, 1.0),
    "lrf": (0.01, 1.0, 1.0),
    "momentum": (0.6, 0.98, 0.3),
    "weight_decay": (0.0, 0.001, 1.0),
    "warmup_epochs": (0.0, 5.0, 1.0),
    "box": (0.02, 0.2, 1.0),
    "cls": (0.2, 4.0, 1.0),
    "dfl": (0.4, 6.0, 1.0),
    "hsv_h": (0.0, 0.1, 1.0),
    "hsv_s": (0.0, 0.9, 1.0),
    "hsv_v": (0.0, 0.9, 1.0),
    "degrees": (0.0, 45.0, 1.0),
    "translate": (0.0, 0.9, 1.0),
    "scale": (0.0, 0.9, 1.0),
    "shear": (0.0, 10.0, 1.0),
    "perspective": (0.0, 0.001, 1.0),
    "flipud": (0.0, 1.0, 1.0),
    "fliplr": (0.0, 1.0, 1.0),
    "mosaic": (0.0, 1.0, 1.0),
    "mixup": (0.0, 1.0, 1.0),
}


class Tuner:
    def __init__(self, args: dict, save_dir: str | Path = "runs/tune"):
        self.base_args = dict(args)
        self.save_dir = Path(save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.csv = self.save_dir / "tune_results.csv"

    def _mutate(self, parent: dict, rng: random.Random, mutation: float = 0.8,
                sigma: float = 0.2) -> dict:
        child = dict(parent)
        while True:
            changed = False
            for k, (lo, hi, gain) in SPACE.items():
                if rng.random() < mutation:
                    v = float(parent.get(k, (lo + hi) / 2))
                    v *= 1 + rng.gauss(0, sigma) * gain
                    child[k] = float(np.clip(v, lo, hi))
                    changed = True
            if changed:
                return child

    def __call__(self, model_cfg: str, data: str, iterations: int = 10,
                 epochs_per_iter: int = 5, seed: int = 0):
        from xlstm_yolo_tpu.engine.trainer import DetectionTrainer

        rng = random.Random(seed)
        best_fit, best_hyp = -1.0, {k: self.base_args.get(k) for k in SPACE if k in self.base_args}
        history = []

        for gen in range(iterations):
            hyp = self._mutate(best_hyp, rng) if gen > 0 else dict(best_hyp)
            overrides = {**self.base_args, **hyp,
                         "data": data, "epochs": epochs_per_iter,
                         "project": str(self.save_dir), "name": f"gen{gen}",
                         "exist_ok": True, "val": True, "plots": False}
            try:
                trainer = DetectionTrainer(overrides=overrides, model_cfg=model_cfg)
                metrics = trainer.train()
                fit = float(metrics.get("fitness", 0.0))
            except Exception as e:  # a bad mutation must not kill the search
                print(f"tune gen{gen} failed: {e}")
                fit = 0.0
            history.append({"gen": gen, "fitness": fit, **hyp})
            if fit > best_fit:
                best_fit, best_hyp = fit, hyp
                shutil.copy(
                    self.save_dir / f"gen{gen}" / "results.csv",
                    self.save_dir / "best_results.csv",
                ) if (self.save_dir / f"gen{gen}" / "results.csv").exists() else None
            self._log(history)
            print(f"tune gen{gen}: fitness={fit:.4f} best={best_fit:.4f}")

        (self.save_dir / "best_hyperparameters.yaml").write_text(
            "\n".join(f"{k}: {v}" for k, v in best_hyp.items())
        )
        return best_hyp, best_fit

    def _log(self, history):
        with open(self.csv, "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=list(history[0].keys()))
            w.writeheader()
            w.writerows(history)
