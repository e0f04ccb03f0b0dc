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
        # union of keys: gen0 logs only the inherited hyps, mutated gens
        # log the full space
        fields = list(dict.fromkeys(k for row in history for k in row))
        with open(self.csv, "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=fields, restval="")
            w.writeheader()
            w.writerows(history)


# -- Ray Tune integration (parity: ref:ultralytics/utils/tuner.py:7-157) --

TASK2METRIC = {
    "detect": "metrics/mAP50-95(B)",
    "segment": "metrics/mAP50-95(M)",
    "pose": "metrics/mAP50-95(P)",
    "obb": "metrics/mAP50-95(B)",
    "classify": "metrics/accuracy_top1",
}


def ray_tune_space():
    """The reference's default search space as plain (low, high) bounds
    (ref:utils/tuner.py:63-87) — converted to ``tune.uniform`` only when
    ray is importable, so the space itself stays testable without it."""
    return {k: (lo, hi) for k, (lo, hi, _gain) in SPACE.items()} | {
        "warmup_momentum": (0.0, 0.95),
        "copy_paste": (0.0, 1.0),
    }


def run_ray_tune(model, space: dict | None = None, grace_period: int = 10,
                 gpu_per_trial: int | None = None, max_samples: int = 10,
                 **train_args):
    """Distributed hyperparameter search via Ray Tune + ASHA.

    Parity: ref:ultralytics/utils/tuner.py:7 — same signature, same
    default space, ASHA over the task metric. Ray is an optional
    integration (not bundled in this environment); without it this
    raises the reference's ModuleNotFoundError.
    """
    try:
        import ray
        from ray import tune
        from ray.air import RunConfig
        from ray.tune.schedulers import ASHAScheduler
    except ImportError:
        raise ModuleNotFoundError(
            'Ray Tune required but not found. To install run: pip install "ray[tune]"'
        )

    task = getattr(model, "task", "detect")
    space = space or {k: tune.uniform(lo, hi)
                      for k, (lo, hi) in ray_tune_space().items()}
    data = train_args.get("data")
    if data:
        space["data"] = data

    model_in_store = ray.put(model)

    def _tune(config):
        m = ray.get(model_in_store)
        config.update(train_args)
        return m.train(**config)

    trainable = tune.with_resources(
        _tune, {"cpu": 8, "gpu": gpu_per_trial or 0})
    scheduler = ASHAScheduler(
        time_attr="epoch", metric=TASK2METRIC.get(task, TASK2METRIC["detect"]),
        mode="max", max_t=train_args.get("epochs") or 100,
        grace_period=grace_period, reduction_factor=3)
    tune_dir = Path(train_args.pop("save_dir", "runs/tune_ray")).resolve()
    tune_dir.mkdir(parents=True, exist_ok=True)
    tuner = tune.Tuner(
        trainable, param_space=space,
        tune_config=tune.TuneConfig(scheduler=scheduler,
                                    num_samples=max_samples),
        run_config=RunConfig(storage_path=str(tune_dir)))
    tuner.fit()
    results = tuner.get_results()
    ray.shutdown()
    return results
