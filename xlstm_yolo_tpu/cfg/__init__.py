"""Runtime config system: defaults + typed overrides + CLI parsing.

Re-design of ref:ultralytics/cfg/__init__.py:276-420 (get_cfg) and :825
(CLI entrypoint parsing 'yolo TASK MODE k=v').
"""

from __future__ import annotations

import difflib
from pathlib import Path
from types import SimpleNamespace
from typing import Any

import yaml

CFG_DIR = Path(__file__).resolve().parent
DEFAULT_CFG_PATH = CFG_DIR / "default.yaml"

_FLOAT_01_KEYS = {
    "dropout", "fraction", "hsv_h", "hsv_s", "hsv_v", "translate", "scale",
    "fliplr", "flipud", "mosaic", "mixup", "copy_paste", "conf", "iou", "lr0",
    "lrf", "momentum", "weight_decay",
}
_INT_KEYS = {"epochs", "patience", "workers", "seed", "close_mosaic", "max_det",
             "vid_stride", "save_period", "nbs", "max_targets"}
_BOOL_KEYS = {"save", "cache", "exist_ok", "pretrained", "verbose", "deterministic",
              "single_cls", "rect", "cos_lr", "resume", "amp", "profile", "val",
              "save_json", "save_hybrid", "half", "dnn", "plots", "visualize",
              "augment", "agnostic_nms", "retina_masks", "multi_scale",
              "stream_buffer", "keras", "optimize", "int8", "dynamic", "simplify",
              "nms"}

TASKS = {"detect", "segment", "pose", "obb", "classify"}
MODES = {"train", "val", "predict", "track", "export", "benchmark", "tune"}


def load_default_cfg() -> dict:
    with open(DEFAULT_CFG_PATH) as fh:
        return yaml.safe_load(fh)


def _coerce(k: str, v: Any) -> Any:
    if v is None or v == "None" or v == "":
        return None
    if k in _BOOL_KEYS and isinstance(v, str):
        return v.lower() == "true"
    if k in _INT_KEYS and v is not None:
        return int(v)
    if isinstance(v, str):
        try:
            fv = float(v)
            return int(fv) if fv.is_integer() and k in _INT_KEYS else fv
        except ValueError:
            return v
    return v


def get_cfg(cfg: dict | str | Path | None = None, overrides: dict | None = None) -> SimpleNamespace:
    """Merge defaults <- cfg <- overrides with type checks + suggestions."""
    base = load_default_cfg()
    if cfg is not None:
        if isinstance(cfg, (str, Path)):
            with open(cfg) as fh:
                cfg = yaml.safe_load(fh)
        base.update({k: v for k, v in dict(cfg).items() if v is not None})
    if overrides:
        for k, v in overrides.items():
            if k not in base:
                close = difflib.get_close_matches(k, base.keys(), n=1)
                hint = f" — did you mean '{close[0]}'?" if close else ""
                raise KeyError(f"'{k}' is not a valid config key{hint}")
            base[k] = _coerce(k, v)
    for k in _FLOAT_01_KEYS:
        v = base.get(k)
        if isinstance(v, (int, float)) and k not in {"lr0", "lrf", "momentum", "weight_decay"}:
            if not 0.0 <= float(v) <= 1.0:
                raise ValueError(f"'{k}={v}' must be in [0, 1]")
    return SimpleNamespace(**base)


#: special first-word commands (parity: ref:cfg/__init__.py:555-690
#: handle_yolo_settings / handle_yolo_solutions + the version/checks/cfg
#: words of the reference entrypoint; `hub` is scoped out with hub/).
SPECIAL = {"settings", "version", "checks", "cfg", "solutions"}


def _handle_special(cmd: str, rest: list[str]) -> Any:
    if cmd == "version":
        from importlib.metadata import PackageNotFoundError, version as _v

        try:
            v = _v("xlstm-yolo-tpu")
        except PackageNotFoundError:
            v = "0.1.0 (source checkout)"
        print(v)
        return v
    if cmd == "cfg":
        import json

        cfg = load_default_cfg()
        print("\n".join(f"{k}={cfg[k]}" for k in sorted(cfg)))
        return cfg
    if cmd == "checks":
        import jax

        from xlstm_yolo_tpu.utils.checks import check_jax_backend

        info = {
            "jax": jax.__version__,
            "backend": check_jax_backend(),
            "devices": [str(d) for d in jax.devices()],
        }
        for k, v in info.items():
            print(f"{k}: {v}")
        return info
    if cmd == "settings":
        from xlstm_yolo_tpu.utils import SETTINGS

        if rest and rest[0] == "reset":
            SETTINGS.reset()
            print("settings reset")
        else:
            for a in rest:
                if "=" in a:
                    k, v = a.split("=", 1)
                    # settings keys are not cfg keys: generic YAML coercion
                    SETTINGS.update(**{k: yaml.safe_load(v)})
            SETTINGS.save()
        for k, v in sorted(SETTINGS.items()):
            print(f"{k}={v}")
        return dict(SETTINGS)
    # solutions: `yolo solutions [name] source=... key=value ...`
    import xlstm_yolo_tpu.solutions as sol

    registry = {
        "count": sol.ObjectCounter, "heatmap": sol.Heatmap,
        "speed": sol.SpeedEstimator, "queue": sol.QueueManager,
        "region": sol.RegionCounter, "distance": sol.DistanceCalculation,
        "workout": sol.AIGym, "trackzone": sol.TrackZone,
        "analytics": sol.Analytics, "parking": sol.ParkingManagement,
        "security": sol.SecurityAlarm,
    }
    if not rest or rest[0] not in registry:
        print(f"available solutions: {sorted(registry)}")
        return sorted(registry)
    name, kv = rest[0], {}
    for a in rest[1:]:
        if "=" in a:
            k, v = a.split("=", 1)
            kv[k] = _coerce(k, v)
    source = kv.pop("source", None)
    inst = registry[name](**kv)
    if source is None:
        print(f"{name}: constructed; pass source=<video|image> to run")
        return inst
    from xlstm_yolo_tpu.data.loaders import LoadImagesAndVideos

    # each solution exposes a per-frame verb; duck-type the first match
    verb = next((v for v in ("process", "count", "estimate_speed", "monitor",
                             "process_queue", "process_data")
                 if hasattr(inst, v)), None)
    if verb is None:
        raise SystemExit(
            f"solution '{name}' exposes no runnable per-frame verb "
            "(expected one of process/count/estimate_speed/monitor/"
            "process_queue/process_data)")
    run = getattr(inst, verb)
    n = 0
    for paths, imgs, infos in LoadImagesAndVideos(str(source)):
        for im in imgs:
            run(im)
            n += 1
    print(f"{name}: processed {n} frames from {source}")
    return inst


def entrypoint(argv: list[str] | None = None) -> Any:
    """CLI: ``yolo TASK MODE k=v ...`` (parity: cfg/__init__.py:825)."""
    import sys

    args = argv if argv is not None else sys.argv[1:]
    if not args or args[0] in {"-h", "--help", "help"}:
        print("usage: yolo [task] mode key=value ...\n"
              f"  tasks: {sorted(TASKS)}\n  modes: {sorted(MODES)}\n"
              f"  special: {sorted(SPECIAL)}")
        return None
    if args[0] in SPECIAL:
        return _handle_special(args[0], list(args[1:]))

    task, mode = "detect", None
    overrides: dict[str, Any] = {}
    for a in args:
        if "=" in a:
            k, v = a.split("=", 1)
            overrides[k] = _coerce(k, v)
        elif a in TASKS:
            task = a
        elif a in MODES:
            mode = a
        else:
            raise ValueError(f"unrecognized argument '{a}'")
    if mode is None:
        raise ValueError(f"a mode is required: {sorted(MODES)}")

    from xlstm_yolo_tpu.engine.model import YOLO

    model_path = overrides.pop("model", None) or "vil-det-192.yaml"
    model = YOLO(model_path, task=task)
    return getattr(model, mode)(**overrides)
