#!/usr/bin/env python
"""END-TO-END training throughput: real loader -> real TPU train step.

VERDICT r5 item 4: every train number so far is device-resident
synthetic batches; the host pipeline feeds ~33 img/s (aug) vs the ~50
img/s device step.  This script measures the actual achieved e2e img/s
with the REAL DetectionTrainer (flagship 640 model, flat optimizer,
prefetching loader) on a synthetic COCO-like disk dataset:

  A. host augmentation (threads, RAM decode cache)
  B. device-side HSV+fliplr (XY_DEVICE_AUG=1; host runs them zeroed)

plus the loader-only feed rate and the synthetic device-step rate with
device_aug off/on (its on-chip cost) — the four numbers for
docs/E2E_TRAIN.md.  Usage: python scripts/exp_e2e_train.py
Writes /tmp/tpu_queue/e2e_train.json
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from exp_host_pipeline import make_dataset  # noqa: E402

BATCH, EPOCHS = 8, 3
N_IMGS = 240


def run_trainer(data_yaml: Path, device_aug: bool,
                host_aug: bool = True) -> dict:
    """Run the real trainer in a SUBPROCESS (clean env per variant) and
    parse the per-epoch e2e img/s lines.  ``host_aug=False`` zeroes the
    host geometric augs (mosaic/perspective) — NOT training-equivalent,
    but measures the pipeline ceiling once those move on-device
    (data/device_mosaic.py is the prototype for that)."""
    cfg_path = str(REPO / "xlstm_yolo_tpu/cfg/models/vil-det-192.yaml")
    extra = "" if host_aug else \
        ", mosaic=0.0, translate=0.0, scale=0.0, augment=False"
    code = f"""
import sys, tempfile; sys.path.insert(0, {str(REPO)!r})
from xlstm_yolo_tpu.engine.trainer import DetectionTrainer
tr = DetectionTrainer(overrides=dict(
    model={cfg_path!r},
    data={str(data_yaml)!r}, imgsz=640, batch={BATCH}, epochs={EPOCHS},
    nbs={BATCH}, val=False, plots=False, workers=8, cache="ram",
    save=False, seed=0, project=tempfile.mkdtemp(prefix="e2erun"){extra}),
    model_cfg={cfg_path!r})
tr.train()
"""
    env = dict(os.environ)
    env["XY_DEVICE_AUG"] = "1" if device_aug else "0"
    t0 = time.perf_counter()
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3000, env=env)
    wall = time.perf_counter() - t0
    rates = [float(m) for m in re.findall(r"([0-9.]+) img/s", out.stdout)]
    print(out.stdout[-2000:], flush=True)
    if out.returncode != 0:
        print(out.stderr[-3000:], flush=True)
    return {"epoch_img_s": rates, "wall_s": round(wall, 1),
            "steady_img_s": rates[-1] if rates else -1.0,
            "rc": out.returncode}


def loader_rate(data_yaml: Path) -> float:
    from xlstm_yolo_tpu.cfg import get_cfg
    from xlstm_yolo_tpu.data.build import build_dataloader, build_yolo_dataset
    from xlstm_yolo_tpu.data.dataset import check_det_dataset

    data = check_det_dataset(str(data_yaml))
    args = get_cfg(None, {"imgsz": 640, "task": "detect", "cache": "ram",
                          "mosaic": 1.0, "mixup": 0.0})
    ds = build_yolo_dataset(args, data["train"], BATCH, data, mode="train")
    loader = build_dataloader(ds, BATCH, workers=8, shuffle=True)
    n = 0
    for b in loader._iter_epoch(0):  # warm (fills the RAM cache)
        n += b["img"].shape[0]
    t0 = time.perf_counter()
    n = 0
    for b in loader._iter_epoch(1):
        n += b["img"].shape[0]
    return n / (time.perf_counter() - t0)


def device_step_rates() -> dict:
    """Synthetic device-resident step with device_aug off/on."""
    import jax
    import jax.numpy as jnp

    from xlstm_yolo_tpu.engine import optimizers as opt_lib
    from xlstm_yolo_tpu.engine.steps import FlatTrainState, make_train_step
    from xlstm_yolo_tpu.nn.tasks import build_detection_model

    CFG = REPO / "xlstm_yolo_tpu" / "cfg" / "models" / "vil-det-192.yaml"
    rng = jax.random.PRNGKey(0)
    img_f = jnp.zeros((BATCH, 640, 640, 3), jnp.float32)
    model_tr, _ = build_detection_model(CFG, training=True,
                                        compute_dtype=jnp.bfloat16)
    v_tr = jax.jit(model_tr.init)({"params": rng, "droppath": rng}, img_f)
    tx, _, _ = opt_lib.build_flat_optimizer(
        v_tr["params"], name="SGD", lr=0.01, momentum=0.9, weight_decay=5e-4)
    M = 32

    @jax.jit
    def mk(key):
        k1, k2, k3 = jax.random.split(key, 3)
        img = jax.random.randint(k1, (BATCH, 640, 640, 3), 0, 255, jnp.uint8)
        cls = jax.random.randint(k2, (BATCH, M), 0, 80, jnp.int32)
        xy = jax.random.uniform(k3, (BATCH, M, 2), minval=40.0, maxval=560.0)
        wh = jax.random.uniform(jax.random.fold_in(k3, 1), (BATCH, M, 2),
                                minval=16.0, maxval=120.0)
        return {"img": img, "cls": cls,
                "bboxes": jnp.concatenate([xy, xy + wh], -1),
                "mask": jnp.broadcast_to(jnp.arange(M)[None] < 8, (BATCH, M))}

    batches = [mk(k) for k in jax.random.split(jax.random.PRNGKey(1), 10)]
    _ = np.asarray(batches[-1]["img"][0, 0, 0])
    out = {}
    for name, aug in (("step_ms_host_aug", None),
                      ("step_ms_device_aug",
                       {"hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
                        "fliplr": 0.5})):
        step = jax.jit(make_train_step(model_tr, tx, nc=80, accumulate=1,
                                       device_aug=aug))
        state = FlatTrainState.create(v_tr, tx)
        srng = jax.random.PRNGKey(8)
        for b in batches[:2]:
            srng, sub = jax.random.split(srng)
            state, m = step(state, b, sub)
            _ = float(m["loss"])
        t0 = time.perf_counter()
        for b in batches[2:]:
            srng, sub = jax.random.split(srng)
            state, m = step(state, b, sub)
        _ = float(m["loss"])
        out[name] = round((time.perf_counter() - t0) / 8 * 1e3, 2)
        print(f"RESULT {name}: {out[name]} ms", flush=True)
    return out


def main():
    tmp = Path(tempfile.mkdtemp(prefix="e2etrain"))
    globals()["N_IMGS"] = N_IMGS
    import exp_host_pipeline
    exp_host_pipeline.N_IMGS = N_IMGS
    data_yaml = make_dataset(tmp)

    results = {}
    results["loader_img_s"] = round(loader_rate(data_yaml), 2)
    print(f"RESULT loader_img_s: {results['loader_img_s']}", flush=True)

    results.update(device_step_rates())

    for name, aug, host in (("e2e_host_aug", False, True),
                            ("e2e_device_aug", True, True),
                            ("e2e_ceiling_noaug_host", True, False)):
        r = run_trainer(data_yaml, aug, host_aug=host)
        results[name] = r
        print(f"RESULT {name}: {r['epoch_img_s']} (wall {r['wall_s']}s)",
              flush=True)

    Path("/tmp/tpu_queue").mkdir(exist_ok=True)
    Path("/tmp/tpu_queue/e2e_train.json").write_text(
        json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
