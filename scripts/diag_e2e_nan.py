#!/usr/bin/env python
"""Per-step loss with the REAL trainer config on real loader batches,
fused paths on/off — isolates the r5 e2e NaN (CPU, no TPU risk).

Usage: python scripts/diag_e2e_nan.py [epi] [ffn] [steps]
  epi/ffn: 1/0 toggles for the fused epilogue / fused FFN backward.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import os

import jax

if os.environ.get("XY_DIAG_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    epi = bool(int(sys.argv[1])) if len(sys.argv) > 1 else True
    ffn = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from xlstm_yolo_tpu.nn import layers as L

    L.EPI_FUSE = epi
    L.FFN_FUSE = ffn
    print(f"EPI_FUSE={epi} FFN_FUSE={ffn}")

    import tempfile

    from exp_host_pipeline import make_dataset

    from xlstm_yolo_tpu.cfg import get_cfg
    from xlstm_yolo_tpu.data.build import build_dataloader, build_yolo_dataset
    from xlstm_yolo_tpu.data.dataset import check_det_dataset
    from xlstm_yolo_tpu.engine import optimizers as opt_lib
    from xlstm_yolo_tpu.engine.steps import FlatTrainState, make_train_step
    from xlstm_yolo_tpu.nn.tasks import build_detection_model

    tmp = Path(tempfile.mkdtemp(prefix="nandiag"))
    import exp_host_pipeline
    exp_host_pipeline.N_IMGS = 240
    data_yaml = make_dataset(tmp)
    data = check_det_dataset(str(data_yaml))
    args = get_cfg(None, {"imgsz": 640, "task": "detect", "cache": "ram",
                          "mosaic": 1.0, "mixup": 0.0})
    ds = build_yolo_dataset(args, data["train"], 8, data, mode="train")
    loader = build_dataloader(ds, 8, workers=2, shuffle=True, seed=0)
    batches = []
    ep = 0
    while len(batches) < steps:
        for b in loader._iter_epoch(ep):
            batches.append(b)
            if len(batches) >= steps:
                break
        ep += 1

    CFG = REPO / "xlstm_yolo_tpu" / "cfg" / "models" / "vil-det-192.yaml"
    rng = jax.random.PRNGKey(0)
    model_tr, _ = build_detection_model(CFG, training=True,
                                        compute_dtype=jnp.bfloat16)
    v = jax.jit(model_tr.init)(
        {"params": rng, "droppath": rng},
        jnp.zeros((8, 640, 640, 3), jnp.float32))
    # the trainer's EXACT optimizer config for the e2e repro (epochs=3,
    # 30 steps/epoch, nbs=batch -> accumulate=1)
    sched = opt_lib.linear_lr(0.01, 0.01, 3, 30)
    tx, lr0, name = opt_lib.build_flat_optimizer(
        v["params"], name="auto", lr=0.01, momentum=0.937,
        weight_decay=5e-4, schedule=sched, iterations=90,
        warmup_steps=100, warmup_momentum=0.8, warmup_bias_lr=0.1, nc=80)
    print(f"optimizer: {name} lr0={lr0}")
    state = FlatTrainState.create(v, tx)
    step = jax.jit(make_train_step(model_tr, tx, nc=80, accumulate=1))
    srng = jax.random.PRNGKey(8)
    for i, hb in enumerate(batches):
        db = {k: jnp.asarray(np.asarray(hb[k]))
              for k in ("img", "cls", "bboxes", "mask")}
        srng, sub = jax.random.split(srng)
        state, m = step(state, db, sub)
        vals = {k: float(m[k]) for k in m}
        pnorm = float(jnp.linalg.norm(state.flat_params))
        enorm = float(jnp.linalg.norm(state.ema_flat))
        print(f"step {i}: "
              + " ".join(f"{k}={v:.4f}" for k, v in vals.items())
              + f" |p|={pnorm:.4f} |ema|={enorm:.4f}", flush=True)
        if not np.isfinite(vals.get("loss", 0.0)):
            print(f"NONFINITE at step {i}", flush=True)
            np.save("/tmp/tpu_queue/nan_step_batch.npy",
                    {k: np.asarray(hb[k]) for k in db}, allow_pickle=True)
            break


if __name__ == "__main__":
    main()
