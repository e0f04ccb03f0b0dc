#!/usr/bin/env python
"""Find the parameter leaves whose gradients go non-finite at the
reproducible NaN step (diag_e2e_nan: step 28, finite loss, nan update).

Replays the exact training prefix, then computes per-leaf grad norms +
non-finite counts for the culprit batch.

Usage: [XY_DIAG_TPU=1] python scripts/diag_grad_inspect.py [culprit_step]
"""

from __future__ import annotations

import functools
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import jax

if os.environ.get("XY_DIAG_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    culprit = int(sys.argv[1]) if len(sys.argv) > 1 else 28

    import tempfile

    import exp_host_pipeline
    from exp_host_pipeline import make_dataset

    from xlstm_yolo_tpu.cfg import get_cfg
    from xlstm_yolo_tpu.data.build import build_dataloader, build_yolo_dataset
    from xlstm_yolo_tpu.data.dataset import check_det_dataset
    from xlstm_yolo_tpu.engine import optimizers as opt_lib
    from xlstm_yolo_tpu.engine.steps import FlatTrainState, make_train_step
    from xlstm_yolo_tpu.nn.tasks import build_detection_model
    from xlstm_yolo_tpu.utils.loss import e2e_detect_loss

    exp_host_pipeline.N_IMGS = 240
    tmp = Path(tempfile.mkdtemp(prefix="gradinspect"))
    data_yaml = make_dataset(tmp)
    data = check_det_dataset(str(data_yaml))
    args = get_cfg(None, {"imgsz": 640, "task": "detect", "cache": "ram",
                          "mosaic": 1.0, "mixup": 0.0})
    ds = build_yolo_dataset(args, data["train"], 8, data, mode="train")
    loader = build_dataloader(ds, 8, workers=2, shuffle=True, seed=0)
    batches = []
    ep = 0
    while len(batches) <= culprit:
        for b in loader._iter_epoch(ep):
            batches.append(b)
            if len(batches) > culprit:
                break
        ep += 1

    CFG = REPO / "xlstm_yolo_tpu" / "cfg" / "models" / "vil-det-192.yaml"
    rng = jax.random.PRNGKey(0)
    model, _ = build_detection_model(CFG, training=True,
                                     compute_dtype=jnp.bfloat16)
    v = jax.jit(model.init)({"params": rng, "droppath": rng},
                            jnp.zeros((8, 640, 640, 3), jnp.float32))
    sched = opt_lib.linear_lr(0.01, 0.01, 3, 30)
    tx, lr0, name = opt_lib.build_flat_optimizer(
        v["params"], name="auto", lr=0.01, momentum=0.937,
        weight_decay=5e-4, schedule=sched, iterations=90,
        warmup_steps=100, warmup_momentum=0.8, warmup_bias_lr=0.1, nc=80)
    state = FlatTrainState.create(v, tx)
    step = jax.jit(make_train_step(model, tx, nc=80, accumulate=1))

    srng = jax.random.PRNGKey(8)
    sub = None
    for i in range(culprit):
        db = {k: jnp.asarray(np.asarray(batches[i][k]))
              for k in ("img", "cls", "bboxes", "mask")}
        srng, sub = jax.random.split(srng)
        state, m = step(state, db, sub)
    print(f"replayed {culprit} steps; loss at {culprit - 1}: "
          f"{float(m['loss']):.4f}", flush=True)
    srng, sub = jax.random.split(srng)

    params = state.params
    bstats = state.batch_stats
    db = {k: jnp.asarray(np.asarray(batches[culprit][k]))
          for k in ("img", "cls", "bboxes", "mask")}

    def loss_fn(p, batch, key, part="total"):
        img = batch["img"].astype(jnp.float32) / 255.0
        out, _ = model.apply({"params": p, "batch_stats": bstats}, img,
                             mutable=["batch_stats"],
                             rngs={"droppath": key})
        strides = [640 / f.shape[1] for f in out["one2many"]]
        total, parts = e2e_detect_loss(out, batch["cls"], batch["bboxes"],
                                       batch["mask"], strides, nc=80)
        if part != "total":
            total = getattr(parts, part)
        return total, parts  # steps.py returns total unscaled

    @functools.partial(jax.jit, static_argnums=(3,))
    def grad_report(p, batch, key, part="total"):
        (val, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, batch, key, part)
        norms = jax.tree.map(
            lambda g: jnp.linalg.norm(g.astype(jnp.float32)), grads)
        nbad = jax.tree.map(
            lambda g: jnp.sum(~jnp.isfinite(g.astype(jnp.float32))), grads)
        return val, parts, norms, nbad

    import re as _re
    for part in ("total", "box", "cls", "dfl"):
        val, parts, norms, nbad = grad_report(params, db, sub, part)
        npaths = jax.tree_util.tree_flatten_with_path(norms)[0]
        bpaths = jax.tree_util.tree_flatten_with_path(nbad)[0]
        agg = {}
        bad = []
        for (kp, n), (_, c) in zip(npaths, bpaths):
            n, c = float(n), int(c)
            key = jax.tree_util.keystr(kp)
            mod = (_re.match(r"\['(model_\d+)'\]", key) or [None, "other"])[1]
            tot_bad = agg.setdefault(mod, [0, 0])
            tot_bad[0] += 1
            if (not np.isfinite(n)) or c > 0:
                tot_bad[1] += 1
                bad.append((key, n, c))
        nb = sum(b for _, b in agg.values())
        print(f"== part={part} loss={float(val):.4f} bad_leaves={nb}",
              flush=True)
        bymod = {k: f"{b}/{t}" for k, (t, b) in sorted(
            agg.items(), key=lambda kv: int(kv[0].split('_')[1])
            if '_' in kv[0] else 99) if b}
        print(f"   bad-by-module: {bymod}", flush=True)
        for k, n, c in bad[:6]:
            print(f"   e.g. {k}: norm={n} nonfinite={c}", flush=True)


if __name__ == "__main__":
    main()
