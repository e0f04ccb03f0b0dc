#!/usr/bin/env python
"""Bisect the classify convergence stall: drive the trainer's OWN
make_train_step + ClassificationDataset + DataLoader with plain AdamW.
Flags peel components away: --noaug, --directloss.
"""
import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from scripts.convergence_cls import write_dataset


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--noaug", action="store_true")
    ap.add_argument("--directloss", action="store_true")
    ap.add_argument("--epochs", type=int, default=20)
    args = ap.parse_args()

    ds_root = Path("/tmp/convergence_cls_ds")
    if not (ds_root / "train").exists():
        write_dataset(ds_root)

    from types import SimpleNamespace

    from xlstm_yolo_tpu.data.build import DataLoader
    from xlstm_yolo_tpu.data.dataset import ClassificationDataset
    from xlstm_yolo_tpu.engine.steps import TrainState, make_train_step
    from xlstm_yolo_tpu.nn.tasks import build_detection_model

    hyp = SimpleNamespace(scale=0.2, fliplr=0.5, flipud=0.0,
                          hsv_h=0.015, hsv_s=0.4, hsv_v=0.4, erasing=0.0)
    ds = ClassificationDataset(str(ds_root / "train"), imgsz=160,
                               augment=not args.noaug, hyp=hyp)
    loader = DataLoader(ds, batch_size=8, shuffle=True, workers=2, seed=0)

    cfg = str(REPO / "xlstm_yolo_tpu/cfg/models/vil-cls-tiny.yaml")
    model_t, _ = build_detection_model(cfg, nc=3, training=True)
    rng = jax.random.PRNGKey(0)
    init_img = jnp.zeros((1, 160, 160, 3), jnp.float32)
    variables = jax.jit(model_t.init)({"params": rng, "droppath": rng}, init_img)

    tx = optax.adamw(1e-3)
    state = TrainState.create(variables, tx)
    step = jax.jit(make_train_step(model_t, tx, nc=3, task="classify"))

    if args.directloss:
        opt = tx.init(variables["params"])

        @jax.jit
        def dstep(params, bstats, opt, x, y):
            def loss_fn(p):
                out, mut = model_t.apply(
                    {"params": p, "batch_stats": bstats}, x,
                    mutable=["batch_stats"], rngs={"droppath": jax.random.PRNGKey(2)})
                if isinstance(out, tuple):
                    out = out[-1]
                return optax.softmax_cross_entropy_with_integer_labels(
                    out.astype(jnp.float32), y).mean(), mut
            (l, mut), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            up, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, up), mut["batch_stats"], opt, l

        params, bstats = variables["params"], variables.get("batch_stats", {})
        for ep in range(args.epochs):
            ls = []
            for b in loader._iter_epoch(ep):
                x = jnp.asarray(b["img"]).astype(jnp.float32) / 255.0
                y = jnp.asarray(b["cls"])
                params, bstats, opt, l = dstep(params, bstats, opt, x, y)
                ls.append(float(l))
            print(f"ep {ep:3d} loss {np.mean(ls):.4f}")
        return

    srng = jax.random.PRNGKey(1)
    for ep in range(args.epochs):
        ls = []
        for b in loader._iter_epoch(ep):
            srng, sub = jax.random.split(srng)
            dev = {"img": jnp.asarray(b["img"]), "cls": jnp.asarray(b["cls"])}
            state, m = step(state, dev, sub)
            ls.append(float(m["loss"]))
        print(f"ep {ep:3d} loss {np.mean(ls):.4f}")


if __name__ == "__main__":
    main()
