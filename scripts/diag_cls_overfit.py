#!/usr/bin/env python
"""Diagnostic: overfit the tiny ViL classifier on 9 fixed synthetic
images with a direct jax loop (no trainer/augment).  If loss -> 0 the
model is fine and the convergence failure is in the trainer/data path.
"""
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
import cv2


def main():
    ds = Path("/tmp/diag_cls_ds")
    if not ds.exists():
        write_dataset(ds, n_per_class_train=3, n_per_class_val=1)
    imgs, labels = [], []
    for ci, c in enumerate(("circle", "square", "triangle")):
        for p in sorted((ds / "train" / c).glob("*.jpg")):
            imgs.append(cv2.imread(str(p))[..., ::-1] / 255.0)
            labels.append(ci)
    x = jnp.asarray(np.stack(imgs), jnp.float32)
    y = jnp.asarray(np.array(labels))
    print("batch", x.shape, y)

    from xlstm_yolo_tpu.nn.tasks import build_detection_model

    cfg = str(REPO / "xlstm_yolo_tpu/cfg/models/vil-cls-tiny.yaml")
    model, _ = build_detection_model(cfg, nc=3, training=True)
    params = model.init(jax.random.PRNGKey(0), x)
    tx = optax.adamw(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, x, y):
        def loss_fn(p):
            logits, _ = model.apply(
                p, x, rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"])
            if isinstance(logits, tuple):
                logits = logits[-1]
            l = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
            return l, logits
        (l, logits), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        gn = optax.global_norm(g)
        up, opt = tx.update(g, opt, params)
        params = optax.apply_updates(params, up)
        return params, opt, l, logits, gn

    for i in range(301):
        params, opt, l, logits, gn = step(params, opt, x, y)
        if i % 25 == 0:
            acc = (jnp.argmax(logits, -1) == y).mean()
            print(f"step {i:4d} loss {float(l):.4f} acc {float(acc):.3f} gnorm {float(gn):.3g}")


if __name__ == "__main__":
    main()
