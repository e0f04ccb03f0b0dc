#!/usr/bin/env python
"""Decompose the flagship train step's 165 ms/step (VERDICT r2 item 5 depth).

Times, at batch 8 / 640px / v2 Pallas kernels / E2E loss, each with the
relay-safe protocol (distinct device inputs, pipelined, small fetch):

  fwd        training-graph forward only (feats reduced to a scalar)
  loss_feats assigner + E2E loss on precomputed feats (loss w/o model)
  fwd_loss   forward + loss (value only, no grad)
  grad       value_and_grad
  grad_opt   grad + AdEMAMix update
  full       the shipped train step (grad + opt + EMA)

Deltas attribute the step: bwd = grad - fwd_loss, opt = grad_opt - grad,
ema = full - grad_opt, loss+assigner = loss_feats (direct).

Usage: python scripts/exp_train_decomp.py [batch] [tiny]
(``tiny`` = vil-det-tiny @160px on CPU — harness smoke test only)
Writes /tmp/tpu_queue/train_decomp.json
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

CFG = REPO / "xlstm_yolo_tpu" / "cfg" / "models" / "vil-det-192.yaml"
WARMUP, ITERS = 2, 8
M = 32


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    tiny = len(sys.argv) > 2 and sys.argv[2] == "tiny"
    cfg, imgsz = (CFG, 640)
    if tiny:
        jax.config.update("jax_platforms", "cpu")
        cfg = CFG.parent / "vil-det-tiny.yaml"
        imgsz = 160

    from xlstm_yolo_tpu.engine.optimizers import ademamix, ema_init, ema_update
    from xlstm_yolo_tpu.engine.steps import TrainState, make_train_step
    from xlstm_yolo_tpu.nn.tasks import build_detection_model
    from xlstm_yolo_tpu.utils.loss import e2e_detect_loss

    model, _ = build_detection_model(
        cfg, training=True, compute_dtype=jnp.bfloat16,
        chunkwise_kernel="auto" if tiny else "chunkwise--pallas_xl_chunk_siging_v2")
    img0 = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)({"params": rng, "droppath": rng}, img0)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    tx = ademamix(3e-4)

    def mk(key):
        img = jax.random.randint(key, (batch, imgsz, imgsz, 3), 0, 255, jnp.uint8)
        cls = jnp.zeros((batch, M), jnp.int32)
        bb = jnp.tile(jnp.asarray([100.0, 100.0, 300.0, 300.0]), (batch, M, 1))
        mask = jnp.ones((batch, M), bool).at[:, 8:].set(False)
        return {"img": img, "cls": cls, "bboxes": bb, "mask": mask}

    keys = jax.random.split(jax.random.PRNGKey(1), WARMUP + ITERS)
    batches = [mk(k) for k in keys]
    _ = np.asarray(batches[-1]["img"][0, 0, 0])

    def fwd_apply(p, bs, img, key):
        x = img.astype(jnp.float32) / 255.0
        out, _ = model.apply({"params": p, "batch_stats": bs}, x,
                             mutable=["batch_stats"], rngs={"droppath": key})
        feats = out["one2many"]
        return feats, out

    def loss_from_out(out, b):
        feats = out["one2many"]
        strides = [imgsz / f.shape[1] for f in feats]
        total, _ = e2e_detect_loss(out, b["cls"], b["bboxes"], b["mask"],
                                   strides, nc=80)
        return total

    def loss_fn(p, bs, b, key):
        _, out = fwd_apply(p, bs, b["img"], key)
        return loss_from_out(out, b)

    import os

    only = set(filter(None, os.environ.get("DECOMP_ONLY", "").split(",")))
    results = {}

    def timeit(name, fn, inputs):
        if only and name not in only:
            return
        t0 = time.perf_counter()
        for i, x in enumerate(inputs[:WARMUP]):
            r = fn(x, i)
            _ = float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
        print(f"{name}: compiled+warm ({time.perf_counter() - t0:.1f}s)",
              flush=True)
        t0 = time.perf_counter()
        r = None
        for i, x in enumerate(inputs[WARMUP:]):
            r = fn(x, 100 + i)
        _ = float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        results[name] = round(ms, 2)
        print(f"RESULT {name}: {ms:.1f} ms", flush=True)

    # 1. forward only
    fwd_jit = jax.jit(lambda p, bs, img, key:
                      jax.tree.map(lambda f: f.sum(), fwd_apply(p, bs, img, key)[0]))
    timeit("fwd", lambda b, i: fwd_jit(params, batch_stats, b["img"],
                                       jax.random.fold_in(rng, i)), batches)

    # 2. loss+assigner on precomputed head output (device-resident)
    if not only or "loss_feats" in only:
        _, out0 = jax.jit(fwd_apply)(params, batch_stats, batches[0]["img"],
                                     jax.random.fold_in(rng, 0))
        out0 = jax.tree.map(jnp.asarray, out0)
        loss_jit = jax.jit(loss_from_out)
        timeit("loss_feats", lambda b, i: loss_jit(out0, b), batches)

    # 3. forward + loss (value only)
    fl_jit = jax.jit(loss_fn)
    timeit("fwd_loss", lambda b, i: fl_jit(params, batch_stats, b,
                                           jax.random.fold_in(rng, i)), batches)

    # 4. value_and_grad — reduce every grad leaf into the output so XLA
    # cannot dead-code-eliminate the backward pass
    def grad_alive(p, bs, b, key):
        loss, grads = jax.value_and_grad(loss_fn)(p, bs, b, key)
        gsum = sum(jnp.sum(g.astype(jnp.float32)) for g in jax.tree.leaves(grads))
        return loss, gsum

    g_jit = jax.jit(grad_alive)
    timeit("grad", lambda b, i: g_jit(params, batch_stats, b,
                                      jax.random.fold_in(rng, i)), batches)

    # 5. grad + optimizer update
    opt_state0 = tx.init(params)

    def grad_opt(p, os_, bs, b, key):
        import optax

        loss, grads = jax.value_and_grad(loss_fn)(p, bs, b, key)
        updates, new_os = tx.update(grads, os_, p)
        new_p = optax.apply_updates(p, updates)
        return loss, jax.tree.leaves(new_p)[0].sum(), new_os

    go_jit = jax.jit(grad_opt)
    timeit("grad_opt", lambda b, i: go_jit(params, opt_state0, batch_stats, b,
                                           jax.random.fold_in(rng, i)), batches)

    # 6. full shipped step
    step = jax.jit(make_train_step(model, tx, nc=80, end2end=True))
    state = TrainState.create(variables, tx)

    def full(b, i):
        nonlocal state
        state, items = step(state, b, jax.random.fold_in(rng, i))
        return items["loss"]

    timeit("full", full, batches)

    if not only:
        results["derived"] = {
            "bwd_ms": round(results["grad"] - results["fwd_loss"], 2),
            "opt_ms": round(results["grad_opt"] - results["grad"], 2),
            "ema_ms": round(results["full"] - results["grad_opt"], 2),
            "loss_assigner_ms": results["loss_feats"],
            "model_fwd_ms": results["fwd"],
        }
    out = Path("/tmp/tpu_queue/train_decomp%s.json" % ("_partial" if only else ""))
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps({"batch": batch, **results}, indent=1))
    print(json.dumps({"batch": batch, **results}))


if __name__ == "__main__":
    main()
