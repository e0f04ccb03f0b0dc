#!/usr/bin/env python
"""Attribute the train step's BACKWARD time per model segment.

The step decomposition (COMPONENTS.md) says value_and_grad is 157 ms of
the 166 ms step while the forward is 39 ms — the backward (~95 ms after
loss) dominates.  This script locates it: for each truncated prefix of
the flagship model (embed -> stage-1 pair -> backbone -> FPN+head ->
loss), jit `value_and_grad` of a scalar made ONLY of that prefix's
outputs (via save_extra + return_saved, so XLA dead-code-eliminates
everything after it, forward AND backward), with every grad leaf
reduced into the output so the backward can't be DCE'd either.

Per-segment fwd+bwd = delta between consecutive prefixes; bwd-only =
that minus the fwd-only prefix delta (also measured here).

Relay-safe protocol: distinct device inputs, pipelined dispatch, scalar
fetch barrier.  Usage: python scripts/exp_bwd_decomp.py [batch]
Writes /tmp/tpu_queue/bwd_decomp.json
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

# prefix name -> saved-layer indices whose outputs form the scalar
PREFIXES = {
    "embed": (1,),            # patch embed + pos
    "stage1": (2,),           # + ViL pair @ S6400
    "backbone": (9, 10, 11, 12),  # + stages 2-4 and SequenceToImage
    # "model": full one2many head output (no save_extra needed)
    # "loss": + assigner/E2E loss
}


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from xlstm_yolo_tpu.nn.tasks import build_detection_model
    from xlstm_yolo_tpu.utils.loss import e2e_detect_loss

    imgsz = 640
    save = sorted({i for v in PREFIXES.values() for i in v})
    model, _ = build_detection_model(
        CFG, training=True, compute_dtype=jnp.bfloat16,
        save_extra=save, return_saved=True)
    rng = jax.random.PRNGKey(0)
    img0 = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)
    variables = jax.jit(model.init)({"params": rng, "droppath": rng}, img0)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    def mk(key):
        img = jax.random.randint(key, (batch, imgsz, imgsz, 3), 0, 255, jnp.uint8)
        cls = jnp.zeros((batch, M), jnp.int32)
        bb = jnp.tile(jnp.asarray([100.0, 100.0, 300.0, 300.0]), (batch, M, 1))
        mask = jnp.ones((batch, M), bool).at[:, 8:].set(False)
        return {"img": img, "cls": cls, "bboxes": bb, "mask": mask}

    keys = jax.random.split(jax.random.PRNGKey(1), WARMUP + ITERS)
    batches = [mk(k) for k in keys]
    _ = np.asarray(batches[-1]["img"][0, 0, 0])

    def apply(p, img, key):
        x = img.astype(jnp.float32) / 255.0
        (out, saved), _ = model.apply(
            {"params": p, "batch_stats": batch_stats}, x,
            mutable=["batch_stats"], rngs={"droppath": key})
        return out, saved

    def prefix_scalar(p, img, key, idxs):
        _, saved = apply(p, img, key)
        return sum(saved[i].astype(jnp.float32).sum() for i in idxs)

    def model_scalar(p, img, key):
        out, _ = apply(p, img, key)
        return sum(f.astype(jnp.float32).sum() for f in out["one2many"])

    def loss_scalar(p, b, key):
        out, _ = apply(p, b["img"], key)
        strides = [imgsz / f.shape[1] for f in out["one2many"]]
        total, _ = e2e_detect_loss(out, b["cls"], b["bboxes"], b["mask"],
                                   strides, nc=80)
        return total

    def with_grads_alive(fn):
        def g(p, *a):
            val, grads = jax.value_and_grad(fn)(p, *a)
            return val + sum(jnp.sum(x.astype(jnp.float32))
                             for x in jax.tree.leaves(grads))
        return g

    results = {"batch": batch}

    def timeit(name, jitted, make_args):
        t0 = time.perf_counter()
        for i in range(WARMUP):
            r = jitted(*make_args(i))
            _ = float(np.asarray(r).ravel()[0])
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = None
        for i in range(ITERS):
            r = jitted(*make_args(WARMUP + i))
        _ = float(np.asarray(r).ravel()[0])
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        results[name] = round(ms, 2)
        print(f"RESULT {name}: {ms:.2f} ms (compile {comp:.0f}s)", flush=True)

    for name, idxs in PREFIXES.items():
        fwd = jax.jit(lambda p, img, key, ii=idxs: prefix_scalar(p, img, key, ii))
        timeit(f"fwd_{name}", fwd,
               lambda i: (params, batches[i]["img"], jax.random.fold_in(rng, i)))
        grad = jax.jit(with_grads_alive(
            lambda p, img, key, ii=idxs: prefix_scalar(p, img, key, ii)))
        timeit(f"grad_{name}", grad,
               lambda i: (params, batches[i]["img"], jax.random.fold_in(rng, i)))

    timeit("fwd_model", jax.jit(model_scalar),
           lambda i: (params, batches[i]["img"], jax.random.fold_in(rng, i)))
    timeit("grad_model", jax.jit(with_grads_alive(model_scalar)),
           lambda i: (params, batches[i]["img"], jax.random.fold_in(rng, i)))
    timeit("fwd_loss", jax.jit(loss_scalar),
           lambda i: (params, batches[i], jax.random.fold_in(rng, i)))
    timeit("grad_loss", jax.jit(with_grads_alive(loss_scalar)),
           lambda i: (params, batches[i], jax.random.fold_in(rng, i)))

    order = ["embed", "stage1", "backbone", "model", "loss"]
    seg = {}
    prev_f = prev_g = 0.0
    for name in order:
        f, g = results.get(f"fwd_{name}"), results.get(f"grad_{name}")
        if f is None or g is None:
            continue
        seg[name] = {
            "fwd_ms": round(f - prev_f, 2),
            "fwdbwd_ms": round(g - prev_g, 2),
            "bwd_ms": round((g - prev_g) - (f - prev_f), 2),
        }
        prev_f, prev_g = f, g
    results["segments"] = seg

    out = Path("/tmp/tpu_queue/bwd_decomp.json")
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
