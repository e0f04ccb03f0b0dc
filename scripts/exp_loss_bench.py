#!/usr/bin/env python
"""Attribute the E2E loss+assigner's TPU cost (train_decomp: 27.8 ms @ b8).

Times, on flagship shapes (B8, A8400, nc80, M32, reg_max 16):
  e2e_loss     the full E2E loss on synthetic head output (current code)
  v8_topk10    one v8_detection_loss pass
  assigner     task_aligned_assign alone (topk 10)
  topk_sort    lax.top_k((B, M, A), 10) — the old selection
  topk_iter    topk_select_mask((B, M, A), 10) — the new selection
  ciou         CIoU((B, M, A)) alone

Usage: python scripts/exp_loss_bench.py
Writes /tmp/tpu_queue/loss_bench.json
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

WARMUP, ITERS = 2, 16
B, M, nc, reg_max = 8, 32, 80, 16
NO = nc + 4 * reg_max
SHAPES = [(80, 80), (40, 40), (20, 20)]
STRIDES = [8.0, 16.0, 32.0]
A = sum(h * w for h, w in SHAPES)


def main():
    from xlstm_yolo_tpu.utils.loss import e2e_detect_loss, v8_detection_loss
    from xlstm_yolo_tpu.utils.metrics import bbox_iou
    from xlstm_yolo_tpu.utils.tal import (
        make_anchors,
        task_aligned_assign,
        topk_select_mask,
    )

    def mk(key):
        ks = jax.random.split(key, 8)
        feats_m = [jax.random.normal(ks[i], (B, h, w, NO), jnp.float32)
                   for i, (h, w) in enumerate(SHAPES)]
        feats_o = [jax.random.normal(ks[3 + i], (B, h, w, NO), jnp.float32)
                   for i, (h, w) in enumerate(SHAPES)]
        cls = jax.random.randint(ks[6], (B, M), 0, nc)
        xy = jax.random.uniform(ks[7], (B, M, 2), jnp.float32, 50, 500)
        wh = jax.random.uniform(ks[7], (B, M, 2), jnp.float32, 40, 140)
        bb = jnp.concatenate([xy, xy + wh], -1)
        mask = jnp.ones((B, M), bool).at[:, 12:].set(False)
        return {"out": {"one2many": feats_m, "one2one": feats_o},
                "cls": cls, "bboxes": bb, "mask": mask}

    keys = jax.random.split(jax.random.PRNGKey(0), WARMUP + ITERS)
    batches = [mk(k) for k in keys]
    _ = np.asarray(batches[-1]["cls"][0, 0])

    results = {}

    def timeit(name, fn):
        for i in range(WARMUP):
            r = fn(batches[i])
            _ = float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
        t0 = time.perf_counter()
        r = None
        for i in range(ITERS):
            r = fn(batches[WARMUP + i])
        _ = float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        results[name] = round(ms, 2)
        print(f"RESULT {name}: {ms:.2f} ms", flush=True)

    e2e = jax.jit(lambda b: e2e_detect_loss(
        b["out"], b["cls"], b["bboxes"], b["mask"], STRIDES, nc=nc)[0])
    timeit("e2e_loss", e2e)

    from xlstm_yolo_tpu.utils.loss import _e2e_detect_loss_batched

    e2e_b = jax.jit(lambda b: _e2e_detect_loss_batched(
        b["out"], b["cls"], b["bboxes"], b["mask"], STRIDES, nc=nc)[0])
    timeit("e2e_batched", e2e_b)

    # grad-through versions (the train step differentiates the loss wrt
    # the feature maps — backward fusion count matters too)
    e2e_g = jax.jit(jax.grad(lambda o, b: e2e_detect_loss(
        o, b["cls"], b["bboxes"], b["mask"], STRIDES, nc=nc)[0]))
    timeit("e2e_loss_grad", lambda b: e2e_g(b["out"], b))
    e2e_bg = jax.jit(jax.grad(lambda o, b: _e2e_detect_loss_batched(
        o, b["cls"], b["bboxes"], b["mask"], STRIDES, nc=nc)[0]))
    timeit("e2e_batched_grad", lambda b: e2e_bg(b["out"], b))

    v8 = jax.jit(lambda b: v8_detection_loss(
        b["out"]["one2many"], b["cls"], b["bboxes"], b["mask"], STRIDES,
        nc=nc, tal_topk=10)[0])
    timeit("v8_topk10", v8)

    anchor_points, stride_t = make_anchors(SHAPES, STRIDES, 0.5)

    def assigner(b):
        scores = jax.nn.sigmoid(
            jnp.concatenate([f.reshape(B, -1, NO)[..., 4 * reg_max:]
                             for f in b["out"]["one2many"]], 1))
        boxes = jnp.concatenate(
            [f.reshape(B, -1, NO)[..., :4] for f in b["out"]["one2many"]], 1)
        boxes = jnp.abs(boxes) * 100.0  # plausible xyxy-ish spread
        r = task_aligned_assign(scores, boxes, anchor_points * stride_t,
                                b["cls"], b["bboxes"], b["mask"],
                                topk=10, num_classes=nc)
        return r.target_scores.sum()

    timeit("assigner", jax.jit(assigner))

    def metric_of(b):
        s = jax.nn.sigmoid(
            jnp.concatenate([f.reshape(B, -1, NO)[..., 4 * reg_max:]
                             for f in b["out"]["one2many"]], 1))
        return s.max(-1)[:, None, :] * jnp.ones((1, M, 1), jnp.float32)

    timeit("topk_sort", jax.jit(
        lambda b: jax.lax.top_k(metric_of(b), 10)[1].sum()))
    timeit("topk_iter", jax.jit(
        lambda b: topk_select_mask(metric_of(b), 10).sum()))

    def ciou(b):
        boxes = jnp.concatenate(
            [f.reshape(B, -1, NO)[..., :4] for f in b["out"]["one2many"]], 1)
        boxes = jnp.abs(boxes) * 100.0
        i = bbox_iou(b["bboxes"][:, :, None, :], boxes[:, None, :, :],
                     xywh=False, kind="ciou")
        return i.sum()

    timeit("ciou", jax.jit(ciou))

    out = Path("/tmp/tpu_queue/loss_bench.json")
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
