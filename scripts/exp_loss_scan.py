#!/usr/bin/env python
"""SCAN-AMORTIZED E2E-loss attribution (fixes exp_loss_bench's protocol).

exp_loss_bench dispatches one program per iteration, so every row
carries the ~3.5 ms relay dispatch overhead — its micro numbers
(ciou 3.07, topk 2.36) sit near that floor and say nothing.  Here each
candidate runs as a lax.scan over N distinct inputs inside ONE program
(protocol of exp_bwd_blocks), so the per-iteration number is the real
in-program cost — directly comparable to exp_train_decomp's 22.6 ms
loss section.

Usage: python scripts/exp_loss_scan.py [step ...]
Writes /tmp/tpu_queue/loss_scan.json
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

N = 8
WARMUP = 1
B, M, nc, reg_max = 8, 32, 80, 16
NO = nc + 4 * reg_max
SHAPES = [(80, 80), (40, 40), (20, 20)]
STRIDES = [8.0, 16.0, 32.0]
A = sum(h * w for h, w in SHAPES)
f32 = jnp.float32
results = {}


def timeit_scan(name, fn, stacked):
    """fn(batch_slice) -> scalar; timed as lax.scan over N slices."""

    @jax.jit
    def scan_all(st):
        def body(c, x):
            return c + fn(x), None
        out, _ = jax.lax.scan(body, jnp.zeros([], f32), st)
        return out

    float(scan_all(stacked))  # compile+warm
    t0 = time.perf_counter()
    float(scan_all(stacked))
    ms = (time.perf_counter() - t0) / N * 1e3
    results[name] = round(ms, 3)
    print(f"RESULT {name}: {ms:.2f} ms", flush=True)
    out = Path("/tmp/tpu_queue/loss_scan.json")
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=1))


def main():
    from xlstm_yolo_tpu.utils.loss import (
        _bce_logits,
        _e2e_detect_loss_batched,
        e2e_detect_loss,
        v8_detection_loss,
    )
    from xlstm_yolo_tpu.utils.metrics import bbox_iou
    from xlstm_yolo_tpu.utils.tal import (
        make_anchors,
        task_aligned_assign,
        topk_select_mask,
    )
    from xlstm_yolo_tpu.nn.head import dfl_decode

    import os

    steps = sys.argv[1:] or ["e2e", "e2e_batched", "v8", "assigner", "decode",
                             "bce", "ciou_bma", "topk", "e2e_grad",
                             "e2e_batched_grad", "e2e_kernel",
                             "e2e_kernel_grad", "assigner_kernel"]

    ks = jax.random.split(jax.random.PRNGKey(0), N)

    def mk(key):
        kk = jax.random.split(key, 8)
        feats_m = [jax.random.normal(kk[i], (B, h, w, NO), f32)
                   for i, (h, w) in enumerate(SHAPES)]
        feats_o = [jax.random.normal(kk[3 + i], (B, h, w, NO), f32)
                   for i, (h, w) in enumerate(SHAPES)]
        cls = jax.random.randint(kk[6], (B, M), 0, nc)
        xy = jax.random.uniform(kk[7], (B, M, 2), f32, 50, 500)
        wh = jax.random.uniform(kk[7], (B, M, 2), f32, 40, 140)
        bb = jnp.concatenate([xy, xy + wh], -1)
        mask = jnp.ones((B, M), bool).at[:, 12:].set(False)
        return {"m0": feats_m[0], "m1": feats_m[1], "m2": feats_m[2],
                "o0": feats_o[0], "o1": feats_o[1], "o2": feats_o[2],
                "cls": cls, "bb": bb, "mask": mask}

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *[mk(k) for k in ks])
    _ = np.asarray(stacked["cls"][0, 0, 0])

    def preds_of(b):
        return {"one2many": [b["m0"], b["m1"], b["m2"]],
                "one2one": [b["o0"], b["o1"], b["o2"]]}

    anchor_points, stride_t = make_anchors(SHAPES, STRIDES, 0.5)

    if "e2e" in steps:
        timeit_scan("e2e_twopass", lambda b: e2e_detect_loss(
            preds_of(b), b["cls"], b["bb"], b["mask"], STRIDES, nc=nc)[0],
            stacked)
    if "e2e_batched" in steps:
        timeit_scan("e2e_batched", lambda b: _e2e_detect_loss_batched(
            preds_of(b), b["cls"], b["bb"], b["mask"], STRIDES, nc=nc)[0],
            stacked)
    if "v8" in steps:
        timeit_scan("v8_topk10", lambda b: v8_detection_loss(
            preds_of(b)["one2many"], b["cls"], b["bb"], b["mask"], STRIDES,
            nc=nc, tal_topk=10)[0], stacked)

    def flat_of(b):
        return jnp.concatenate(
            [b[k].reshape(B, -1, NO) for k in ("m0", "m1", "m2")], 1)

    if "assigner" in steps:
        def assigner(b):
            fl = flat_of(b)
            scores = jax.nn.sigmoid(fl[..., 4 * reg_max:])
            boxes = jnp.abs(fl[..., :4]) * 100.0
            r = task_aligned_assign(scores, boxes, anchor_points * stride_t,
                                    b["cls"], b["bb"], b["mask"],
                                    topk=10, num_classes=nc)
            return r.target_scores.sum()
        timeit_scan("assigner", assigner, stacked)

    if "decode" in steps:
        def decode(b):
            fl = flat_of(b)
            d = dfl_decode(fl[..., : 4 * reg_max], reg_max)
            return d.sum()
        timeit_scan("concat_dfl_decode", decode, stacked)

    if "bce" in steps:
        def bce(b):
            fl = flat_of(b)
            t = jax.nn.sigmoid(fl[..., 4 * reg_max:][..., ::-1])
            return _bce_logits(fl[..., 4 * reg_max:], t).sum()
        timeit_scan("bce_full", bce, stacked)

    if "ciou_bma" in steps:
        def ciou(b):
            fl = flat_of(b)
            boxes = jnp.abs(fl[..., :4]) * 100.0
            i = bbox_iou(b["bb"][:, :, None, :], boxes[:, None, :, :],
                         xywh=False, kind="ciou")
            return i.sum()
        timeit_scan("ciou_BMA", ciou, stacked)

    if "topk" in steps:
        def topk(b):
            fl = flat_of(b)
            s = jax.nn.sigmoid(fl[..., 4 * reg_max:])
            metric = s.max(-1)[:, None, :] * jnp.ones((1, M, 1), f32)
            return topk_select_mask(metric, 10).sum()
        timeit_scan("topk_iter", topk, stacked)

    if "e2e_grad" in steps:
        g = jax.grad(lambda p, b: e2e_detect_loss(
            p, b["cls"], b["bb"], b["mask"], STRIDES, nc=nc)[0])

        def egrad(b):
            gr = g(preds_of(b), b)
            return sum(x.sum() for v in gr.values() for x in v)
        timeit_scan("e2e_twopass_grad", egrad, stacked)
    if "e2e_batched_grad" in steps:
        gb = jax.grad(lambda p, b: _e2e_detect_loss_batched(
            p, b["cls"], b["bb"], b["mask"], STRIDES, nc=nc)[0])

        def ebgrad(b):
            gr = gb(preds_of(b), b)
            return sum(x.sum() for v in gr.values() for x in v)
        timeit_scan("e2e_batched_grad", ebgrad, stacked)

    # ---- fused Pallas TAL-metric kernel variants ----
    # HISTORICAL (r3/r4): XY_TAL_KERNEL was removed from task_aligned_assign
    # after the r5 full-train-step A/B measured flat (scripts/exp_tal_ab.py,
    # docs/KERNEL_PLATEAU.md) — these steps now time the jnp path twice.
    # Use utils/tal.task_aligned_assign_pallas_metric for kernel timings.
    if "e2e_kernel" in steps:
        os.environ["XY_TAL_KERNEL"] = "1"
        timeit_scan("e2e_twopass_kernel", lambda b: e2e_detect_loss(
            preds_of(b), b["cls"], b["bb"], b["mask"], STRIDES, nc=nc)[0],
            stacked)
        os.environ["XY_TAL_KERNEL"] = "0"
    if "e2e_kernel_grad" in steps:
        os.environ["XY_TAL_KERNEL"] = "1"
        gk = jax.grad(lambda p, b: e2e_detect_loss(
            p, b["cls"], b["bb"], b["mask"], STRIDES, nc=nc)[0])

        def ekgrad(b):
            gr = gk(preds_of(b), b)
            return sum(x.sum() for v in gr.values() for x in v)
        timeit_scan("e2e_twopass_kernel_grad", ekgrad, stacked)
        os.environ["XY_TAL_KERNEL"] = "0"
    if "assigner_kernel" in steps:
        os.environ["XY_TAL_KERNEL"] = "1"

        def assigner_k(b):
            fl = flat_of(b)
            scores = jax.nn.sigmoid(fl[..., 4 * reg_max:])
            boxes = jnp.abs(fl[..., :4]) * 100.0
            r = task_aligned_assign(scores, boxes, anchor_points * stride_t,
                                    b["cls"], b["bb"], b["mask"],
                                    topk=10, num_classes=nc)
            return r.target_scores.sum()
        timeit_scan("assigner_kernel", assigner_k, stacked)
        os.environ["XY_TAL_KERNEL"] = "0"

    # value cross-check: kernel path == jnp path on one batch
    if "e2e" in steps and "e2e_kernel" in steps:
        b0 = jax.tree.map(lambda x: x[0], stacked)
        os.environ["XY_TAL_KERNEL"] = "0"
        v0 = float(jax.jit(lambda b: e2e_detect_loss(
            preds_of(b), b["cls"], b["bb"], b["mask"], STRIDES, nc=nc)[0])(b0))
        os.environ["XY_TAL_KERNEL"] = "1"
        v1 = float(jax.jit(lambda b: e2e_detect_loss(
            preds_of(b), b["cls"], b["bb"], b["mask"], STRIDES, nc=nc)[0])(b0))
        os.environ["XY_TAL_KERNEL"] = "0"
        results["loss_jnp_vs_kernel"] = [round(v0, 6), round(v1, 6)]
        print(f"loss cross-check: jnp {v0:.6f} vs kernel {v1:.6f}", flush=True)
        assert abs(v0 - v1) < 1e-3 * max(1.0, abs(v0)), (v0, v1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
