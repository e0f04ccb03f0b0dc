#!/usr/bin/env python
"""TPU experiment: gather-free one-hot-matmul postprocess.

Usage: python scripts/exp_matmulpost.py {probe|micro|native|v2|v2b16}

Each step runs in its own process so a runtime wedge in one program
doesn't block the rest (docs/KNOWN_ISSUES.md: certain program shapes
fault the remote worker; recovery 5-15 min).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

CFG = REPO / "xlstm_yolo_tpu" / "cfg" / "models" / "vil-det-192.yaml"
WARMUP = 2
ITERS = 16
V2 = "chunkwise--pallas_xl_chunk_siging_v2"
NATIVE = "chunkwise--native_autograd"


def probe():
    x = jnp.ones((128, 128), jnp.bfloat16)
    y = np.asarray(jax.jit(lambda a: a @ a)(x))
    print("probe ok", float(y[0, 0]), flush=True)


def measure(predict, fused_vars, label, batch):
    @jax.jit
    def make_batch(key):
        return jax.random.randint(key, (batch, 640, 640, 3), 0, 255, jnp.uint8)

    keys = jax.random.split(jax.random.PRNGKey(1), WARMUP + ITERS)
    batches = [make_batch(k) for k in keys]
    _ = np.asarray(batches[-1][0, 0, 0])
    print(f"{label}: inputs ready, warming up (compile)...", flush=True)
    t0 = time.perf_counter()
    for i, b in enumerate(batches[:WARMUP]):
        np.asarray(jax.tree.leaves(predict(fused_vars, b))[0])
        print(f"{label}: warmup {i} done ({time.perf_counter() - t0:.1f}s)", flush=True)
    t0 = time.perf_counter()
    outs = [predict(fused_vars, b) for b in batches[WARMUP:]]
    _ = np.asarray(jax.tree.leaves(outs[-1])[0])
    dt = time.perf_counter() - t0
    ips = batch * ITERS / dt
    print(f"RESULT {label}: {ips:.1f} img/s ({dt / ITERS * 1e3:.1f} ms/batch)", flush=True)
    return ips


def micro():
    """Standalone matmul-postprocess microbench at head scale."""
    from xlstm_yolo_tpu.nn.head import topk_postprocess_matmul

    fn = jax.jit(lambda p: topk_postprocess_matmul(p, 300, 80))
    keys = jax.random.split(jax.random.PRNGKey(0), WARMUP + ITERS)
    batches = [jax.random.uniform(k, (8, 8400, 84), jnp.float32) for k in keys]
    _ = np.asarray(batches[-1][0, 0, 0])
    for b in batches[:WARMUP]:
        np.asarray(fn(b))
    t0 = time.perf_counter()
    outs = [fn(b) for b in batches[WARMUP:]]
    _ = np.asarray(outs[-1])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"RESULT micro: {dt * 1e3:.2f} ms/call (b8, A=8400, nc=80)", flush=True)


def fullmodel(kernel, batch):
    from xlstm_yolo_tpu.nn.tasks import build_detection_model
    from xlstm_yolo_tpu.utils.fuse import fuse_variables

    model_init, _ = build_detection_model(CFG, compute_dtype=jnp.bfloat16)
    variables = jax.jit(model_init.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3), jnp.float32)
    )
    fused_np = fuse_variables(jax.tree.map(np.asarray, variables))
    del variables
    model, _ = build_detection_model(
        CFG, compute_dtype=jnp.bfloat16, fused=True, chunkwise_kernel=kernel,
        sort_postprocess=True,
    )
    fused_vars = jax.tree.map(jnp.asarray, fused_np)

    @jax.jit
    def predict(v, img_u8):
        x = img_u8.astype(jnp.float32) / 255.0
        y, _ = model.apply(v, x)
        return y

    tag = "v2" if "pallas" in kernel else "native"
    measure(predict, fused_vars, f"{tag}-matmulpost-b{batch}", batch)


def scanmodel(kernel, batch=8, n_scan=16, outer=4):
    """lax.scan over n_scan batches inside ONE program: amortizes the
    relay's ~14 ms/program dispatch floor and measures true on-chip
    compute per batch."""
    from xlstm_yolo_tpu.nn.tasks import build_detection_model
    from xlstm_yolo_tpu.utils.fuse import fuse_variables

    model_init, _ = build_detection_model(CFG, compute_dtype=jnp.bfloat16)
    variables = jax.jit(model_init.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3), jnp.float32)
    )
    fused_np = fuse_variables(jax.tree.map(np.asarray, variables))
    del variables
    model, _ = build_detection_model(
        CFG, compute_dtype=jnp.bfloat16, fused=True, chunkwise_kernel=kernel,
        sort_postprocess=True,
    )
    fv = jax.tree.map(jnp.asarray, fused_np)

    @jax.jit
    def predict_many(v, imgs):  # (N, B, H, W, C) uint8
        def body(carry, img):
            x = img.astype(jnp.float32) / 255.0
            y, _ = model.apply(v, x)
            return carry, y
        _, ys = jax.lax.scan(body, None, imgs)
        return ys

    @jax.jit
    def make_stack(key):
        return jax.random.randint(
            key, (n_scan, batch, 640, 640, 3), 0, 255, jnp.uint8)

    keys = jax.random.split(jax.random.PRNGKey(2), 1 + outer)
    stacks = [make_stack(k) for k in keys]
    _ = np.asarray(stacks[-1][0, 0, 0, 0])
    tag = "v2" if "pallas" in kernel else "native"
    label = f"{tag}-scan{n_scan}-b{batch}"
    print(f"{label}: warming up (compile)...", flush=True)
    t0 = time.perf_counter()
    np.asarray(predict_many(fv, stacks[0])[-1])
    print(f"{label}: warmup done ({time.perf_counter() - t0:.1f}s)", flush=True)
    t0 = time.perf_counter()
    outs = [predict_many(fv, s) for s in stacks[1:]]
    _ = np.asarray(outs[-1][-1])
    dt = time.perf_counter() - t0
    n_img = batch * n_scan * outer
    print(f"RESULT {label}: {n_img / dt:.1f} img/s "
          f"({dt / (n_scan * outer) * 1e3:.2f} ms/batch true-compute)", flush=True)


def main():
    step = sys.argv[1]
    if step == "probe":
        probe()
    elif step == "micro":
        micro()
    elif step == "native":
        # native scan + matmul-post in one fused program (post is the only change)
        fullmodel(NATIVE, 8)
    elif step == "v2":
        fullmodel(V2, 8)
    elif step == "v2b16":
        fullmodel(V2, 16)
    elif step == "scan_native":
        scanmodel(NATIVE)
    elif step == "scan_v2":
        scanmodel(V2)
    else:
        raise SystemExit(f"unknown step {step}")


if __name__ == "__main__":
    main()
