#!/usr/bin/env python
"""Fused-predict throughput at a given batch size (fault-probe protocol).

Round-2 found single-program batch-16 eval faulted the TPU runtime with
the top-k *gather* postprocess (docs/KNOWN_ISSUES.md update 4: "the
fingerprint is the gather"). The default postprocess is now gather-free
(one-hot matmul / sort-based), so larger fused batches may be back on
the table — dispatch amortization is worth ~1.5-3 ms/batch on this
relay. Run ONE batch size per invocation, probe first, and leave the
worker health verdict on stdout.

Usage: python scripts/exp_predict_batch.py [batch] [iters]
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

CFG = REPO / "xlstm_yolo_tpu" / "cfg" / "models" / "vil-det-192.yaml"


def probe(timeout_s: int = 240) -> bool:
    code = ("import jax.numpy as jnp; "
            "assert float((jnp.ones((8,8))@jnp.ones((8,8))).sum())==512.0")
    try:
        return subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                              capture_output=True).returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    if not probe():
        print("worker unhealthy before experiment; aborting")
        return 1

    import jax
    import jax.numpy as jnp
    import numpy as np

    from xlstm_yolo_tpu.nn.tasks import build_detection_model

    model, _ = build_detection_model(CFG, compute_dtype=jnp.bfloat16, fused=True)
    img0 = jnp.zeros((batch, 640, 640, 3), jnp.float32)
    fused_vars = jax.jit(model.init)(jax.random.PRNGKey(0), img0)

    @jax.jit
    def predict(variables, img_u8):
        x = img_u8.astype(jnp.float32) / 255.0
        y, _ = model.apply(variables, x)
        return y

    @jax.jit
    def make_batch(key):
        return jax.random.randint(key, (batch, 640, 640, 3), 0, 255, jnp.uint8)

    warm = 2
    keys = jax.random.split(jax.random.PRNGKey(1), warm + iters)
    batches = [make_batch(k) for k in keys]
    _ = np.asarray(batches[-1][0, 0, 0])

    print(f"[b{batch}] compiling + warmup ...", flush=True)
    for b in batches[:warm]:
        np.asarray(predict(fused_vars, b))  # host fetch = true sync
    print(f"[b{batch}] warmup survived", flush=True)

    t0 = time.perf_counter()
    outs = [predict(fused_vars, b) for b in batches[warm:]]
    _ = np.asarray(outs[-1])
    dt = time.perf_counter() - t0
    ips = batch * iters / dt
    print(f"[b{batch}] {ips:.2f} img/s  ({dt / iters * 1e3:.1f} ms/batch)")
    return 0


if __name__ == "__main__":
    rc = main()
    # advisory only: while THIS process still holds the relay client, a
    # subprocess probe can serialize behind it and time out even though
    # the worker is fine (observed 2026-08-18) — re-probe from a clean
    # shell before trusting a False here.
    print(f"post-probe worker healthy (advisory): {probe()}")
    raise SystemExit(rc)
