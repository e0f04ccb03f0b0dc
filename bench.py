"""End-to-end inference benchmark on the flagship 640px ViL-YOLO model.

Measures images/sec/chip for the jitted predict program: on-device
uint8->float normalize, full backbone+FPN forward (bf16 compute), DFL
decode and NMS-free topk postprocess — i.e. everything after host JPEG
decode/letterbox.  Prints ONE JSON line for the driver.

No published reference numbers exist (BASELINE.md): vs_baseline is the
ratio against the round-1 recorded value in BENCH_BASELINE.json if
present, else 1.0.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parent
CFG = REPO / "xlstm_yolo_tpu" / "cfg" / "models" / "vil-det-192.yaml"
BATCH = 8
WARMUP = 3
ITERS = 20


def main():
    from xlstm_yolo_tpu.nn.tasks import build_detection_model

    model, _ = build_detection_model(CFG, compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    img_f = jnp.zeros((BATCH, 640, 640, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, img_f)

    @jax.jit
    def predict(variables, img_u8):
        x = img_u8.astype(jnp.float32) / 255.0
        y, _ = model.apply(variables, x)
        return y

    imgs = np.random.default_rng(0).integers(0, 255, (BATCH, 640, 640, 3), dtype=np.uint8)
    imgs = jnp.asarray(imgs)

    for _ in range(WARMUP):
        jax.block_until_ready(predict(variables, imgs))

    # block every iteration: the remote-TPU runtime otherwise overlaps or
    # dedups back-to-back identical dispatches and flatters the number
    t0 = time.perf_counter()
    for _ in range(ITERS):
        jax.block_until_ready(predict(variables, imgs))
    dt = time.perf_counter() - t0
    ips = BATCH * ITERS / dt

    base_file = REPO / "BENCH_BASELINE.json"
    vs = 1.0
    if base_file.exists():
        try:
            base = json.loads(base_file.read_text()).get("value", 0)
            if base:
                vs = round(ips / base, 4)
        except Exception:
            pass
    print(json.dumps({
        "metric": "e2e predict images/sec/chip @640px (batch8, bf16, on-device pre+post)",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": vs,
    }))


if __name__ == "__main__":
    main()
