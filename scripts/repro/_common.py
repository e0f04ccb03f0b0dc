"""Shared harness for the fault repros: run a predict program at batch 8
and report whether the worker survived."""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))


def run_predict(chunkwise_kernel: str, batch: int = 8, decode_only: bool = False,
                force_padded: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from xlstm_yolo_tpu.nn.tasks import build_detection_model

    print("probe:", float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum()))
    cfg = REPO / "xlstm_yolo_tpu" / "cfg" / "models" / "vil-det-192.yaml"
    model, _ = build_detection_model(cfg, compute_dtype=jnp.bfloat16,
                                     chunkwise_kernel=chunkwise_kernel,
                                     decode_only=decode_only)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((batch, 640, 640, 3), jnp.float32))

    @jax.jit
    def predict(v, img):
        y, _ = model.apply(v, img.astype(jnp.float32) / 255.0)
        return y

    img = jax.random.randint(jax.random.PRNGKey(1), (batch, 640, 640, 3), 0, 255, jnp.uint8)
    t0 = time.time()
    try:
        out = np.asarray(predict(variables, img))
        print(f"SURVIVED: out {out.shape} in {time.time()-t0:.0f}s")
        print("probe2:", float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum()))
        return True
    except Exception as e:  # noqa: BLE001
        print(f"FAULTED after {time.time()-t0:.0f}s: {str(e)[:200]}")
        return False
