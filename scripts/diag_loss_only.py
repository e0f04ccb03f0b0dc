#!/usr/bin/env python
"""Loss-only scan over many real loader batches at FIXED params —
isolates whether a single degenerate mosaic batch NaNs the loss
(which then NaNs params via one update and every later step).

Usage: [XY_DIAG_TPU=1] python scripts/diag_loss_only.py [n_batches]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import jax

if os.environ.get("XY_DIAG_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 40

    import tempfile

    import exp_host_pipeline
    from exp_host_pipeline import make_dataset

    from xlstm_yolo_tpu.cfg import get_cfg
    from xlstm_yolo_tpu.data.build import build_dataloader, build_yolo_dataset
    from xlstm_yolo_tpu.data.dataset import check_det_dataset
    from xlstm_yolo_tpu.nn.tasks import build_detection_model
    from xlstm_yolo_tpu.utils.loss import e2e_detect_loss

    exp_host_pipeline.N_IMGS = 240
    tmp = Path(tempfile.mkdtemp(prefix="lossscan"))
    data_yaml = make_dataset(tmp)
    data = check_det_dataset(str(data_yaml))
    args = get_cfg(None, {"imgsz": 640, "task": "detect", "cache": "ram",
                          "mosaic": 1.0, "mixup": 0.0})
    ds = build_yolo_dataset(args, data["train"], 8, data, mode="train")
    loader = build_dataloader(ds, 8, workers=4, shuffle=True, seed=0)

    CFG = REPO / "xlstm_yolo_tpu" / "cfg" / "models" / "vil-det-192.yaml"
    rng = jax.random.PRNGKey(0)
    model, _ = build_detection_model(CFG, training=True,
                                     compute_dtype=jnp.bfloat16)
    v = jax.jit(model.init)({"params": rng, "droppath": rng},
                            jnp.zeros((8, 640, 640, 3), jnp.float32))

    @jax.jit
    def loss_of(batch, key):
        img = batch["img"].astype(jnp.float32) / 255.0
        out, _ = model.apply(v, img, mutable=["batch_stats"],
                             rngs={"droppath": key})
        strides = [640 / f.shape[1] for f in out["one2many"]]
        total, parts = e2e_detect_loss(out, batch["cls"], batch["bboxes"],
                                       batch["mask"], strides, nc=80)
        return total, parts

    seen = 0
    bad = 0
    ep = 0
    while seen < n_batches:
        for hb in loader._iter_epoch(ep):
            db = {k: jnp.asarray(np.asarray(hb[k]))
                  for k in ("img", "cls", "bboxes", "mask")}
            total, parts = loss_of(db, jax.random.fold_in(rng, seen))
            tv = float(total)
            nvalid = int(np.asarray(hb["mask"]).sum())
            flag = "" if np.isfinite(tv) else "  <-- NaN/Inf"
            if not np.isfinite(tv):
                bad += 1
                np.save(f"/tmp/tpu_queue/nan_batch_{seen}.npy",
                        {k: np.asarray(hb[k]) for k in db}, allow_pickle=True)
            print(f"batch {seen}: loss={tv:.4f} valid_gts={nvalid}{flag}",
                  flush=True)
            seen += 1
            if seen >= n_batches:
                break
        ep += 1
    print(f"DONE: {bad}/{seen} non-finite", flush=True)


if __name__ == "__main__":
    main()
