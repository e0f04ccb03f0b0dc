"""Classification validator: top-1 / top-5 accuracy
(parity: ref:models/yolo/classify/val.py ClassificationValidator)."""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from xlstm_yolo_tpu.data.build import build_dataloader
from xlstm_yolo_tpu.data.dataset import ClassificationDataset


class ClassificationValidator:
    def __init__(self, cfg, data: str | dict | None = None, save_dir: Path | None = None):
        self.args = cfg
        self.data_path = data or cfg.data
        self.save_dir = Path(save_dir or "runs/val-cls")

    def __call__(self, model_bundle: dict, batch_size: int | None = None, verbose: bool = True):
        model = model_bundle["model"]
        variables = model_bundle["variables"]
        bs = int(batch_size or self.args.batch or 16)

        split = self.args.split or "val"
        dataset = ClassificationDataset(
            str(Path(self.data_path) / split), imgsz=int(self.args.imgsz),
            hyp=self.args,
        )
        loader = build_dataloader(
            dataset, bs, workers=int(self.args.workers or 8), shuffle=False,
            drop_last=False, rank=jax.process_index(), world_size=jax.process_count(),
        )

        @jax.jit
        def infer(variables, img_u8):
            x = img_u8.astype(jnp.float32) / 255.0
            probs, _ = model.apply(variables, x)
            return probs

        top1 = top5 = seen = 0
        t_inf = 0.0
        for batch in loader:
            n = batch["img"].shape[0]
            img = batch["img"]
            if n < bs:
                img = np.concatenate([img, np.zeros((bs - n, *img.shape[1:]), img.dtype)])
            t0 = time.perf_counter()
            probs = np.asarray(infer(variables, jnp.asarray(img)))[:n]
            t_inf += time.perf_counter() - t0
            labels = np.asarray(batch["cls"][:n])
            order = np.argsort(-probs, axis=-1)
            top1 += int((order[:, 0] == labels).sum())
            top5 += int((order[:, :5] == labels[:, None]).any(1).sum())
            seen += n

        results = {
            "metrics/accuracy_top1": top1 / max(seen, 1),
            "metrics/accuracy_top5": top5 / max(seen, 1),
            "fitness": top1 / max(seen, 1),
        }
        if verbose:
            print(f"val(cls): images={seen} top1={results['metrics/accuracy_top1']:.4f} "
                  f"top5={results['metrics/accuracy_top5']:.4f} "
                  f"({t_inf / max(seen, 1) * 1e3:.1f}ms/img)")
        return results
