"""OBB validator: probiou matching over rotated boxes
(parity: ref:models/yolo/obb/val.py OBBValidator)."""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from xlstm_yolo_tpu.data.build import build_dataloader, build_yolo_dataset
from xlstm_yolo_tpu.data.dataset import check_det_dataset
from xlstm_yolo_tpu.engine.validator import allgather_ragged, match_predictions
from xlstm_yolo_tpu.utils import ops
from xlstm_yolo_tpu.utils.metrics import DetMetrics, rbox_iou_matrix


class OBBValidator:
    """Fixed-shape rotated-box validation.

    The jitted program runs the OBB model + rotated probiou NMS on
    device; the host scales xywhr back to native space and matches
    predictions to gts across the 10 COCO IoU thresholds with probiou
    (ref:models/yolo/obb/val.py:_process_batch -> batch_probiou).
    """

    def __init__(self, cfg, data: str | dict | None = None, save_dir: Path | None = None):
        self.args = cfg
        self.data = check_det_dataset(data or cfg.data)
        self.names = self.data["names"]
        self.nc = self.data["nc"]
        self.save_dir = Path(save_dir or "runs/val-obb")
        self.metrics = DetMetrics(names=self.names)

    def __call__(self, model_bundle: dict, batch_size: int | None = None, verbose: bool = True):
        model = model_bundle["model"]
        variables = model_bundle["variables"]
        bs = int(batch_size or self.args.batch or 16)
        conf_thres = self.args.conf if self.args.conf is not None else 0.001

        split = self.data.get(self.args.split or "val") or self.data.get("val")
        dataset = build_yolo_dataset(self.args, split, bs, self.data, mode="val")
        dataset.task = "obb"
        loader = build_dataloader(
            dataset, bs, workers=int(self.args.workers or 8), shuffle=False,
            drop_last=False, rank=jax.process_index(), world_size=jax.process_count(),
        )

        @jax.jit
        def infer(variables, img_u8):
            x = img_u8.astype(jnp.float32) / 255.0
            y, _ = model.apply(variables, x)
            dets, ok = ops.non_max_suppression_rotated(
                y, conf_thres=conf_thres,
                iou_thres=self.args.iou if getattr(self.args, "iou", None) else 0.7,
                max_det=int(getattr(self.args, "max_det", 300) or 300),
            )
            return dets, ok

        stats = {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}
        seen, t_inf = 0, 0.0
        for batch in loader:
            n = batch["img"].shape[0]
            img = batch["img"]
            if n < bs:
                img = np.concatenate([img, np.zeros((bs - n, *img.shape[1:]), img.dtype)])
            t0 = time.perf_counter()
            dets_b, ok_b = (np.asarray(o) for o in infer(variables, jnp.asarray(img)))
            t_inf += time.perf_counter() - t0
            for i in range(n):
                seen += 1
                det = dets_b[i][ok_b[i]]  # (k, 7) xywhr+conf+cls, letterbox px
                det = det[det[:, 6] < self.nc]
                m = batch["mask"][i]
                gt_rb = batch["rboxes"][i][m]  # letterboxed xywhr
                gt_cls = batch["cls"][i][m]
                iou = (
                    rbox_iou_matrix(gt_rb, det[:, :5])
                    if len(det) and len(gt_rb)
                    else np.zeros((len(gt_rb), len(det)))
                )
                tp = match_predictions(det[:, 6], gt_cls, iou)
                stats["tp"].append(tp)
                stats["conf"].append(det[:, 5])
                stats["pred_cls"].append(det[:, 6])
                stats["target_cls"].append(gt_cls)

        tp = np.concatenate(stats["tp"]) if stats["tp"] else np.zeros((0, 10), bool)
        conf = np.concatenate(stats["conf"]) if stats["conf"] else np.zeros((0,))
        pred_cls = np.concatenate(stats["pred_cls"]) if stats["pred_cls"] else np.zeros((0,))
        target_cls = np.concatenate(stats["target_cls"]) if stats["target_cls"] else np.zeros((0,))
        if jax.process_count() > 1:
            tp = allgather_ragged(tp)
            conf = allgather_ragged(conf)
            pred_cls = allgather_ragged(pred_cls)
            target_cls = allgather_ragged(target_cls)
            seen = int(allgather_ragged(np.asarray([seen])).sum())
        if tp.size and target_cls.size:
            self.metrics.process(tp, conf, pred_cls, target_cls)
        self.seen = seen
        if verbose:
            mp, mr, map50, map5095 = self.metrics.mean_results()
            print(f"val(obb): images={seen} P={mp:.3f} R={mr:.3f} "
                  f"mAP50={map50:.4f} mAP50-95={map5095:.4f} "
                  f"({t_inf / max(seen, 1) * 1e3:.1f}ms/img)")
        return self.metrics.results_dict
