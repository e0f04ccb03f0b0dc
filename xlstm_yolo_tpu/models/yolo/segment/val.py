"""Segmentation validator: box mAP + mask mAP over prototype-space masks
(parity: ref:models/yolo/segment/val.py SegmentationValidator).

Device program: model forward + NMS + coefficient gather (fixed shapes).
Host: mask assembly at prototype resolution via utils/ops.process_mask,
mask IoU against the dataset's proto-resolution gt masks (both live on
the same letterboxed 1/4-scale grid, so no interpolation is needed —
the reference instead interpolates gt to pred shape,
ref:models/yolo/segment/val.py:202), and the 10-threshold TP matching
shared with detection.
"""

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
from xlstm_yolo_tpu.utils.metrics import SegmentMetrics, box_iou_matrix, mask_iou


class SegmentationValidator:
    """Fixed-shape segmentation validation with box + mask AP columns."""

    def __init__(self, cfg, data: str | dict | None = None, save_dir: Path | None = None):
        self.args = cfg
        self.data = check_det_dataset(data or cfg.data)
        self.names = self.data["names"]
        self.nc = self.data["nc"]
        self.save_dir = Path(save_dir or "runs/val-seg")
        self.metrics = SegmentMetrics(names=self.names)

    def __call__(self, model_bundle: dict, batch_size: int | None = None, verbose: bool = True):
        model = model_bundle["model"]
        variables = model_bundle["variables"]
        bs = int(batch_size or self.args.batch or 16)
        conf_thres = self.args.conf if self.args.conf is not None else 0.001
        imgsz = int(self.args.imgsz)

        split = self.data.get(self.args.split or "val") or self.data.get("val")
        dataset = build_yolo_dataset(self.args, split, bs, self.data, mode="val")
        dataset.task = "segment"
        loader = build_dataloader(
            dataset, bs, workers=int(self.args.workers or 8), shuffle=False,
            drop_last=False, rank=jax.process_index(), world_size=jax.process_count(),
        )

        @jax.jit
        def infer(variables, img_u8):
            x = img_u8.astype(jnp.float32) / 255.0
            y, aux = model.apply(variables, x)  # (B, A, 4+nc+nm), aux proto
            nm = aux["proto"].shape[-1]
            nc = y.shape[-1] - 4 - nm
            dets, ok, idx = ops.non_max_suppression(
                y[..., : 4 + nc],
                conf_thres=conf_thres,
                iou_thres=self.args.iou if getattr(self.args, "iou", None) else 0.7,
                max_det=int(getattr(self.args, "max_det", 300) or 300),
                nc=nc, return_idx=True,
            )
            coeffs = jnp.take_along_axis(y[..., 4 + nc :], idx[..., None], axis=1)
            return dets, ok, coeffs, aux["proto"]

        stats = {"tp": [], "tp_m": [], "conf": [], "pred_cls": [], "target_cls": []}
        seen, t_inf = 0, 0.0
        for batch in loader:
            n = batch["img"].shape[0]
            img = batch["img"]
            if n < bs:
                img = np.concatenate([img, np.zeros((bs - n, *img.shape[1:]), img.dtype)])
            t0 = time.perf_counter()
            dets_b, ok_b, coeffs_b, proto_b = (
                np.asarray(o) for o in infer(variables, jnp.asarray(img))
            )
            t_inf += time.perf_counter() - t0
            for i in range(n):
                seen += 1
                keep = ok_b[i]
                det = dets_b[i][keep]  # (k, 6) xyxy(model px) conf cls
                coeff = coeffs_b[i][keep]
                cok = det[:, 5] < self.nc
                det, coeff = det[cok], coeff[cok]
                proto = proto_b[i]  # (Hm, Wm, nm)

                orig_shape = batch["orig_shape"][i]
                ratio_pad = batch["ratio_pad"][i]
                boxes_nat = ops.scale_boxes(
                    (imgsz, imgsz), det[:, :4].copy(), orig_shape, ratio_pad=ratio_pad,
                )
                m = batch["mask"][i]
                gt_boxes_lb = batch["bboxes"][i][m]
                gt_cls = batch["cls"][i][m]
                gt_boxes = (
                    ops.scale_boxes((imgsz, imgsz), gt_boxes_lb, orig_shape,
                                    ratio_pad=ratio_pad)
                    if len(gt_boxes_lb) else gt_boxes_lb.reshape(0, 4)
                )

                iou_b = (
                    box_iou_matrix(gt_boxes, boxes_nat)
                    if len(det) and len(gt_boxes)
                    else np.zeros((len(gt_boxes), len(det)))
                )
                tp = match_predictions(det[:, 5], gt_cls, iou_b)

                # mask TP at prototype resolution (letterbox-aligned grid
                # shared by preds and the dataset's gt masks)
                gt_masks = batch["masks"][i][m]  # (ngt, ms, ms) uint8
                if len(det) and len(gt_masks):
                    pred_masks = np.asarray(ops.process_mask(
                        proto, coeff, det[:, :4], (imgsz, imgsz)))
                    if pred_masks.shape[1:] != gt_masks.shape[1:]:
                        import cv2

                        pred_masks = np.stack([
                            cv2.resize(p.astype(np.uint8), gt_masks.shape[1:][::-1],
                                       interpolation=cv2.INTER_NEAREST)
                            for p in pred_masks
                        ]).astype(bool)
                    iou_m = mask_iou(
                        gt_masks.reshape(len(gt_masks), -1).astype(np.float32),
                        pred_masks.reshape(len(pred_masks), -1).astype(np.float32),
                    )
                else:
                    iou_m = np.zeros((len(gt_masks), len(det)))
                tp_m = match_predictions(det[:, 5], gt_cls, iou_m)

                stats["tp"].append(tp)
                stats["tp_m"].append(tp_m)
                stats["conf"].append(det[:, 4])
                stats["pred_cls"].append(det[:, 5])
                stats["target_cls"].append(gt_cls)

        tp = np.concatenate(stats["tp"]) if stats["tp"] else np.zeros((0, 10), bool)
        tp_m = np.concatenate(stats["tp_m"]) if stats["tp_m"] else np.zeros((0, 10), bool)
        conf = np.concatenate(stats["conf"]) if stats["conf"] else np.zeros((0,))
        pred_cls = np.concatenate(stats["pred_cls"]) if stats["pred_cls"] else np.zeros((0,))
        target_cls = np.concatenate(stats["target_cls"]) if stats["target_cls"] else np.zeros((0,))
        if jax.process_count() > 1:
            tp = allgather_ragged(tp)
            tp_m = allgather_ragged(tp_m)
            conf = allgather_ragged(conf)
            pred_cls = allgather_ragged(pred_cls)
            target_cls = allgather_ragged(target_cls)
            seen = int(allgather_ragged(np.asarray([seen])).sum())
        if tp.size and target_cls.size:
            self.metrics.process(tp, tp_m, conf, pred_cls, target_cls)
        self.seen = seen
        if verbose:
            r = self.metrics
            print(
                f"val(seg): images={seen} "
                f"box mAP50={r.box.map50:.4f} mAP50-95={r.box.map:.4f} "
                f"mask mAP50={r.seg.map50:.4f} mAP50-95={r.seg.map:.4f} "
                f"({t_inf / max(seen, 1) * 1e3:.1f}ms/img)"
            )
        return self.metrics.results_dict
