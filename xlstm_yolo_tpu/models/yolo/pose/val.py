"""Pose validator: box mAP + OKS keypoint mAP
(parity: ref:models/yolo/pose/val.py PoseValidator).

Device program: model forward (decoded boxes + decoded keypoints) + NMS
+ keypoint gather, all fixed shapes.  Host: scale boxes and keypoints to
native space, OKS matrix via utils/metrics.kpt_iou with the reference's
``area * 0.53`` convention (ref:models/yolo/pose/val.py:_process_batch),
10-threshold TP matching shared with detection.
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
from xlstm_yolo_tpu.utils.metrics import (
    OKS_SIGMA,
    PoseMetrics,
    box_iou_matrix,
    kpt_iou,
)


class PoseValidator:
    """Fixed-shape pose validation with box + OKS AP columns."""

    def __init__(self, cfg, data: str | dict | None = None, save_dir: Path | None = None):
        self.args = cfg
        self.data = check_det_dataset(data or cfg.data)
        self.names = self.data["names"]
        self.nc = self.data["nc"]
        self.kpt_shape = tuple(self.data.get("kpt_shape") or (17, 3))
        self.save_dir = Path(save_dir or "runs/val-pose")
        self.metrics = PoseMetrics(names=self.names)
        K = self.kpt_shape[0]
        # COCO sigmas for 17-kpt skeletons, uniform otherwise
        # (parity: ref:models/yolo/pose/val.py:72)
        self.sigma = OKS_SIGMA if K == 17 else np.ones(K, np.float32) / K

    def __call__(self, model_bundle: dict, batch_size: int | None = None, verbose: bool = True):
        model = model_bundle["model"]
        variables = model_bundle["variables"]
        bs = int(batch_size or self.args.batch or 16)
        conf_thres = self.args.conf if self.args.conf is not None else 0.001
        imgsz = int(self.args.imgsz)
        K, nd = self.kpt_shape

        split = self.data.get(self.args.split or "val") or self.data.get("val")
        dataset = build_yolo_dataset(self.args, split, bs, self.data, mode="val")
        dataset.task = "pose"
        loader = build_dataloader(
            dataset, bs, workers=int(self.args.workers or 8), shuffle=False,
            drop_last=False, rank=jax.process_index(), world_size=jax.process_count(),
        )

        @jax.jit
        def infer(variables, img_u8):
            x = img_u8.astype(jnp.float32) / 255.0
            y, _ = model.apply(variables, x)  # (B, A, 4+nc+K*nd) decoded
            nk = K * nd
            nc = y.shape[-1] - 4 - nk
            dets, ok, idx = ops.non_max_suppression(
                y[..., : 4 + nc],
                conf_thres=conf_thres,
                iou_thres=self.args.iou if getattr(self.args, "iou", None) else 0.7,
                max_det=int(getattr(self.args, "max_det", 300) or 300),
                nc=nc, return_idx=True,
            )
            kpts = jnp.take_along_axis(y[..., 4 + nc :], idx[..., None], axis=1)
            return dets, ok, kpts

        stats = {"tp": [], "tp_p": [], "conf": [], "pred_cls": [], "target_cls": []}
        seen, t_inf = 0, 0.0
        for batch in loader:
            n = batch["img"].shape[0]
            img = batch["img"]
            if n < bs:
                img = np.concatenate([img, np.zeros((bs - n, *img.shape[1:]), img.dtype)])
            t0 = time.perf_counter()
            dets_b, ok_b, kpts_b = (
                np.asarray(o) for o in infer(variables, jnp.asarray(img))
            )
            t_inf += time.perf_counter() - t0
            for i in range(n):
                seen += 1
                keep = ok_b[i]
                det = dets_b[i][keep]
                pk = kpts_b[i][keep].reshape(-1, K, nd)
                cok = det[:, 5] < self.nc
                det, pk = det[cok], pk[cok]

                orig_shape = batch["orig_shape"][i]
                ratio_pad = batch["ratio_pad"][i]
                boxes_nat = ops.scale_boxes(
                    (imgsz, imgsz), det[:, :4].copy(), orig_shape, ratio_pad=ratio_pad,
                )
                pk_nat = (
                    ops.scale_coords((imgsz, imgsz), pk.copy(), orig_shape,
                                     ratio_pad=ratio_pad)
                    if len(pk) else pk
                )
                m = batch["mask"][i]
                gt_boxes_lb = batch["bboxes"][i][m]
                gt_cls = batch["cls"][i][m]
                gt_k_lb = batch["kpts"][i][m]  # (ngt, K, 3) letterbox px
                if len(gt_boxes_lb):
                    gt_boxes = ops.scale_boxes(
                        (imgsz, imgsz), gt_boxes_lb, orig_shape, ratio_pad=ratio_pad)
                    gt_k = ops.scale_coords(
                        (imgsz, imgsz), gt_k_lb.copy(), orig_shape, ratio_pad=ratio_pad)
                else:
                    gt_boxes = gt_boxes_lb.reshape(0, 4)
                    gt_k = gt_k_lb.reshape(0, K, 3)

                iou_b = (
                    box_iou_matrix(gt_boxes, boxes_nat)
                    if len(det) and len(gt_boxes)
                    else np.zeros((len(gt_boxes), len(det)))
                )
                tp = match_predictions(det[:, 5], gt_cls, iou_b)

                if len(det) and len(gt_k):
                    area = (
                        (gt_boxes[:, 2] - gt_boxes[:, 0])
                        * (gt_boxes[:, 3] - gt_boxes[:, 1]) * 0.53
                    )
                    iou_p = kpt_iou(gt_k, pk_nat, area, self.sigma)
                else:
                    iou_p = np.zeros((len(gt_k), len(det)))
                tp_p = match_predictions(det[:, 5], gt_cls, iou_p)

                stats["tp"].append(tp)
                stats["tp_p"].append(tp_p)
                stats["conf"].append(det[:, 4])
                stats["pred_cls"].append(det[:, 5])
                stats["target_cls"].append(gt_cls)

        tp = np.concatenate(stats["tp"]) if stats["tp"] else np.zeros((0, 10), bool)
        tp_p = np.concatenate(stats["tp_p"]) if stats["tp_p"] else np.zeros((0, 10), bool)
        conf = np.concatenate(stats["conf"]) if stats["conf"] else np.zeros((0,))
        pred_cls = np.concatenate(stats["pred_cls"]) if stats["pred_cls"] else np.zeros((0,))
        target_cls = np.concatenate(stats["target_cls"]) if stats["target_cls"] else np.zeros((0,))
        if jax.process_count() > 1:
            tp = allgather_ragged(tp)
            tp_p = allgather_ragged(tp_p)
            conf = allgather_ragged(conf)
            pred_cls = allgather_ragged(pred_cls)
            target_cls = allgather_ragged(target_cls)
            seen = int(allgather_ragged(np.asarray([seen])).sum())
        if tp.size and target_cls.size:
            self.metrics.process(tp, tp_p, conf, pred_cls, target_cls)
        self.seen = seen
        if verbose:
            r = self.metrics
            print(
                f"val(pose): images={seen} "
                f"box mAP50={r.box.map50:.4f} mAP50-95={r.box.map:.4f} "
                f"pose mAP50={r.pose.map50:.4f} mAP50-95={r.pose.map:.4f} "
                f"({t_inf / max(seen, 1) * 1e3:.1f}ms/img)"
            )
        return self.metrics.results_dict
