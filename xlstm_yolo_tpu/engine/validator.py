"""Detection validator: jitted batched inference + mAP on host.

Re-design of ref:ultralytics/engine/validator.py:42-260 and
models/yolo/detect/val.py:17-333: fixed-shape device program (uint8 in,
(B, max_det, 6) out), host-side TP matching across the 10 COCO IoU
thresholds, DetMetrics aggregation, optional COCO-format JSON dump and
pycocotools evaluation when that package is present.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from xlstm_yolo_tpu.data.build import build_dataloader, build_yolo_dataset
from xlstm_yolo_tpu.data.dataset import check_det_dataset
from xlstm_yolo_tpu.utils import LOGGER, ops
from xlstm_yolo_tpu.utils.metrics import ConfusionMatrix, DetMetrics, box_iou_matrix

IOUV = np.linspace(0.5, 0.95, 10)


def allgather_ragged(arr: np.ndarray) -> np.ndarray:
    """Concatenate a per-process ragged (N_p, ...) array across processes.

    Multi-host parity for the stats lists: the reference validates on
    rank 0 only (ref:engine/trainer.py:440); here every process scores
    its shard and the stats are all-gathered so DetMetrics — and hence
    fitness, is_best and early-stop — are identical on every host.
    Lengths differ per process, so gather lengths first, pad to max,
    gather, then slice. No-op in single-process runs.
    """
    if jax.process_count() == 1:
        return arr
    from jax.experimental import multihost_utils as mhu

    n = np.asarray([arr.shape[0]], np.int32)
    lengths = np.asarray(mhu.process_allgather(n)).reshape(-1)
    n_max = int(lengths.max())
    pad = np.zeros((n_max - arr.shape[0], *arr.shape[1:]), arr.dtype)
    gathered = np.asarray(mhu.process_allgather(np.concatenate([arr, pad])))
    return np.concatenate([gathered[p, : lengths[p]] for p in range(len(lengths))])


def match_predictions(pred_cls: np.ndarray, true_cls: np.ndarray, iou: np.ndarray) -> np.ndarray:
    """TP table (npr, 10): greedy highest-IoU matching per threshold.

    Parity: validator.py:224-260 (class-gated IoU, per-threshold unique
    pred/gt matching ordered by IoU).
    """
    npr = pred_cls.shape[0]
    correct = np.zeros((npr, IOUV.size), dtype=bool)
    if npr == 0 or true_cls.size == 0:
        return correct
    cls_ok = true_cls[:, None] == pred_cls[None, :]
    iou = np.where(cls_ok, iou, 0.0)
    for ti, t in enumerate(IOUV):
        gt_idx, pred_idx = np.nonzero(iou >= t)
        if gt_idx.size == 0:
            continue
        m = np.stack([gt_idx, pred_idx, iou[gt_idx, pred_idx]], axis=1)
        if m.shape[0] > 1:
            # exact reference semantics (validator.py:246-251): one sort by
            # IoU desc, unique-pred (keeps that pred's best gt; output
            # reordered by pred index), then unique-gt WITHOUT re-sorting
            # by IoU — the re-sort is deliberately disabled upstream, and
            # with near-tied candidates it changes which pred becomes the
            # TP (measured: ~0.1 mAP on the random-init parity set).
            m = m[m[:, 2].argsort()[::-1]]
            m = m[np.unique(m[:, 1], return_index=True)[1]]
            m = m[np.unique(m[:, 0], return_index=True)[1]]
        correct[m[:, 1].astype(int), ti] = True
    return correct


class DetectionValidator:
    """Parity: engine/validator.py BaseValidator + detect/val.py."""

    def __init__(self, cfg, data: dict | str | None = None, save_dir: Path | None = None):
        self.args = cfg
        self.data = check_det_dataset(data or cfg.data)
        self.names = self.data["names"]
        self.nc = self.data["nc"]
        self.save_dir = Path(save_dir or "runs/val")
        self.metrics = DetMetrics(names=self.names)
        self.jdict: list[dict] = []
        self.speed = {"preprocess": 0.0, "inference": 0.0, "postprocess": 0.0, "metrics": 0.0}

    def decode_raw(self, y):
        """Hook: raw head output -> (B, N, 6) [xyxy(model px), conf, cls].

        The detect head already emits this; RT-DETR's validator overrides
        it (normalized cxcywh + per-class scores -> decoded)."""
        return y

    def __call__(self, model_bundle: dict, batch_size: int | None = None, verbose: bool = True):
        model = model_bundle["model"]
        variables = model_bundle["variables"]
        from xlstm_yolo_tpu.utils.tpu_safety import checked_eval_batch

        bs = checked_eval_batch(int(batch_size or self.args.batch or 16),
                                log=LOGGER.warning)

        split = self.data.get(self.args.split or "val") or self.data.get("val")
        dataset = build_yolo_dataset(self.args, split, bs, self.data, mode="val")
        loader = build_dataloader(
            dataset, bs, workers=int(self.args.workers or 8), shuffle=False,
            drop_last=False,
            rank=jax.process_index(), world_size=jax.process_count(),
        )

        @jax.jit
        def infer(variables, img_u8):
            x = img_u8.astype(jnp.float32) / 255.0
            y, _ = model.apply(variables, x)
            return self.decode_raw(y)

        conf_thres = self.args.conf if self.args.conf is not None else 0.001
        stats = {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}
        confusion = ConfusionMatrix(self.nc)
        self.jdict = []
        seen = 0
        t_inf = t_pre = t_post = 0.0

        for batch in loader:
            n = batch["img"].shape[0]
            img = batch["img"]
            if n < bs:  # pad tail batch for the fixed-shape program
                img = np.concatenate([img, np.zeros((bs - n, *img.shape[1:]), img.dtype)])
            t0 = time.perf_counter()
            preds = np.asarray(infer(variables, jnp.asarray(img)))[:n]
            t1 = time.perf_counter()
            t_inf += t1 - t0

            for i in range(n):
                seen += 1
                det = preds[i]
                det = det[det[:, 4] > conf_thres]
                # model output is score-sorted; truncate like the reference's
                # end2end NMS branch (ref:utils/ops.py:240-244)
                det = det[: int(self.args.max_det or 300)]
                # guard: a model with more classes than the dataset (e.g.
                # un-finetuned nc=80 weights on a 2-class set) must not
                # index past the metric tables
                det = det[det[:, 5] < self.nc]
                orig_shape = batch["orig_shape"][i]
                ratio_pad = batch["ratio_pad"][i]
                boxes = ops.scale_boxes(
                    (int(self.args.imgsz), int(self.args.imgsz)), det[:, :4],
                    orig_shape, ratio_pad=ratio_pad,
                )
                det = np.concatenate([boxes, det[:, 4:6]], axis=1)

                # ground truth back to native space
                m = batch["mask"][i]
                gt_boxes_lb = batch["bboxes"][i][m]  # letterboxed px
                gt_cls = batch["cls"][i][m]
                if len(gt_boxes_lb):
                    gt_boxes = ops.scale_boxes(
                        (int(self.args.imgsz), int(self.args.imgsz)), gt_boxes_lb,
                        orig_shape, ratio_pad=ratio_pad,
                    )
                else:
                    gt_boxes = gt_boxes_lb.reshape(0, 4)

                iou = box_iou_matrix(gt_boxes, det[:, :4]) if len(det) and len(gt_boxes) else np.zeros((len(gt_boxes), len(det)))
                tp = match_predictions(det[:, 5], gt_cls, iou)
                stats["tp"].append(tp)
                stats["conf"].append(det[:, 4])
                stats["pred_cls"].append(det[:, 5])
                stats["target_cls"].append(gt_cls)
                if self.args.plots:
                    confusion.process_batch(det, gt_boxes, gt_cls)
                if self.args.save_json:
                    self._save_one_json(det, batch["im_file"][i])
            t_post += time.perf_counter() - t1

        tp = np.concatenate(stats["tp"]) if stats["tp"] else np.zeros((0, 10), bool)
        conf = np.concatenate(stats["conf"]) if stats["conf"] else np.zeros((0,))
        pred_cls = np.concatenate(stats["pred_cls"]) if stats["pred_cls"] else np.zeros((0,))
        target_cls = np.concatenate(stats["target_cls"]) if stats["target_cls"] else np.zeros((0,))
        if jax.process_count() > 1:  # every process must call the collectives
            tp = allgather_ragged(tp)
            conf = allgather_ragged(conf)
            pred_cls = allgather_ragged(pred_cls)
            target_cls = allgather_ragged(target_cls)
            seen = int(allgather_ragged(np.asarray([seen])).sum())
        if tp.size and target_cls.size:
            self.metrics.process(tp, conf, pred_cls, target_cls)
        self.confusion_matrix = confusion
        if self.args.plots:
            # PR/F1/P/R curves + confusion matrix into save_dir
            # (parity: ref validator on_plot outputs)
            try:
                from xlstm_yolo_tpu.utils.plotting import (
                    plot_confusion_matrix, plot_val_curves,
                )

                self.save_dir.mkdir(parents=True, exist_ok=True)
                box_metrics = getattr(self.metrics, "box", self.metrics)
                plot_val_curves(box_metrics, self.save_dir, self.names)
                plot_confusion_matrix(confusion.matrix, self.names,
                                      self.save_dir / "confusion_matrix.png")
            except Exception as e:  # plotting must never fail a val run
                print(f"val plots failed: {e}")
        self.seen = seen
        self.speed = {
            "inference": t_inf / max(seen, 1) * 1e3,
            "postprocess": t_post / max(seen, 1) * 1e3,
        }

        if self.args.save_json and self.jdict:
            self.save_dir.mkdir(parents=True, exist_ok=True)
            (self.save_dir / "predictions.json").write_text(json.dumps(self.jdict))
            self._coco_eval()

        if verbose:
            mp, mr, map50, map5095 = self.metrics.mean_results()
            print(
                f"val: images={seen} P={mp:.3f} R={mr:.3f} "
                f"mAP50={map50:.4f} mAP50-95={map5095:.4f} "
                f"({self.speed['inference']:.1f}ms/img inference)"
            )
        return self.metrics.results_dict

    # -- COCO json ----------------------------------------------------------
    def _save_one_json(self, det: np.ndarray, im_file: str):
        """Parity: detect/val.py:301-333 (COCO 91-class ids, xywh tl)."""
        stem = Path(im_file).stem
        image_id = int(stem) if stem.isnumeric() else stem
        box = det[:, :4].copy()
        box[:, 2:] -= box[:, :2]  # xyxy -> top-left xywh (COCO format)
        for row, b in zip(det, box):
            self.jdict.append(
                {
                    "image_id": image_id,
                    "category_id": coco80_to_coco91(int(row[5])) if self.data.get("is_coco", "coco" in str(self.args.data or "")) else int(row[5]),
                    "bbox": [round(float(x), 3) for x in b],
                    "score": round(float(row[4]), 5),
                }
            )

    def _coco_eval(self):
        try:
            from pycocotools.coco import COCO
            from pycocotools.cocoeval import COCOeval
        except ImportError:
            return
        anno_path = Path(self.data.get("path", ".")) / "annotations" / "instances_val2017.json"
        if not anno_path.exists():
            return
        anno = COCO(str(anno_path))
        pred = anno.loadRes(str(self.save_dir / "predictions.json"))
        ev = COCOeval(anno, pred, "bbox")
        ev.evaluate()
        ev.accumulate()
        ev.summarize()


_COCO91 = [
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22,
    23, 24, 25, 27, 28, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44,
    46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61, 62, 63, 64,
    65, 67, 70, 72, 73, 74, 75, 76, 77, 78, 79, 80, 81, 82, 84, 85, 86, 87, 88,
    89, 90,
]


def coco80_to_coco91(c: int) -> int:
    """Parity: data/converter.py coco80_to_coco91_class."""
    return _COCO91[c]
