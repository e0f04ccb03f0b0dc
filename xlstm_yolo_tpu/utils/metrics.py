"""IoU family + detection metrics.

JAX re-implementations of the IoU math (ref:ultralytics/utils/metrics.py:52-240)
for on-device loss/assignment, plus numpy-side AP aggregation
(ap_per_class / DetMetrics) used by the validator — metric aggregation is
cheap and stays on host, matching the reference's split.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

f32 = jnp.float32


def bbox_iou(box1, box2, xywh: bool = True, kind: str = "iou", eps: float = 1e-7):
    """Pairwise IoU/GIoU/DIoU/CIoU between broadcastable box arrays.

    Parity: metrics.py:52-118 (bbox_iou).  ``kind`` in {iou, giou, diou, ciou}.
    Boxes broadcast elementwise (no N x M expansion here — callers
    broadcast explicitly, which keeps the memory layout under control).
    """
    if xywh:
        (x1, y1, w1, h1) = jnp.split(box1, 4, -1)
        (x2, y2, w2, h2) = jnp.split(box2, 4, -1)
        b1_x1, b1_x2 = x1 - w1 / 2, x1 + w1 / 2
        b1_y1, b1_y2 = y1 - h1 / 2, y1 + h1 / 2
        b2_x1, b2_x2 = x2 - w2 / 2, x2 + w2 / 2
        b2_y1, b2_y2 = y2 - h2 / 2, y2 + h2 / 2
    else:
        b1_x1, b1_y1, b1_x2, b1_y2 = jnp.split(box1, 4, -1)
        b2_x1, b2_y1, b2_x2, b2_y2 = jnp.split(box2, 4, -1)
        w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
        w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps

    inter = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0, None) * (
        jnp.clip(jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0, None)
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    if kind == "iou":
        return iou.squeeze(-1)

    cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
    ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
    if kind == "giou":
        c_area = cw * ch + eps
        return (iou - (c_area - union) / c_area).squeeze(-1)

    c2 = cw**2 + ch**2 + eps
    rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
    if kind == "diou":
        return (iou - rho2 / c2).squeeze(-1)

    # CIoU: aspect-ratio consistency term (Zheng et al. 2019)
    v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
    alpha = v / (v - iou + (1 + eps))
    alpha = jax.lax.stop_gradient(alpha)
    return (iou - (rho2 / c2 + v * alpha)).squeeze(-1)


def _rbox_covariance(boxes, eps: float = 1e-7):
    """xywhr (..., 5) -> Gaussian covariance terms (a, b, c).

    Parity: metrics.py:178-196 (_get_covariance_matrix): a uniform box is
    modelled as a Gaussian with variances w^2/12, h^2/12 rotated by r.
    """
    a = boxes[..., 2] ** 2 / 12.0
    b = boxes[..., 3] ** 2 / 12.0
    c = boxes[..., 4]
    cos, sin = jnp.cos(c), jnp.sin(c)
    cos2, sin2 = cos**2, sin**2
    return a * cos2 + b * sin2, a * sin2 + b * cos2, (a - b) * cos * sin


def probiou(obb1, obb2, ciou: bool = False, eps: float = 1e-7):
    """Probabilistic IoU between broadcastable rotated-box arrays (..., 5).

    Parity: metrics.py:198-242 (probiou; Llerena et al. 2021) — the
    Bhattacharyya distance between the boxes' Gaussian embeddings,
    mapped to 1 - Hellinger.  Elementwise over broadcast shapes like
    :func:`bbox_iou` (callers expand for N x M grids).
    """
    obb1 = obb1.astype(f32)
    obb2 = obb2.astype(f32)
    x1, y1 = obb1[..., 0], obb1[..., 1]
    x2, y2 = obb2[..., 0], obb2[..., 1]
    a1, b1, c1 = _rbox_covariance(obb1)
    a2, b2, c2 = _rbox_covariance(obb2)

    denom = (a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps
    t1 = ((a1 + a2) * (y1 - y2) ** 2 + (b1 + b2) * (x1 - x2) ** 2) / denom * 0.25
    t2 = ((c1 + c2) * (x2 - x1) * (y1 - y2)) / denom * 0.5
    det1 = jnp.clip(a1 * b1 - c1**2, 0.0, None)
    det2 = jnp.clip(a2 * b2 - c2**2, 0.0, None)
    t3 = jnp.log((denom - eps) / (4.0 * jnp.sqrt(det1 * det2) + eps) + eps) * 0.5
    bd = jnp.clip(t1 + t2 + t3, eps, 100.0)
    hd = jnp.sqrt(1.0 - jnp.exp(-bd) + eps)
    iou = 1.0 - hd
    if ciou:  # aspect-ratio term only, as in the reference
        w1, h1 = obb1[..., 2], obb1[..., 3]
        w2, h2 = obb2[..., 2], obb2[..., 3]
        v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
        alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
        return iou - v * alpha
    return iou


def rbox_iou_matrix(obb1: np.ndarray, obb2: np.ndarray) -> np.ndarray:
    """ProbIoU matrix (N, M) on host, xywhr (parity: metrics.py:244 batch_probiou)."""
    if len(obb1) == 0 or len(obb2) == 0:
        return np.zeros((len(obb1), len(obb2)), np.float32)
    out = probiou(jnp.asarray(obb1)[:, None, :], jnp.asarray(obb2)[None, :, :])
    return np.asarray(out, np.float32)


# OKS sigmas for the 17 COCO keypoints (parity: ref:utils/loss.py OKS_SIGMA)
OKS_SIGMA = (
    np.asarray(
        [0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62, 0.62,
         1.07, 1.07, 0.87, 0.87, 0.89, 0.89], np.float32,
    ) / 10.0
)


def mask_iou(mask1: np.ndarray, mask2: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """Mask IoU matrix (N, M) from flattened binary masks.

    mask1: (N, P) gt masks; mask2: (M, P) pred masks, P = Hm*Wm pixels.
    Parity: ref:utils/metrics.py:137 (mask_iou) — intersection by
    matmul, union from per-mask areas.
    """
    m1 = mask1.astype(np.float32)
    m2 = mask2.astype(np.float32)
    inter = np.clip(m1 @ m2.T, 0, None)
    union = m1.sum(1)[:, None] + m2.sum(1)[None] - inter
    return inter / (union + eps)


def kpt_iou(kpt1: np.ndarray, kpt2: np.ndarray, area: np.ndarray,
            sigma: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """Object Keypoint Similarity matrix (N, M).

    kpt1: (N, K, 3) gt keypoints (x, y, vis); kpt2: (M, K, 2+) preds;
    area: (N,) gt box areas; sigma: (K,) per-keypoint scales.
    Parity: ref:utils/metrics.py:156 (kpt_iou) — the cocoeval OKS
    kernel, averaged over the gt-visible keypoints.
    """
    d = (kpt1[:, None, :, 0] - kpt2[None, :, :, 0]) ** 2 + (
        kpt1[:, None, :, 1] - kpt2[None, :, :, 1]
    ) ** 2  # (N, M, K)
    sigma = np.asarray(sigma, np.float32)
    kpt_mask = kpt1[..., 2] != 0  # (N, K)
    e = d / ((2 * sigma) ** 2 * (area[:, None, None] + eps) * 2)
    return (np.exp(-e) * kpt_mask[:, None]).sum(-1) / (
        kpt_mask.sum(-1)[:, None] + eps
    )


def box_iou_matrix(box1: np.ndarray, box2: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """Plain IoU matrix (N, M) on host, xyxy (parity: metrics.py:52 box_iou)."""
    a1 = box1[:, None, :2]
    a2 = box1[:, None, 2:]
    b1 = box2[None, :, :2]
    b2 = box2[None, :, 2:]
    inter = np.clip(np.minimum(a2, b2) - np.maximum(a1, b1), 0, None).prod(2)
    area1 = (box1[:, 2:] - box1[:, :2]).prod(1)
    area2 = (box2[:, 2:] - box2[:, :2]).prod(1)
    return inter / (area1[:, None] + area2[None] - inter + eps)


# ---------------------------------------------------------------------------
# AP aggregation (host-side numpy, parity: metrics.py:537-860)
# ---------------------------------------------------------------------------


def compute_ap(recall: np.ndarray, precision: np.ndarray) -> tuple[float, np.ndarray, np.ndarray]:
    """101-point interpolated AP (parity: metrics.py:507-535)."""
    mrec = np.concatenate(([0.0], recall, [1.0]))
    mpre = np.concatenate(([1.0], precision, [0.0]))
    mpre = np.flip(np.maximum.accumulate(np.flip(mpre)))
    x = np.linspace(0, 1, 101)
    ap = np.trapezoid(np.interp(x, mrec, mpre), x)
    return ap, mpre, mrec


def smooth(y: np.ndarray, f: float = 0.05) -> np.ndarray:
    """Box-filter smoothing (parity: ref:utils/metrics.py smooth): pads the
    ends and convolves with a flat kernel spanning fraction ``f``."""
    nf = round(len(y) * f * 2) // 2 + 1  # odd element count
    p = np.ones(nf // 2)
    yp = np.concatenate([p * y[0], y, p * y[-1]])
    return np.convolve(yp, np.ones(nf) / nf, mode="valid")


def ap_per_class(
    tp: np.ndarray,  # (N, 10) bool TP at each IoU threshold
    conf: np.ndarray,  # (N,)
    pred_cls: np.ndarray,  # (N,)
    target_cls: np.ndarray,  # (Ngt,)
    eps: float = 1e-16,
):
    """Per-class AP across the 10 COCO IoU thresholds.

    Parity: metrics.py:537-626.  Returns tp/fp counts at max-F1 conf,
    p, r, f1, ap (nc, 10), the present class ids, and the curves
    (x, p/r/f1 conf curves, 101-pt PR values) the reference feeds its
    plot_pr_curve / plot_mc_curve renderers.
    """
    order = np.argsort(-conf)
    tp, conf, pred_cls = tp[order], conf[order], pred_cls[order]

    unique_classes, nt = np.unique(target_cls, return_counts=True)
    nc = unique_classes.shape[0]

    ap = np.zeros((nc, tp.shape[1]))
    p_curve = np.zeros((nc, 1000))
    r_curve = np.zeros((nc, 1000))
    x = np.linspace(0, 1, 1000)
    prec_values = np.zeros((nc, 101))  # precision at mAP@0.5 recall grid

    for ci, c in enumerate(unique_classes):
        mask = pred_cls == c
        n_l = nt[ci]
        n_p = mask.sum()
        if n_p == 0 or n_l == 0:
            continue
        fpc = (1 - tp[mask]).cumsum(0)
        tpc = tp[mask].cumsum(0)
        recall = tpc / (n_l + eps)
        precision = tpc / (tpc + fpc)
        r_curve[ci] = np.interp(-x, -conf[mask], recall[:, 0], left=0)
        p_curve[ci] = np.interp(-x, -conf[mask], precision[:, 0], left=1)
        for j in range(tp.shape[1]):
            ap[ci, j], mpre, mrec = compute_ap(recall[:, j], precision[:, j])
            if j == 0:
                prec_values[ci] = np.interp(
                    np.linspace(0, 1, 101), mrec, mpre)

    f1_curve = 2 * p_curve * r_curve / (p_curve + r_curve + eps)
    i = smooth(f1_curve.mean(0), 0.1).argmax()
    p, r, f1 = p_curve[:, i], r_curve[:, i], f1_curve[:, i]
    tp_count = (r * nt).round()
    fp_count = (tp_count / (p + eps) - tp_count).round()
    curves = (x, p_curve, r_curve, f1_curve, prec_values)
    return tp_count, fp_count, p, r, f1, ap, unique_classes.astype(int), curves


@dataclass
class DetMetrics:
    """mAP bookkeeping (parity: metrics.py:626-860 Metric/DetMetrics)."""

    names: dict = field(default_factory=dict)
    p: np.ndarray = field(default_factory=lambda: np.array([]))
    r: np.ndarray = field(default_factory=lambda: np.array([]))
    f1: np.ndarray = field(default_factory=lambda: np.array([]))
    all_ap: np.ndarray = field(default_factory=lambda: np.zeros((0, 10)))
    ap_class_index: np.ndarray = field(default_factory=lambda: np.array([], dtype=int))
    nt_per_class: np.ndarray = field(default_factory=lambda: np.array([], dtype=int))
    # (x(1000), p_curve, r_curve, f1_curve (nc, 1000), prec_values (nc, 101))
    curves_results: tuple | None = None

    def process(self, tp, conf, pred_cls, target_cls):
        res = ap_per_class(tp, conf, pred_cls, target_cls)
        (_, _, self.p, self.r, self.f1, self.all_ap, self.ap_class_index,
         self.curves_results) = res
        # nc-length bincount so counts align with class ids, not just the
        # classes present (parity: ref DetMetrics nt_per_class)
        nc = len(self.names) or (int(target_cls.max()) + 1 if len(target_cls) else 0)
        self.nt_per_class = np.bincount(np.asarray(target_cls, int), minlength=nc)

    @property
    def ap50(self):
        return self.all_ap[:, 0] if len(self.all_ap) else []

    @property
    def ap(self):
        return self.all_ap.mean(1) if len(self.all_ap) else []

    @property
    def mp(self):
        return self.p.mean() if len(self.p) else 0.0

    @property
    def mr(self):
        return self.r.mean() if len(self.r) else 0.0

    @property
    def map50(self):
        return self.all_ap[:, 0].mean() if len(self.all_ap) else 0.0

    @property
    def map75(self):
        return self.all_ap[:, 5].mean() if len(self.all_ap) else 0.0

    @property
    def map(self):
        return self.all_ap.mean() if len(self.all_ap) else 0.0

    def mean_results(self):
        return [self.mp, self.mr, self.map50, self.map]

    @property
    def fitness(self):
        """0.1 * mAP50 + 0.9 * mAP50-95 (parity: metrics.py:748)."""
        return 0.1 * self.map50 + 0.9 * self.map

    @property
    def results_dict(self):
        return {
            "metrics/precision(B)": self.mp,
            "metrics/recall(B)": self.mr,
            "metrics/mAP50(B)": self.map50,
            "metrics/mAP50-95(B)": self.map,
            "fitness": self.fitness,
        }


class SegmentMetrics:
    """Box + mask AP pair (parity: ref:utils/metrics.py:896 SegmentMetrics).

    Two DetMetrics tables processed from the same (conf, pred_cls,
    target_cls) stream with separate TP tables; fitness is the sum of
    both tasks' fitness, matching the reference.
    """

    task = "segment"
    suffix = "M"  # results_dict column suffix for the second table

    def __init__(self, names: dict | None = None):
        self.names = names or {}
        self.box = DetMetrics(names=self.names)
        self.seg = DetMetrics(names=self.names)

    @property
    def _second(self):
        return self.seg

    def process(self, tp, tp_second, conf, pred_cls, target_cls):
        self.box.process(tp, conf, pred_cls, target_cls)
        self._second.process(tp_second, conf, pred_cls, target_cls)

    def mean_results(self):
        return self.box.mean_results() + self._second.mean_results()

    @property
    def fitness(self):
        return self.box.fitness + self._second.fitness

    @property
    def results_dict(self):
        s = self.suffix
        m = self._second
        return {
            "metrics/precision(B)": self.box.mp,
            "metrics/recall(B)": self.box.mr,
            "metrics/mAP50(B)": self.box.map50,
            "metrics/mAP50-95(B)": self.box.map,
            f"metrics/precision({s})": m.mp,
            f"metrics/recall({s})": m.mr,
            f"metrics/mAP50({s})": m.map50,
            f"metrics/mAP50-95({s})": m.map,
            "fitness": self.fitness,
        }


class PoseMetrics(SegmentMetrics):
    """Box + OKS-pose AP pair (parity: ref:utils/metrics.py:1034)."""

    task = "pose"
    suffix = "P"

    def __init__(self, names: dict | None = None):
        self.names = names or {}
        self.box = DetMetrics(names=self.names)
        self.pose = DetMetrics(names=self.names)

    @property
    def _second(self):
        return self.pose


class ConfusionMatrix:
    """Detection confusion matrix (parity: metrics.py:294-470)."""

    def __init__(self, nc: int, conf: float = 0.25, iou_thres: float = 0.45):
        self.nc = nc
        self.conf = conf
        self.iou_thres = iou_thres
        self.matrix = np.zeros((nc + 1, nc + 1), dtype=np.int64)

    def process_batch(self, detections: np.ndarray, gt_bboxes: np.ndarray, gt_cls: np.ndarray):
        """detections: (N, 6) [xyxy, conf, cls]; gts xyxy + class ids."""
        if gt_cls.size == 0:
            if detections is not None and len(detections):
                for dc in detections[detections[:, 4] > self.conf][:, 5].astype(int):
                    self.matrix[dc, self.nc] += 1  # false positive
            return
        if detections is None or len(detections) == 0:
            for gc in gt_cls.astype(int):
                self.matrix[self.nc, gc] += 1  # missed
            return

        detections = detections[detections[:, 4] > self.conf]
        gt_classes = gt_cls.astype(int)
        det_classes = detections[:, 5].astype(int)
        iou = box_iou_matrix(gt_bboxes, detections[:, :4])

        x = np.where(iou > self.iou_thres)
        if x[0].size:
            matches = np.concatenate((np.stack(x, 1), iou[x][:, None]), 1)
            if x[0].size > 1:
                matches = matches[matches[:, 2].argsort()[::-1]]
                matches = matches[np.unique(matches[:, 1], return_index=True)[1]]
                matches = matches[matches[:, 2].argsort()[::-1]]
                matches = matches[np.unique(matches[:, 0], return_index=True)[1]]
        else:
            matches = np.zeros((0, 3))

        n = matches.shape[0] > 0
        m0, m1, _ = matches.transpose().astype(int)
        for i, gc in enumerate(gt_classes):
            j = m0 == i
            if n and j.sum() == 1:
                self.matrix[det_classes[m1[j]], gc] += 1  # correct
            else:
                self.matrix[self.nc, gc] += 1  # background FN
        for i, dc in enumerate(det_classes):
            if not (n and (m1 == i).any()):
                self.matrix[dc, self.nc] += 1  # background FP
