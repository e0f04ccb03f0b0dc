"""Plotting utilities: labeled image grids, training curves.

Parity targets: ref:ultralytics/utils/plotting.py (plot_images,
plot_results) — matplotlib/cv2 host-side rendering.
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

from xlstm_yolo_tpu.engine.results import _color


def plot_images(
    images: np.ndarray,  # (B, H, W, 3) uint8 RGB
    cls: np.ndarray,  # (B, M)
    bboxes: np.ndarray,  # (B, M, 4) xyxy px
    mask: np.ndarray,  # (B, M) instance validity
    names: dict | None = None,
    fname: str | Path = "batch.jpg",
    max_subplots: int = 16,
    masks: np.ndarray | None = None,  # (B, M, Hm, Wm) binary, image/4 scale
    kpts: np.ndarray | None = None,  # (B, M, K, 3) px
):
    """Tile a batch with boxes (+ mask/keypoint overlays) into one
    annotated mosaic (parity: ref:utils/plotting.py plot_images — the
    labeled train-sample mosaics saved at train start)."""
    bs = min(len(images), max_subplots)
    n = int(np.ceil(bs**0.5))
    h, w = images.shape[1:3]
    grid = np.full((n * h, n * w, 3), 255, np.uint8)
    for i in range(bs):
        r, c = divmod(i, n)
        im = images[i][..., ::-1].copy()  # RGB -> BGR for cv2
        if masks is not None:
            overlay = im.copy()
            for j in range(masks.shape[1]):
                if not mask[i, j]:
                    continue
                m = cv2.resize(masks[i, j].astype(np.uint8), (w, h),
                               interpolation=cv2.INTER_NEAREST).astype(bool)
                overlay[m] = _color(int(cls[i, j]))
            im = cv2.addWeighted(im, 0.6, overlay, 0.4, 0)
        for j in range(bboxes.shape[1]):
            if not mask[i, j]:
                continue
            x1, y1, x2, y2 = bboxes[i, j].astype(int)
            cid = int(cls[i, j])
            cv2.rectangle(im, (x1, y1), (x2, y2), _color(cid), 2)
            label = (names or {}).get(cid, str(cid))
            cv2.putText(im, label, (x1, max(y1 - 3, 10)), cv2.FONT_HERSHEY_SIMPLEX,
                        0.4, _color(cid), 1)
            if kpts is not None:
                for kk, pt in enumerate(kpts[i, j]):
                    if pt.shape[-1] < 3 or pt[2] > 0:
                        cv2.circle(im, (int(pt[0]), int(pt[1])), 2, _color(kk), -1)
        grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = im
    cv2.imwrite(str(fname), grid)
    return fname


def plot_results(csv_path: str | Path, out: str | Path | None = None):
    """Training curves from results.csv (loss + metric columns)."""
    import csv as _csv

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = list(_csv.DictReader(open(csv_path)))
    if not rows:
        return None
    keys = [k for k in rows[0] if k != "epoch"]
    epochs = [int(float(r["epoch"])) for r in rows]
    ncols = min(4, len(keys))
    nrows = -(-len(keys) // ncols)
    fig, axes = plt.subplots(nrows, ncols, figsize=(4 * ncols, 3 * nrows), squeeze=False)
    for ax, k in zip(axes.flat, keys):
        vals = [float(r[k] or "nan") for r in rows]
        ax.plot(epochs, vals, marker=".")
        ax.set_title(k, fontsize=9)
    for ax in axes.flat[len(keys):]:
        ax.axis("off")
    out = out or Path(csv_path).with_name("results.png")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def plot_confusion_matrix(matrix: np.ndarray, names: dict, out: str | Path,
                          normalize: bool = True):
    """Annotated confusion matrix (parity: ref:utils/metrics.py
    ConfusionMatrix.plot): class tick labels (+background row/col) and
    per-cell counts; optional column normalization."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    m = np.asarray(matrix, np.float64)
    if normalize:
        m = m / (m.sum(0, keepdims=True) + 1e-9)
    n = m.shape[0]
    labels = [str(names.get(i, i)) for i in range(n - 1)] + ["background"]
    fig, ax = plt.subplots(figsize=(max(6, n * 0.5), max(6, n * 0.5)))
    ax.imshow(m, cmap="Blues")
    if n <= 30:  # annotate cells like the reference's seaborn heatmap
        for i in range(n):
            for j in range(n):
                v = m[i, j]
                if v > 0:
                    ax.text(j, i, f"{v:.2f}" if normalize else f"{int(v)}",
                            ha="center", va="center", fontsize=7,
                            color="white" if v > m.max() * 0.6 else "black")
        ax.set_xticks(range(n))
        ax.set_yticks(range(n))
        ax.set_xticklabels(labels, rotation=90, fontsize=7)
        ax.set_yticklabels(labels, fontsize=7)
    ax.set_xlabel("true")
    ax.set_ylabel("predicted")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def plot_pr_curve(px, py, ap, names: dict, out: str | Path,
                  ap_class_index=None):
    """Per-class PR curves + mAP@0.5 mean (parity: ref:utils/metrics.py
    plot_pr_curve).  px: (101,) recall grid; py: (nc, 101) precision."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    py = np.asarray(py)
    fig, ax = plt.subplots(figsize=(9, 6))
    ids = ap_class_index if ap_class_index is not None else range(len(py))
    if len(py) <= 20:
        for row, ci, a in zip(py, ids, np.asarray(ap).reshape(len(py), -1)):
            ax.plot(px, row, lw=1,
                    label=f"{names.get(int(ci), ci)} {a[0]:.3f}")
    else:
        ax.plot(px, py.T, lw=1, color="grey", alpha=0.4)
    mean = py.mean(0)
    a50 = float(np.asarray(ap).reshape(len(py), -1)[:, 0].mean()) if len(py) else 0.0
    ax.plot(px, mean, lw=3, color="blue", label=f"all classes {a50:.3f} mAP@0.5")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(fontsize=8, loc="lower left")
    ax.set_title("Precision-Recall Curve")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def plot_mc_curve(px, py, out: str | Path, names: dict | None = None,
                  xlabel: str = "Confidence", ylabel: str = "Metric",
                  ap_class_index=None):
    """Metric-confidence curves (F1/P/R vs conf) with the smoothed mean
    and its argmax marker (parity: ref:utils/metrics.py plot_mc_curve)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from xlstm_yolo_tpu.utils.metrics import smooth

    py = np.asarray(py)
    fig, ax = plt.subplots(figsize=(9, 6))
    ids = ap_class_index if ap_class_index is not None else range(len(py))
    if len(py) <= 20:
        for row, ci in zip(py, ids):
            ax.plot(px, row, lw=1, label=str((names or {}).get(int(ci), ci)))
    else:
        ax.plot(px, py.T, lw=1, color="grey", alpha=0.4)
    y = smooth(py.mean(0), 0.05)
    ax.plot(px, y, lw=3, color="blue",
            label=f"all classes {y.max():.2f} at {px[y.argmax()]:.3f}")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(fontsize=8)
    ax.set_title(f"{ylabel}-{xlabel} Curve")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def plot_val_curves(metrics, save_dir: str | Path, names: dict):
    """Render the validator's standard curve set from a processed
    DetMetrics (PR / F1 / P / R, like the reference's on_plot outputs)."""
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    if getattr(metrics, "curves_results", None) is None:
        return []
    x, p_curve, r_curve, f1_curve, prec_values = metrics.curves_results
    idx = metrics.ap_class_index
    outs = [
        plot_pr_curve(np.linspace(0, 1, 101), prec_values, metrics.all_ap,
                      names, save_dir / "PR_curve.png", idx),
        plot_mc_curve(x, f1_curve, save_dir / "F1_curve.png", names, "Confidence", "F1", idx),
        plot_mc_curve(x, p_curve, save_dir / "P_curve.png", names, "Confidence", "Precision", idx),
        plot_mc_curve(x, r_curve, save_dir / "R_curve.png", names, "Confidence", "Recall", idx),
    ]
    return outs


def plot_labels(cls: np.ndarray, boxes_xywh: np.ndarray, names: dict,
                out: str | Path):
    """Label-distribution panel at train start (parity:
    ref:utils/plotting.py plot_labels): class histogram, box xy/wh
    scatters."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cls = np.asarray(cls).astype(int).ravel()
    b = np.asarray(boxes_xywh, np.float32).reshape(-1, 4)
    fig, axes = plt.subplots(2, 2, figsize=(8, 8))
    nc = int(cls.max()) + 1 if len(cls) else 1
    counts = np.bincount(cls, minlength=nc)
    axes[0, 0].bar(range(nc), counts)
    axes[0, 0].set_ylabel("instances")
    if nc <= 30:
        axes[0, 0].set_xticks(range(nc))
        axes[0, 0].set_xticklabels(
            [str(names.get(i, i)) for i in range(nc)], rotation=90, fontsize=7)
    axes[0, 1].hist2d(b[:, 0], b[:, 1], bins=50) if len(b) else None
    axes[0, 1].set_xlabel("x")
    axes[0, 1].set_ylabel("y")
    axes[1, 0].hist2d(b[:, 2], b[:, 3], bins=50) if len(b) else None
    axes[1, 0].set_xlabel("width")
    axes[1, 0].set_ylabel("height")
    axes[1, 1].axis("off")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out
