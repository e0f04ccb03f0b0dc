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


def plot_confusion_matrix(matrix: np.ndarray, names: dict, out: str | Path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 8))
    ax.imshow(matrix, cmap="Blues")
    ax.set_xlabel("true")
    ax.set_ylabel("predicted")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out
