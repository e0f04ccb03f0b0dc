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
    mask: np.ndarray,  # (B, M)
    names: dict | None = None,
    fname: str | Path = "batch.jpg",
    max_subplots: int = 16,
):
    """Tile a batch with its boxes into one annotated mosaic image."""
    bs = min(len(images), max_subplots)
    n = int(np.ceil(bs**0.5))
    h, w = images.shape[1:3]
    grid = np.full((n * h, n * w, 3), 255, np.uint8)
    for i in range(bs):
        r, c = divmod(i, n)
        im = images[i][..., ::-1].copy()  # RGB -> BGR for cv2
        for j in range(bboxes.shape[1]):
            if not mask[i, j]:
                continue
            x1, y1, x2, y2 = bboxes[i, j].astype(int)
            cid = int(cls[i, j])
            cv2.rectangle(im, (x1, y1), (x2, y2), _color(cid), 2)
            label = (names or {}).get(cid, str(cid))
            cv2.putText(im, label, (x1, max(y1 - 3, 10)), cv2.FONT_HERSHEY_SIMPLEX,
                        0.4, _color(cid), 1)
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
