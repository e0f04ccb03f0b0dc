"""Validator curve plots + label panel (ref:utils/plotting.py parity)."""

from __future__ import annotations

import numpy as np


def test_val_curves_and_labels(tmp_path):
    from xlstm_yolo_tpu.utils.metrics import DetMetrics
    from xlstm_yolo_tpu.utils.plotting import (
        plot_confusion_matrix, plot_labels, plot_val_curves,
    )

    rng = np.random.default_rng(0)
    n = 200
    conf = rng.uniform(0.05, 1.0, n)
    pred_cls = rng.integers(0, 3, n)
    # make higher-conf predictions likelier TPs so curves are nontrivial
    tp = (rng.uniform(0, 1, (n, 10)) < conf[:, None] * 0.8)
    target_cls = rng.integers(0, 3, 150)
    names = {0: "a", 1: "b", 2: "c"}

    m = DetMetrics(names=names)
    m.process(tp, conf, pred_cls, target_cls)
    assert m.curves_results is not None
    x, p_curve, r_curve, f1_curve, prec_values = m.curves_results
    assert p_curve.shape == (3, 1000) and prec_values.shape == (3, 101)
    # recall is monotone non-increasing in the confidence threshold
    assert r_curve[:, 0].mean() >= r_curve[:, -1].mean()

    outs = plot_val_curves(m, tmp_path, names)
    assert len(outs) == 4 and all(p.exists() for p in outs)

    cm = np.zeros((4, 4), np.int64)
    cm[0, 0], cm[1, 2], cm[3, 1] = 10, 3, 2
    out = plot_confusion_matrix(cm, names, tmp_path / "cm.png")
    assert out.exists()

    out = plot_labels(rng.integers(0, 3, 50),
                      rng.uniform(0, 1, (50, 4)), names, tmp_path / "labels.png")
    assert out.exists()
