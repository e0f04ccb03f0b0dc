"""Numerics-check harness for kernel tests.

Parity: ref:mlstm_kernels/utils/test/checks.py:20 (check_correctness) —
float64 allclose with atol/rtol, error percentiles (p50/p90), max
absolute/relative diff logging, and per-(batch, head) diff-image
artifacts for visual numerics debugging. Used by the kernel tests and
available to scripts/tpu_parity.py for richer per-kernel records.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

__all__ = ["check_correctness", "save_diff_images"]


def check_correctness(candidate, baseline, atol: float = 1e-5,
                      rtol: float = 1e-4, name: str = "",
                      artifact_dir: str | Path | None = None,
                      verbose: bool = False) -> dict:
    """Compare candidate vs baseline in float64; return a metrics dict.

    Keys: allclose (bool), max_abs, max_rel, p50_abs, p90_abs, p99_abs,
    frac_close (fraction of elements within tolerance), n.
    When ``artifact_dir`` is given and the arrays are >= 2-D, writes a
    per-(batch, head) diff-image PNG (matplotlib; skipped if absent).
    """
    a = np.asarray(candidate, np.float64)
    b = np.asarray(baseline, np.float64)
    assert a.shape == b.shape, f"shape mismatch {a.shape} vs {b.shape}"
    d = np.abs(a - b)
    denom = np.maximum(np.abs(b), 1e-12)
    rel = d / denom
    tol = atol + rtol * np.abs(b)
    close = d <= tol
    out = {
        "name": name,
        "allclose": bool(close.all()),
        "max_abs": float(d.max()) if d.size else 0.0,
        "max_rel": float(rel.max()) if d.size else 0.0,
        "p50_abs": float(np.percentile(d, 50)) if d.size else 0.0,
        "p90_abs": float(np.percentile(d, 90)) if d.size else 0.0,
        "p99_abs": float(np.percentile(d, 99)) if d.size else 0.0,
        "frac_close": float(close.mean()) if d.size else 1.0,
        "n": int(d.size),
    }
    if verbose:
        print(f"check[{name}]: allclose={out['allclose']} "
              f"max_abs={out['max_abs']:.3e} max_rel={out['max_rel']:.3e} "
              f"p50={out['p50_abs']:.3e} p90={out['p90_abs']:.3e}")
    if artifact_dir is not None and a.ndim >= 2:
        save_diff_images(a, b, Path(artifact_dir), name or "check")
    return out


def save_diff_images(a: np.ndarray, b: np.ndarray, out_dir: Path,
                     name: str, max_images: int = 8) -> list[Path]:
    """Per-(batch, head) |diff| heatmap PNGs (ref checks.py PDF artifacts).

    Arrays are interpreted as (..., S, D): leading axes are flattened and
    the first ``max_images`` slices rendered. Silently no-ops when
    matplotlib is unavailable.
    """
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # pragma: no cover - matplotlib absent
        return []
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    d = np.abs(a - b)
    flat = d.reshape(-1, *d.shape[-2:]) if d.ndim > 2 else d[None]
    paths = []
    for i, img in enumerate(flat[:max_images]):
        fig, ax = plt.subplots(figsize=(6, 4))
        im = ax.imshow(img, aspect="auto", cmap="magma")
        fig.colorbar(im, ax=ax, label="|candidate - baseline|")
        ax.set_title(f"{name} slice {i} (max {img.max():.2e})")
        ax.set_xlabel("feature")
        ax.set_ylabel("position")
        p = out_dir / f"{name.replace(' ', '_')}_{i}.png"
        fig.savefig(p, dpi=110, bbox_inches="tight")
        plt.close(fig)
        paths.append(p)
    return paths
