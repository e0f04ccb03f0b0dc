"""Native (C++) host-side components, built on demand with g++.

The TPU compute path is Pallas/XLA; the host runtime keeps its hot
preprocessing stage native (the reference's equivalent is OpenCV C++).
Build is cached next to the source; absence of a compiler degrades
gracefully to the cv2 implementation.
"""

from __future__ import annotations

import hashlib
import subprocess
import sysconfig
from pathlib import Path

_DIR = Path(__file__).resolve().parent
_mod = None
_tried = False


def _build() -> Path | None:
    src = _DIR / "letterbox.cpp"
    tag = hashlib.sha1(src.read_bytes()).hexdigest()[:10]
    so = _DIR / f"_letterbox_native.{tag}.so"
    if so.exists():
        return so
    inc = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        f"-I{inc}", str(src), "-o", str(so),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so
    except Exception:
        return None


def get_letterbox_native():
    """Returns the compiled module or None (cv2 fallback)."""
    global _mod, _tried
    if _mod is not None or _tried:
        return _mod
    _tried = True
    so = _build()
    if so is None:
        return None
    import importlib.util

    spec = importlib.util.spec_from_file_location("_letterbox_native", so)
    m = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(m)
        _mod = m
    except Exception:
        _mod = None
    return _mod


def letterbox_native(img, size: int, pad_value: int = 114, swap_rb: bool = True):
    """img: HWC uint8 (BGR). Returns (out HWC uint8, ratio, (left, top)).

    ``swap_rb=True`` fuses the BGR->RGB conversion into the same pass.
    """
    import numpy as np

    m = get_letterbox_native()
    if m is None:
        raise RuntimeError("native letterbox unavailable (no compiler?)")
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    # the array itself is the buffer — no tobytes() copy
    out, ratio, left, top = m.letterbox(img, h, w, size, pad_value, swap_rb)
    arr = np.frombuffer(out, np.uint8).reshape(size, size, 3)
    return arr, ratio, (left, top)


def letterbox_native_batch(imgs, size: int, pad_value: int = 114,
                           swap_rb: bool = True, n_threads: int | None = None):
    """Batched fused letterbox: every image lands in its slice of ONE
    preallocated (N, size, size, 3) uint8 array, GIL released across the
    batch, images spread over a C++ thread pool.

    Returns (batch array, [(ratio, (left, top)), ...]).
    """
    import os

    import numpy as np

    m = get_letterbox_native()
    if m is None:
        raise RuntimeError("native letterbox unavailable (no compiler?)")
    arrs = [np.ascontiguousarray(im, dtype=np.uint8) for im in imgs]
    hws = [a.shape[:2] for a in arrs]
    out = np.empty((len(arrs), size, size, 3), np.uint8)
    nt = n_threads or min(len(arrs), os.cpu_count() or 1)
    meta = m.letterbox_batch(arrs, [tuple(map(int, hw)) for hw in hws], out,
                             size, pad_value, swap_rb, int(nt))
    return out, [(r, (left, top)) for r, left, top in meta]
