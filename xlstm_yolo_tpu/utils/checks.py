"""Environment / argument checks (parity: ref:ultralytics/utils/checks.py subset).

The reference's check suite is CUDA/pip-centric; the TPU-native set
verifies JAX backend health, image size divisibility, version parsing,
and dataset presence — with no network access assumed.
"""

from __future__ import annotations

import re
from pathlib import Path


def parse_version(v: str) -> tuple:
    return tuple(int(x) for x in re.findall(r"\d+", v)[:3] or [0])


def check_version(current: str, required: str = "", name: str = "version") -> bool:
    """'required' like '>=0.4.20' / '==1.2' / '1.2' (meaning >=)."""
    if not required:
        return True
    m = re.match(r"([<>=!]*)\s*([\d.]+)", required)
    op, ver = (m.group(1) or ">="), m.group(2)
    c, r = parse_version(current), parse_version(ver)
    ok = {
        ">=": c >= r, ">": c > r, "<=": c <= r, "<": c < r,
        "==": c == r, "!=": c != r,
    }[op if op in {">=", ">", "<=", "<", "==", "!="} else ">="]
    return ok


def check_imgsz(imgsz, stride: int = 32, min_dim: int = 1) -> int | list:
    """Round image size up to a stride multiple (checks.py check_imgsz)."""
    def fix(v):
        v = int(v)
        new = max(stride, -(-v // stride) * stride)
        return new

    if isinstance(imgsz, (list, tuple)):
        return [fix(v) for v in imgsz]
    return fix(imgsz)


def check_jax_backend(expect_accelerator: bool = False) -> str:
    import jax

    platform = jax.devices()[0].platform
    if expect_accelerator and platform == "cpu":
        raise RuntimeError("expected an accelerator backend but jax sees only CPU")
    return platform


def check_file(path: str | Path, hard: bool = True) -> str | None:
    p = Path(path)
    if p.exists():
        return str(p)
    if hard:
        raise FileNotFoundError(f"'{path}' does not exist")
    return None


def check_amp() -> bool:
    """bf16 sanity: matmul in bf16 must stay finite and close to fp32.

    The TPU analog of the reference's CUDA AMP check (checks.py /
    trainer.py:265) — no GradScaler exists here, so this is purely a
    numerics smoke test.
    """
    import jax.numpy as jnp
    import numpy as np

    a = jnp.linspace(-2, 2, 64 * 64).reshape(64, 64)
    f32 = np.asarray(a @ a)
    bf16 = np.asarray((a.astype(jnp.bfloat16) @ a.astype(jnp.bfloat16)).astype(jnp.float32))
    return bool(np.isfinite(bf16).all() and np.abs(bf16 - f32).max() / (np.abs(f32).max() + 1e-9) < 0.05)
