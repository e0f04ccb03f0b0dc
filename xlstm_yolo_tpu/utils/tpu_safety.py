"""Known-faulting program-shape guard for the remote-TPU runtime.

Certain *eval* program shapes deterministically crash the remote TPU
worker ("kernel fault"), wedging the chip for 5-15 minutes (sometimes
hours).  The fingerprints, established by bisection across rounds 1-3
(docs/KNOWN_ISSUES.md, scripts/repro/):

- batch >= 16 single-program eval of the flagship model (both the
  XLA-scan and Pallas kernel paths) — scripts/repro/batch16_eval_fault.py;
- padded-chunkwise native eval at batch >= 8 with non-power-of-two
  divisor chunk sizes — scripts/repro/padded_eval_fault.py;
- gather-style top-k postprocess co-compiled with Pallas custom calls at
  batch >= 8 — scripts/repro/pallas_gather_fault.py (the default
  gather-free ``topk_postprocess_matmul`` avoids this).

Training programs (incl. TAL top-k + Pallas bw) have never faulted, and
all batch-1 paths are safe.  This module centralizes the refusal so the
validator/bench fail with an actionable message INSTEAD of wedging the
worker.  The guard only engages on the affected runtime (platform
"tpu"/"axon" single-chip through the relay); CPU meshes and interpret
mode are untouched.  Override per-run with XY_ALLOW_RISKY_EVAL=1 (e.g.
on direct-attached hardware where the fault class may not exist).

No equivalent exists in the reference — this is runtime-defect armor,
part of the failure-detection story (SURVEY §5).
"""

from __future__ import annotations

import os

import jax

MAX_SAFE_EVAL_BATCH = 8


def on_risky_runtime() -> bool:
    """True when running on the TPU runtime that exhibits the fault class."""
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat not in ("cpu", "gpu")


def checked_eval_batch(batch: int, *, clamp: bool = True, log=None) -> int:
    """Validate an eval batch size against the known-faulting envelope.

    Returns a safe batch size (clamped to :data:`MAX_SAFE_EVAL_BATCH`)
    or raises ``ValueError`` when ``clamp=False``.  No-op off-runtime or
    with XY_ALLOW_RISKY_EVAL=1.
    """
    if batch <= MAX_SAFE_EVAL_BATCH:
        return batch
    if os.environ.get("XY_ALLOW_RISKY_EVAL") == "1" or not on_risky_runtime():
        return batch
    msg = (
        f"eval batch {batch} exceeds the validated envelope "
        f"({MAX_SAFE_EVAL_BATCH}) on this TPU runtime: batch>=16 eval "
        "programs deterministically crash the remote worker "
        "(docs/KNOWN_ISSUES.md, scripts/repro/batch16_eval_fault.py). "
    )
    if not clamp:
        raise ValueError(msg + "Set XY_ALLOW_RISKY_EVAL=1 to proceed anyway.")
    note = msg + f"Clamping to {MAX_SAFE_EVAL_BATCH}; XY_ALLOW_RISKY_EVAL=1 overrides."
    (log or print)(note)
    return MAX_SAFE_EVAL_BATCH
