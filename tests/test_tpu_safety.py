"""Known-faulting eval-shape guard (docs/KNOWN_ISSUES.md fault class)."""

import pytest

from xlstm_yolo_tpu.utils import tpu_safety


def test_guard_noop_on_cpu():
    # tests run on the CPU platform: guard must never engage
    assert tpu_safety.checked_eval_batch(16) == 16
    assert tpu_safety.checked_eval_batch(64, clamp=False) == 64


def test_guard_clamps_on_risky_runtime(monkeypatch):
    monkeypatch.setattr(tpu_safety, "on_risky_runtime", lambda: True)
    msgs = []
    assert tpu_safety.checked_eval_batch(16, log=msgs.append) == 8
    assert msgs and "KNOWN_ISSUES" in msgs[0]
    assert tpu_safety.checked_eval_batch(8, log=msgs.append) == 8
    assert len(msgs) == 1  # batch 8 is inside the envelope: silent
    with pytest.raises(ValueError):
        tpu_safety.checked_eval_batch(16, clamp=False)
    monkeypatch.setenv("XY_ALLOW_RISKY_EVAL", "1")
    assert tpu_safety.checked_eval_batch(16) == 16
