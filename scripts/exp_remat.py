#!/usr/bin/env python
"""Does stage-1 remat pay for itself at train time?

ViLBlockPair remats blocks with S >= 80*80 during training (parity with
ref:ultralytics/nn/modules/vision_lstm/vision_lstm2.py checkpointing).
Remat re-runs the most expensive stage's forward inside the VJP, so if
batch-8 activations fit HBM anyway, turning it off removes a full extra
stage-1 forward (~11 ms, round-2 profile) from the 95 ms backward.

Runs exp_train_decomp's live-grad stage in subprocesses with
XY_CKPT_THRESH at the default (6400, remat ON at 640px) and effectively
off, and reports both. OOM in the off-variant is a clean verdict (keep
remat), not a fault.

Usage: python scripts/exp_remat.py [batch]
Writes /tmp/tpu_queue/remat.json
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PARTIAL = Path("/tmp/tpu_queue/train_decomp_partial.json")


def main():
    batch = sys.argv[1] if len(sys.argv) > 1 else "8"
    results = {"batch": int(batch)}
    for name, thresh in [("remat_on", "6400"), ("remat_off", "999999999")]:
        env = dict(os.environ, DECOMP_ONLY="grad,full", XY_CKPT_THRESH=thresh)
        PARTIAL.unlink(missing_ok=True)
        p = subprocess.run(
            [sys.executable, str(REPO / "scripts/exp_train_decomp.py"), batch],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        if p.returncode == 0 and PARTIAL.exists():
            got = json.loads(PARTIAL.read_text())
            results[name] = {k: got[k] for k in ("grad", "full") if k in got}
            shutil.copy(PARTIAL, PARTIAL.with_name(f"decomp_{name}.json"))
        else:
            tail = (p.stderr or p.stdout).strip().splitlines()[-8:]
            results[name] = {"rc": p.returncode, "tail": tail}
        print(f"RESULT {name}: {results[name]}", flush=True)

    out = Path("/tmp/tpu_queue/remat.json")
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
