#!/usr/bin/env python
"""Host augmentation-pipeline throughput: can the loader feed the step?

The flat-opt train step runs at ~167 ms for batch 8 (~48 img/s on
device). The host side — decode + mosaic4 + RandomPerspective + HSV +
letterbox + collate across loader worker threads — must sustain that or
e2e training is host-bound (the reference leans on torch DataLoader
worker processes + pin_memory; ours is a thread pool,
data/build.py).

Builds a synthetic 640px COCO-like dataset on disk, then measures
loader img/s with augmentation on and off, at 1/4/8 workers.
CPU-only (no TPU risk). Writes /tmp/tpu_queue/host_pipeline.json
"""

from __future__ import annotations

import json
import random
import sys
import time
from pathlib import Path
from types import SimpleNamespace

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

N_IMGS = 64
IMGSZ = 640
BATCH = 8


def make_dataset(root: Path):
    import cv2
    import yaml

    (root / "images/train").mkdir(parents=True, exist_ok=True)
    (root / "labels/train").mkdir(parents=True, exist_ok=True)
    rng = random.Random(0)
    for i in range(N_IMGS):
        h, w = rng.choice([(480, 640), (640, 640), (426, 640)])
        img = (np.random.default_rng(i).integers(0, 255, (h, w, 3))).astype(np.uint8)
        lines = []
        for _ in range(rng.randint(3, 12)):
            bw, bh = rng.randint(20, 200), rng.randint(20, 200)
            x, y = rng.randint(0, w - bw - 1), rng.randint(0, h - bh - 1)
            lines.append(f"{rng.randint(0, 79)} {(x + bw / 2) / w:.4f} {(y + bh / 2) / h:.4f} {bw / w:.4f} {bh / h:.4f}")
        cv2.imwrite(str(root / f"images/train/{i:04d}.jpg"), img)
        (root / f"labels/train/{i:04d}.txt").write_text("\n".join(lines))
    (root / "data.yaml").write_text(yaml.safe_dump({
        "path": str(root), "train": "images/train", "val": "images/train",
        "nc": 80, "names": {i: str(i) for i in range(80)}}))
    return root / "data.yaml"


def main():
    import tempfile

    from xlstm_yolo_tpu.cfg import get_cfg
    from xlstm_yolo_tpu.data.build import build_dataloader, build_yolo_dataset
    from xlstm_yolo_tpu.data.dataset import check_det_dataset

    tmp = Path(tempfile.mkdtemp(prefix="hostpipe"))
    data_yaml = make_dataset(tmp)
    data = check_det_dataset(str(data_yaml))

    results = {}
    # cache modes (VERDICT r4 item 5): the profile says imread is ~46% of
    # the aug path — RAM/disk decode caches attack exactly that on any
    # core count.
    for augment, cache, label in ((True, False, "aug"),
                                  (True, "ram", "aug_ramcache"),
                                  (True, "disk", "aug_diskcache"),
                                  (False, False, "noaug")):
        args = get_cfg(None, {"imgsz": IMGSZ, "task": "detect",
                              "augment": augment, "cache": cache,
                              "mosaic": 1.0 if augment else 0.0,
                              "mixup": 0.0})
        ds = build_yolo_dataset(args, data["train"], BATCH, data,
                                mode="train" if augment else "val")
        for workers in (1, 4, 8):
            loader = build_dataloader(ds, BATCH, workers=workers, shuffle=True, seed=0)
            # warm one epoch (decode cache, thread spin-up)
            for b in loader._iter_epoch(0):
                pass
            t0 = time.perf_counter()
            n = 0
            for ep in (1, 2):
                for b in loader._iter_epoch(ep):
                    n += b["img"].shape[0]
            dt = time.perf_counter() - t0
            key = f"{label}_w{workers}"
            results[key] = round(n / dt, 1)
            print(f"RESULT {key}: {results[key]} img/s", flush=True)

    out = Path("/tmp/tpu_queue/host_pipeline.json")
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
