"""Instance-aware augmentation: segments/keypoints stay geometrically
aligned with boxes through mosaic + affine + flips (VERDICT r2 item 3)."""

import random
from pathlib import Path

import numpy as np
import pytest
import yaml


def _write_seg_dataset(root: Path, n: int = 6, size: int = 160, max_inst: int = 2):
    import cv2

    (root / "images" / "train").mkdir(parents=True, exist_ok=True)
    (root / "labels" / "train").mkdir(parents=True, exist_ok=True)
    rng = random.Random(0)
    for i in range(n):
        img = np.full((size, size, 3), 80, np.uint8)
        lines = []
        for _ in range(rng.randint(1, max_inst)):
            cx, cy = rng.randint(40, size - 40), rng.randint(40, size - 40)
            r = rng.randint(15, 30)
            pts = np.array(
                [[cx, cy - r], [cx + r, cy + r // 2], [cx - r, cy + r // 2]], np.float32
            )
            cv2.fillPoly(img, [pts.astype(np.int32)], (0, 0, 255))
            poly = " ".join(f"{p / size:.4f}" for p in pts.reshape(-1))
            lines.append(f"0 {poly}")
        cv2.imwrite(str(root / "images" / "train" / f"{i}.jpg"), img)
        (root / "labels" / "train" / f"{i}.txt").write_text("\n".join(lines))
    (root / "data.yaml").write_text(yaml.safe_dump({
        "path": str(root), "train": "images/train", "val": "images/train",
        "names": {0: "tri"}, "nc": 1,
    }))
    return root / "data.yaml"


def _write_pose_dataset(root: Path, n: int = 6, size: int = 160, K: int = 4):
    import cv2

    (root / "images" / "train").mkdir(parents=True, exist_ok=True)
    (root / "labels" / "train").mkdir(parents=True, exist_ok=True)
    rng = random.Random(1)
    for i in range(n):
        img = np.full((size, size, 3), 60, np.uint8)
        w, h = rng.randint(30, 60), rng.randint(30, 60)
        x, y = rng.randint(5, size - 5 - w), rng.randint(5, size - 5 - h)
        cv2.rectangle(img, (x, y), (x + w, y + h), (255, 0, 0), -1)
        # keypoints at the 4 box corners, all visible
        kpts = [(x, y), (x + w, y), (x, y + h), (x + w, y + h)][:K]
        ks = " ".join(f"{kx / size:.4f} {ky / size:.4f} 2" for kx, ky in kpts)
        row = (
            f"0 {(x + w / 2) / size:.4f} {(y + h / 2) / size:.4f} "
            f"{w / size:.4f} {h / size:.4f} {ks}"
        )
        cv2.imwrite(str(root / "images" / "train" / f"{i}.jpg"), img)
        (root / "labels" / "train" / f"{i}.txt").write_text(row)
    (root / "data.yaml").write_text(yaml.safe_dump({
        "path": str(root), "train": "images/train", "val": "images/train",
        "names": {0: "box"}, "nc": 1,
        "kpt_shape": [K, 3], "flip_idx": [1, 0, 3, 2],
    }))
    return root / "data.yaml"


@pytest.fixture(scope="module")
def seg_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("segaug")
    _write_seg_dataset(root)
    return root


@pytest.fixture(scope="module")
def pose_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("poseaug")
    _write_pose_dataset(root)
    return root


def _make_ds(root, task, **kw):
    from xlstm_yolo_tpu.cfg import get_cfg
    from xlstm_yolo_tpu.data.dataset import YOLODataset

    cfg = get_cfg(overrides={"imgsz": 160, "max_targets": 16, "task": task,
                             "mosaic": 1.0, "fliplr": 0.5, "flipud": 0.5,
                             "degrees": 10.0, "scale": 0.5, "translate": 0.1})
    return YOLODataset(
        str(root / "images" / "train"), imgsz=160, task=task, augment=True,
        hyp=cfg, max_targets=16, **kw,
    )


def test_segments_track_boxes_through_augment(seg_root):
    ds = _make_ds(seg_root, "segment")
    rng = random.Random(3)
    checked = 0
    for trial in range(20):
        labels = ds.transforms(rng.randrange(len(ds)), rng)
        b, s = labels["bboxes"], labels["segments"]
        assert len(b) == len(s)
        for j in range(len(b)):
            # box re-derived from the transformed polygon must equal the
            # stored box (affine derives boxes FROM segments)
            x = s[j, :, 0].clip(0, 160)
            y = s[j, :, 1].clip(0, 160)
            np.testing.assert_allclose(
                [x.min(), y.min(), x.max(), y.max()], b[j], atol=1.5)
            checked += 1
    assert checked > 10


def test_masks_align_with_boxes_after_augment(seg_root):
    ds = _make_ds(seg_root, "segment")
    rng = random.Random(4)
    hits = 0
    for trial in range(10):
        sample = ds.get_sample(rng.randrange(len(ds)), rng)
        m = sample["mask"]
        if not m.any():
            continue
        masks, boxes = sample["masks"], sample["bboxes"]
        for j in np.nonzero(m)[0]:
            ys, xs = np.nonzero(masks[j])
            if len(xs) < 4:
                continue
            # mask extents (x4 mask->img scale) within ~2px+4 of the box
            bx = boxes[j]
            assert xs.min() * 4 >= bx[0] - 6 and xs.max() * 4 <= bx[2] + 6
            assert ys.min() * 4 >= bx[1] - 6 and ys.max() * 4 <= bx[3] + 6
            hits += 1
    assert hits > 3


def test_keypoints_track_boxes_through_augment(pose_root):
    ds = _make_ds(pose_root, "pose", kpt_shape=(4, 3), flip_idx=[1, 0, 3, 2])
    rng = random.Random(5)
    checked = 0
    for trial in range(20):
        labels = ds.transforms(rng.randrange(len(ds)), rng)
        b, k = labels["bboxes"], labels["keypoints"]
        assert k is not None and len(k) == len(b)
        for j in range(len(b)):
            vis = k[j, :, 2] > 0
            if vis.sum() < 4:
                continue
            # corner keypoints span the box (they ARE the box corners)
            kx, ky = k[j, vis, 0], k[j, vis, 1]
            np.testing.assert_allclose(
                [kx.min(), ky.min(), kx.max(), ky.max()], b[j], atol=2.0)
            checked += 1
    assert checked > 5


def test_pose_get_sample_and_collate(pose_root):
    ds = _make_ds(pose_root, "pose", kpt_shape=(4, 3), flip_idx=[1, 0, 3, 2])
    rng = random.Random(6)
    samples = [ds.get_sample(i, rng) for i in range(4)]
    batch = ds.collate(samples)
    assert batch["kpts"].shape == (4, 16, 4, 3)
    # at least one sample has a visible instance with visible kpts
    vis = batch["kpts"][batch["mask"]][..., 2]
    assert (vis > 0).any()
    # visible keypoints lie inside the canvas
    kp = batch["kpts"][batch["mask"]]
    inside = (kp[..., 0] >= -1) & (kp[..., 0] <= 161) & (kp[..., 1] >= -1) & (kp[..., 1] <= 161)
    assert inside[kp[..., 2] > 0].all()


def test_val_path_keypoints_letterboxed(pose_root):
    """Non-augment (val) path: kpts land inside the letterboxed box."""
    ds = _make_ds(pose_root, "pose", kpt_shape=(4, 3))
    ds.transforms = None  # force letterbox path
    rng = random.Random(7)
    s = ds.get_sample(0, rng)
    m = s["mask"]
    assert m.any()
    kp = s["kpts"][m][0]
    bx = s["bboxes"][m][0]
    vis = kp[:, 2] > 0
    assert vis.all()
    np.testing.assert_allclose(
        [kp[vis, 0].min(), kp[vis, 1].min(), kp[vis, 0].max(), kp[vis, 1].max()],
        bx, atol=2.0)
