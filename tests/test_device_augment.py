"""Device-side HSV + fliplr vs the host (cv2/numpy) augmentations."""

import random

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xlstm_yolo_tpu.data.device_augment import (
    apply_device_aug, device_fliplr, device_hsv,
)


@pytest.fixture
def imgs(rng):
    return rng.integers(0, 256, (4, 32, 48, 3), dtype=np.uint8)  # RGB


def test_device_fliplr_exact_vs_host(imgs, rng):
    from xlstm_yolo_tpu.data.augment import RandomFlip

    B, H, W, _ = imgs.shape
    boxes = np.stack([
        rng.uniform(0, W / 2, (B, 5)), rng.uniform(0, H / 2, (B, 5)),
        rng.uniform(W / 2, W, (B, 5)), rng.uniform(H / 2, H, (B, 5)),
    ], axis=-1).astype(np.float32)

    img_d, box_d = device_fliplr(jnp.asarray(imgs), jnp.asarray(boxes),
                                 jax.random.PRNGKey(0), p=1.0)  # always flip
    host = RandomFlip(p=1.0, direction="horizontal")
    for i in range(B):
        hb = {"bboxes": boxes[i].copy(),
              "segments": np.zeros((0, 0, 2), np.float32), "keypoints": None}
        him, hlab = host(imgs[i], hb, random.Random(0))
        np.testing.assert_array_equal(np.asarray(img_d[i]), him)
        np.testing.assert_allclose(np.asarray(box_d[i]), hlab["bboxes"],
                                   atol=1e-5)


def test_device_fliplr_per_sample_mask(imgs, rng):
    B, H, W, _ = imgs.shape
    boxes = np.tile(np.asarray([1.0, 2.0, 10.0, 20.0], np.float32),
                    (B, 3, 1))
    img_d, box_d = device_fliplr(jnp.asarray(imgs), jnp.asarray(boxes),
                                 jax.random.PRNGKey(3), p=0.5)
    flipped = np.asarray(img_d) != imgs
    per_sample = flipped.reshape(B, -1).any(1)
    assert 0 < per_sample.sum() < B  # both outcomes occur at p=0.5, B=4? no:
    # (p=0.5, B=4 can rarely be all/none — the key above is chosen so not)
    for i in range(B):
        if per_sample[i]:
            np.testing.assert_array_equal(np.asarray(img_d[i]), imgs[i, :, ::-1])
            np.testing.assert_allclose(
                np.asarray(box_d[i, 0]), [W - 10.0, 2.0, W - 1.0, 20.0], atol=1e-5)
        else:
            np.testing.assert_array_equal(np.asarray(img_d[i]), imgs[i])
            np.testing.assert_allclose(np.asarray(box_d[i, 0]), boxes[i, 0])


def test_device_hsv_matches_cv2_lut(imgs):
    """Same per-sample gains: device float HSV vs cv2's uint8 LUT path
    agree to quantization (<= 3 LSB, and only on a small fraction)."""
    r = np.asarray([[1.01, 1.3, 0.8],
                    [0.99, 0.6, 1.2],
                    [1.015, 1.7, 1.4],
                    [0.985, 0.3, 0.6]], np.float64)
    out_d = np.asarray(device_hsv(jnp.asarray(imgs), jax.random.PRNGKey(0),
                                  r=r)).astype(np.int32)
    for i in range(len(imgs)):
        bgr = imgs[i][..., ::-1]  # host path is BGR
        hue, sat, val = cv2.split(cv2.cvtColor(bgr, cv2.COLOR_BGR2HSV))
        x = np.arange(0, 256, dtype=r.dtype)
        lut_h = ((x * r[i, 0]) % 180).astype(np.uint8)
        lut_s = np.clip(x * r[i, 1], 0, 255).astype(np.uint8)
        lut_v = np.clip(x * r[i, 2], 0, 255).astype(np.uint8)
        im_hsv = cv2.merge((cv2.LUT(hue, lut_h), cv2.LUT(sat, lut_s),
                            cv2.LUT(val, lut_v)))
        want = cv2.cvtColor(im_hsv, cv2.COLOR_HSV2BGR)[..., ::-1].astype(np.int32)
        diff = np.abs(out_d[i] - want)
        # LUT tabulates rounded uint8 intermediates; the float path rounds
        # once — a few-LSB halo on a minority of pixels is expected
        assert np.median(diff) <= 1
        assert (diff > 6).mean() < 0.02, f"img {i}: {(diff > 6).mean():.3f} of px > 6 LSB"
        assert abs(out_d[i].mean() - want.mean()) < 2.0


def test_apply_device_aug_contract(imgs):
    batch = {
        "img": jnp.asarray(imgs),
        "bboxes": jnp.ones((4, 3, 4), jnp.float32) * 5,
        "cls": jnp.zeros((4, 3), jnp.int32),
        "mask": jnp.ones((4, 3), bool),
    }
    out = apply_device_aug(batch, jax.random.PRNGKey(1),
                           {"hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
                            "fliplr": 0.5})
    assert out["img"].dtype == jnp.uint8 and out["img"].shape == batch["img"].shape
    assert out["bboxes"].shape == batch["bboxes"].shape
    assert out["cls"] is batch["cls"] and out["mask"] is batch["mask"]
    # jit-compatible (it runs inside the train step)
    jitted = jax.jit(lambda b, k: apply_device_aug(b, k, {"fliplr": 0.5}))
    out2 = jitted(batch, jax.random.PRNGKey(2))
    assert out2["img"].shape == batch["img"].shape


def test_albumentations_hook_noop_and_stub(imgs, monkeypatch):
    """ref:data/augment.py:1737 hook: silent no-op without the package,
    applies the composed transform when importable."""
    from xlstm_yolo_tpu.data import augment as aug

    a = aug.Albumentations(p=1.0)
    assert a.transform is None  # package not in this env
    im0 = imgs[0]
    assert a(im0, random.Random(0)) is im0

    class FakeCompose:
        def __call__(self, image):
            return {"image": image + 1}

    a2 = aug.Albumentations(p=1.0)
    a2.transform = FakeCompose()
    out2 = a2(imgs[0].astype(np.int32), random.Random(0))
    np.testing.assert_array_equal(out2, imgs[0].astype(np.int32) + 1)
    a3 = aug.Albumentations(p=0.0)
    a3.transform = FakeCompose()
    im0 = imgs[0]
    assert a3(im0, random.Random(0)) is im0
