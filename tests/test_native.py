"""Native C++ letterbox extension vs the cv2 reference path."""

import numpy as np
import pytest

from xlstm_yolo_tpu.data.augment import LetterBox
from xlstm_yolo_tpu.native import get_letterbox_native, letterbox_native


@pytest.mark.skipif(get_letterbox_native() is None, reason="no C++ toolchain")
def test_native_letterbox_matches_cv2():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)

    out_n, ratio_n, pad_n = letterbox_native(img, 320, swap_rb=False)
    out_c, ratio_c, pad_c = LetterBox((320, 320))(img)

    assert out_n.shape == out_c.shape == (320, 320, 3)
    assert abs(ratio_n - ratio_c[0]) < 1e-6
    assert pad_n == pad_c
    # padding areas identical
    assert (out_n[:pad_n[1]] == 114).all() and (out_c[:pad_c[1]] == 114).all()
    # bilinear content close to cv2's fixed-point bilinear (not bit-equal)
    diff = np.abs(out_n.astype(int) - out_c.astype(int))
    assert np.quantile(diff, 0.99) <= 3 and diff.mean() < 1.0


@pytest.mark.skipif(get_letterbox_native() is None, reason="no C++ toolchain")
def test_native_letterbox_rgb_swap():
    img = np.zeros((100, 200, 3), np.uint8)
    img[..., 0] = 200  # blue channel (BGR)
    out, _, (left, top) = letterbox_native(img, 128, swap_rb=True)
    center = out[64, 64]
    assert center[2] == 200 and center[0] == 0  # blue moved to last (RGB)


@pytest.mark.skipif(get_letterbox_native() is None, reason="no C++ toolchain")
def test_native_letterbox_batch_matches_per_image():
    from xlstm_yolo_tpu.native import letterbox_native_batch

    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            for h, w in [(48, 60), (100, 80), (64, 64), (31, 97)]]
    batch, meta = letterbox_native_batch(imgs, 96, swap_rb=True, n_threads=3)
    assert batch.shape == (4, 96, 96, 3) and batch.dtype == np.uint8
    for i, im in enumerate(imgs):
        one, r, pad = letterbox_native(im, 96, swap_rb=True)
        np.testing.assert_array_equal(one, batch[i])
        assert abs(meta[i][0] - r) < 1e-6 and tuple(meta[i][1]) == tuple(pad)


@pytest.mark.skipif(get_letterbox_native() is None, reason="no C++ toolchain")
def test_native_letterbox_batch_bad_inputs():
    from xlstm_yolo_tpu.native import letterbox_native_batch

    with pytest.raises(Exception):
        # shape list shorter than images -> clean error, no crash
        m = get_letterbox_native()
        m.letterbox_batch([np.zeros((4, 4, 3), np.uint8)], [], 
                          np.empty((1, 8, 8, 3), np.uint8), 8, 114, True, 1)
