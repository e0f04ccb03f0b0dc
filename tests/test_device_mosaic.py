"""Device mosaic-4 vs a numpy composition of the same geometry."""

import jax
import jax.numpy as jnp
import numpy as np

from xlstm_yolo_tpu.data.device_mosaic import mosaic4_device


def _np_canvas(img4, yc, xc, S, C):
    """Reference composition: 2S canvas, tiles cornered at (yc, xc),
    gray 114 elsewhere (the host Mosaic._mosaic4 semantics)."""
    canvas = np.full((2 * S, 2 * S, C), 114, np.uint8)
    oys = [yc - S, yc - S, yc, yc]
    oxs = [xc - S, xc, xc - S, xc]
    quad = [(0, yc, 0, xc), (0, yc, xc, 2 * S),
            (yc, 2 * S, 0, xc), (yc, 2 * S, xc, 2 * S)]
    for t in range(4):
        oy, ox = oys[t], oxs[t]
        y0, y1, x0, x1 = quad[t]
        ty0, ty1 = max(y0, oy), min(y1, oy + S)
        tx0, tx1 = max(x0, ox), min(x1, ox + S)
        if ty1 > ty0 and tx1 > tx0:
            canvas[ty0:ty1, tx0:tx1] = img4[t][ty0 - oy:ty1 - oy,
                                               tx0 - ox:tx1 - ox]
    return canvas


def test_mosaic4_pixels_and_boxes_exact():
    B, S, C, M = 3, 64, 3, 5
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (B, 4, S, S, C), np.uint8)
    xy = rng.uniform(4, S - 20, (B, 4, M, 2)).astype(np.float32)
    wh = rng.uniform(6, 18, (B, 4, M, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], -1)
    cls = rng.integers(0, 10, (B, 4, M)).astype(np.int32)
    valid = rng.uniform(size=(B, 4, M)) > 0.2

    # identity-gain bucket so crop -> resize is exact
    img, b, c, v, geom = mosaic4_device(
        jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(cls),
        jnp.asarray(valid), jax.random.PRNGKey(7), crop_sizes=(S,),
        return_geom=True)
    img, b, v = np.asarray(img), np.asarray(b), np.asarray(v)
    for i in range(B):
        yc, xc = int(geom["yc"][i]), int(geom["xc"][i])
        cy, cx = int(geom["cy"][i]), int(geom["cx"][i])
        canvas = _np_canvas(imgs[i], yc, xc, S, C)
        np.testing.assert_array_equal(img[i], canvas[cy:cy + S, cx:cx + S])
        # boxes: tile offset then crop shift (gain 1)
        want = boxes[i] + np.stack(
            [np.asarray(geom["ox"][i]), np.asarray(geom["oy"][i])] * 2,
            -1)[:, None, :]
        want = want - np.array([cx, cy, cx, cy], np.float32)
        want = np.clip(want.reshape(-1, 4), 0, S)
        np.testing.assert_allclose(b[i], want, atol=1e-4)
        wh_ok = (want[:, 2] - want[:, 0] > 2) & (want[:, 3] - want[:, 1] > 2)
        np.testing.assert_array_equal(v[i], valid[i].reshape(-1) & wh_ok)


def test_mosaic4_scaled_buckets_jit():
    B, S, C, M = 2, 64, 3, 4
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.integers(0, 255, (B, 4, S, S, C), np.uint8))
    boxes = jnp.asarray(rng.uniform(0, S - 10, (B, 4, M, 4)).astype(np.float32))
    cls = jnp.zeros((B, 4, M), jnp.int32)
    valid = jnp.ones((B, 4, M), bool)

    fn = jax.jit(lambda k: mosaic4_device(imgs, boxes, cls, valid, k))
    for seed in range(3):
        img, b, c, v = fn(jax.random.PRNGKey(seed))
        assert img.shape == (B, S, S, C) and img.dtype == jnp.uint8
        assert np.asarray(b).min() >= 0 and np.asarray(b).max() <= S
        assert np.isfinite(np.asarray(b)).all()
