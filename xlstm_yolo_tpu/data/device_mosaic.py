"""Device-side mosaic-4: composite + scale/translate crop ON CHIP.

Prototype for the host-bound training pipeline (docs/E2E_TRAIN.md): on a
1-core host the full augmentation path feeds ~33 img/s while the device
step runs ~50 img/s.  Mosaic + the affine crop are the expensive host
transforms; moving them on-device leaves the host with decode +
letterbox only (measured 138 img/s on this rig — exp_host_pipeline's
"noaug" row).

TPU-native formulation (ref:ultralytics/data/augment.py:490 Mosaic +
:ref:`RandomPerspective` with the default detect hyps degrees=0,
shear=0, perspective=0 — i.e. scale+translate only):

- the 2S x 2S mosaic canvas is built GATHER-FREE: each tile is padded
  into its own 2S frame and aligned to the random center with
  ``jnp.roll`` (traced shifts lower to slice+concat, fixed shapes);
  wrap-around pixels land outside the tile's quadrant and are killed by
  the quadrant mask — no dynamic_update_slice clamping, no gather (the
  known-faulting op class on this runtime, docs/KNOWN_ISSUES.md);
- the random scale gain is BUCKETED into a static set of crop sizes
  (lax.switch over fixed dynamic_slice+resize branches) — one compiled
  program, the TPU-first replacement for cv2.warpAffine's free scale;
- labels ride the same integer offsets + crop affine in closed form.

Composable with data/device_augment.apply_device_aug (HSV + fliplr run
after the mosaic, as in the host pipeline order).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

f32 = jnp.float32


def _default_crops(S: int) -> tuple[int, ...]:
    """Static crop-size buckets covering the reference scale gain
    U(1-scale, 1+scale) at scale=0.5: gain = S / crop."""
    return (max(32, round(S / 1.4)), round(S / 1.1), round(S / 0.8),
            round(S / 0.55))


def mosaic4_device(imgs, boxes, cls, valid, key, *, scale: float = 0.5,
                   crop_sizes: tuple[int, ...] | None = None,
                   return_geom: bool = False):
    """Batched device mosaic-4.

    imgs (B, 4, S, S, C) uint8 pre-letterboxed tiles; boxes (B, 4, M, 4)
    xyxy in tile pixels; cls (B, 4, M); valid (B, 4, M) bool.
    Returns (img (B, S, S, C) uint8, boxes (B, 4M, 4), cls (B, 4M),
    valid (B, 4M)).
    """
    B, four, S, _, C = imgs.shape
    assert four == 4
    crops = crop_sizes or _default_crops(S)
    # keep only buckets inside the configured gain range
    lo, hi = 1.0 - scale, 1.0 + scale
    crops = tuple(c for c in crops if lo - 1e-6 <= S / c <= hi + 1e-6) or (S,)
    k1, k2, k3 = jax.random.split(key, 3)
    yc = jax.random.randint(k1, (B,), S // 2, 3 * S // 2 + 1)
    xc = jax.random.randint(jax.random.fold_in(k1, 1), (B,),
                            S // 2, 3 * S // 2 + 1)
    bucket = jax.random.randint(k2, (B,), 0, len(crops))

    def one(img4, yc_i, xc_i, bucket_i, key_i):
        S2 = 2 * S
        # tile origins so each corner touches the center (Mosaic._mosaic4)
        oy = jnp.stack([yc_i - S, yc_i - S, yc_i, yc_i])
        ox = jnp.stack([xc_i - S, xc_i, xc_i - S, xc_i])
        rows = jax.lax.broadcasted_iota(jnp.int32, (S2, S2), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (S2, S2), 1)
        canvas = jnp.full((S2, S2, C), 114, jnp.uint8)  # letterbox gray
        quads = (
            (rows < yc_i) & (cols < xc_i),
            (rows < yc_i) & (cols >= xc_i),
            (rows >= yc_i) & (cols < xc_i),
            (rows >= yc_i) & (cols >= xc_i),
        )
        for t in range(4):
            frame = jnp.pad(img4[t], ((0, S), (0, S), (0, 0)))
            placed = jnp.roll(frame, (oy[t], ox[t]), axis=(0, 1))
            # inside the quadrant but beyond the tile content: keep gray
            inside = ((rows >= oy[t]) & (rows < oy[t] + S)
                      & (cols >= ox[t]) & (cols < ox[t] + S))
            m = (quads[t] & inside)[..., None]
            canvas = jnp.where(m, placed, canvas)

        # scale+translate: random fixed-size crop -> resize to S
        def crop_branch(c):
            def f(_):
                max_start = S2 - c
                cy = jax.random.randint(key_i, (), 0, max_start + 1)
                cx = jax.random.randint(jax.random.fold_in(key_i, 1), (),
                                        0, max_start + 1)
                win = jax.lax.dynamic_slice(canvas, (cy, cx, 0), (c, c, C))
                out = jax.image.resize(win.astype(f32), (S, S, C), "bilinear")
                return out, cy.astype(f32), cx.astype(f32), jnp.float32(c)
            return f

        out, cy, cx, csz = jax.lax.switch(
            bucket_i, [crop_branch(c) for c in crops], None)
        return (jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8),
                oy.astype(f32), ox.astype(f32), cy, cx, csz)

    keys = jax.random.split(k3, B)
    img, oy, ox, cy, cx, csz = jax.vmap(one)(imgs, yc, xc, bucket, keys)

    # labels: tile offset, then crop affine x' = (x - cx) * S / csz
    off = jnp.stack([ox, oy, ox, oy], axis=-1)  # (B, 4, 4) xyxy order
    b = boxes.astype(f32) + off[:, :, None, :]
    g = (jnp.float32(S) / csz)[:, None, None]
    shift = jnp.stack([cx, cy, cx, cy], -1)[:, None, None, :]  # (B,1,1,4)
    b = (b - shift) * g[..., None]
    b = b.reshape(B, -1, 4)
    cls = cls.reshape(B, -1)
    valid = valid.reshape(B, -1)
    # clip + drop degenerate boxes (same candidates rule spirit:
    # augment.py box_candidates wh > 2px)
    b = jnp.clip(b, 0.0, float(S))
    wh_ok = ((b[..., 2] - b[..., 0] > 2.0) & (b[..., 3] - b[..., 1] > 2.0))
    if return_geom:
        geom = {"yc": yc, "xc": xc, "oy": oy, "ox": ox,
                "cy": cy, "cx": cx, "crop": csz}
        return img, b, cls, valid & wh_ok, geom
    return img, b, cls, valid & wh_ok
