"""MobileSAM TinyViT encoder vs the reference torch implementation.

Random torch weights converted into the flax TinyViT
(ref:ultralytics/models/sam/modules/tiny_encoder.py) — numerical parity
without pretrained checkpoints, at a reduced img_size so CPU stays fast.
"""

import numpy as np
import pytest

import ref_loader

ref_loader.load_reference()

import torch  # noqa: E402

torch.manual_seed(0)


def _t2n(sd):
    return {k: v.detach().numpy() for k, v in sd.items()}


@pytest.fixture(scope="module")
def jaxm():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    return jax, jnp


def test_tiny_vit_encoder_golden(jaxm):
    jax, jnp = jaxm
    from ultralytics.models.sam.modules.tiny_encoder import TinyViT as TorchTinyViT

    from xlstm_yolo_tpu.models.sam.convert import convert_tiny_vit
    from xlstm_yolo_tpu.models.sam.tiny_encoder import TinyViT

    depths = (2, 2, 2, 2)  # reduced depth, full stage structure
    tm = TorchTinyViT(
        img_size=128, in_chans=3, num_classes=0,
        embed_dims=[16, 32, 40, 320], depths=list(depths),
        num_heads=[2, 2, 2, 10], window_sizes=[7, 7, 14, 7],
    ).eval()
    # randomize BN running stats so the conversion is actually exercised
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.6, 1.6)

    x = torch.randn(2, 3, 128, 128)
    with torch.no_grad():
        want = tm(x).permute(0, 2, 3, 1).numpy()  # NCHW -> NHWC

    fm = TinyViT(img_size=128, embed_dims=(16, 32, 40, 320), depths=depths,
                 num_heads=(2, 2, 2, 10), window_sizes=(7, 7, 14, 7))
    P, S = convert_tiny_vit(_t2n(tm.state_dict()), depths=depths)
    vars_ = {"params": jax.tree.map(jnp.asarray, P),
             "batch_stats": jax.tree.map(jnp.asarray, S)}
    got = np.asarray(fm.apply(vars_, jnp.asarray(x.permute(0, 2, 3, 1).numpy())))

    assert got.shape == want.shape == (2, 8, 8, 256)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_mobile_sam_end_to_end_shapes(jaxm):
    """build_sam('mobile_sam') random-init: full prompt->mask pipeline."""
    jax, jnp = jaxm
    from xlstm_yolo_tpu.models.sam.predict import build_sam

    model, _ = build_sam("mobile_sam", img_size=128)
    img = jnp.zeros((1, 128, 128, 3), jnp.float32)
    pts = jnp.asarray([[[32.0, 32.0]]])
    labs = jnp.ones((1, 1), jnp.int32)
    v = model.init(jax.random.PRNGKey(0), img, points=(pts, labs))
    masks, iou = model.apply(v, img, points=(pts, labs))
    assert masks.shape[0] == 1 and masks.shape[-2:] == (32, 32)
    assert iou.shape[0] == 1
