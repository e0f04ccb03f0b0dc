"""SAM2 Hiera image encoder vs the reference torch implementation.

Random torch weights converted into the flax SAM2ImageEncoder
(ref:ultralytics/models/sam/modules/encoders.py:446-804) at a reduced
image size — the full trunk+neck pyramid, golden without checkpoints.
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


def test_sam2_hiera_encoder_golden(jaxm):
    jax, jnp = jaxm
    from ultralytics.models.sam.modules.encoders import (
        FpnNeck as TFpnNeck, Hiera as THiera, ImageEncoder as TImageEncoder,
    )

    from xlstm_yolo_tpu.models.sam.convert import convert_sam2_image_encoder
    from xlstm_yolo_tpu.models.sam.sam2_encoder import SAM2ImageEncoder

    stages = (1, 2, 3, 1)  # reduced sam2_t-like config
    dims = (32, 64, 128, 256)
    tm = TImageEncoder(
        trunk=THiera(embed_dim=dims[0], num_heads=1, stages=list(stages),
                     global_att_blocks=[4], window_spec=[8, 4, 14, 7],
                     window_pos_embed_bkg_spatial_size=[7, 7]),
        neck=TFpnNeck(d_model=256, backbone_channel_list=list(dims[::-1]),
                      fpn_top_down_levels=[2, 3], fpn_interp_model="nearest"),
        scalp=1,
    ).eval()
    # randomize the zero-init positional embeddings
    with torch.no_grad():
        tm.trunk.pos_embed.normal_(0, 0.02)
        tm.trunk.pos_embed_window.normal_(0, 0.02)

    x = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        want = tm(x)

    fm = SAM2ImageEncoder(
        embed_dim=dims[0], num_heads=1, stages=stages, global_att_blocks=(4,),
        window_spec=(8, 4, 14, 7), window_pos_embed_bkg_spatial_size=(7, 7),
        backbone_channel_list=tuple(dims[::-1]))
    params = convert_sam2_image_encoder(_t2n(tm.state_dict()), stages=stages)
    got = fm.apply({"params": jax.tree.map(jnp.asarray, params)},
                   jnp.asarray(x.permute(0, 2, 3, 1).numpy()))

    assert len(got["backbone_fpn"]) == len(want["backbone_fpn"]) == 3
    for g, w in zip(got["backbone_fpn"], want["backbone_fpn"]):
        wn = w.permute(0, 2, 3, 1).numpy()
        assert g.shape == wn.shape
        np.testing.assert_allclose(np.asarray(g), wn, atol=5e-4, rtol=5e-4)
    for g, w in zip(got["vision_pos_enc"], want["vision_pos_enc"]):
        np.testing.assert_allclose(
            np.asarray(g), w.permute(0, 2, 3, 1).numpy(), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got["vision_features"]),
        want["vision_features"].permute(0, 2, 3, 1).numpy(),
        atol=5e-4, rtol=5e-4)
