"""SAM flax modules vs the reference torch implementation (random weights).

The reference ships its own SAM (ref:ultralytics/models/sam/modules/);
goldens convert random torch weights into the flax modules and compare
outputs — numerical parity without pretrained checkpoints.
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


def test_sam_vit_block_golden(jaxm):
    """Windowed + global ViT blocks with decomposed rel-pos
    (ref:models/sam/modules/blocks.py:877-1073)."""
    jax, jnp = jaxm
    from ultralytics.models.sam.modules.blocks import Block

    from xlstm_yolo_tpu.models.sam.convert import _lin, _ln, _mlp_block
    from xlstm_yolo_tpu.models.sam.modules import SamVitBlock

    for ws, hw in ((5, (12, 11)), (0, (12, 11))):
        tb = Block(dim=64, num_heads=2, use_rel_pos=True, window_size=ws,
                   input_size=hw if ws == 0 else (ws, ws)).eval()
        x = torch.randn(2, hw[0], hw[1], 64)
        with torch.no_grad():
            y_ref = tb(x).numpy()

        sd = _t2n(tb.state_dict())
        params = {
            "norm1": _ln(sd, "norm1"), "norm2": _ln(sd, "norm2"),
            "attn": {
                "qkv": _lin(sd, "attn.qkv"), "proj": _lin(sd, "attn.proj"),
                "rel_pos_h": sd["attn.rel_pos_h"],
                "rel_pos_w": sd["attn.rel_pos_w"],
            },
            "mlp": _mlp_block(sd, "mlp"),
        }
        fb = SamVitBlock(dim=64, num_heads=2, window_size=ws, input_size=hw)
        y = fb.apply({"params": jax.tree.map(jnp.asarray, params)},
                     jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-5, rtol=1e-4)


def test_sam_prompt_encoder_golden(jaxm):
    """Point/box/mask prompt embeddings (ref:encoders.py:165-377)."""
    jax, jnp = jaxm
    from ultralytics.models.sam.modules.encoders import PromptEncoder as TorchPE

    from xlstm_yolo_tpu.models.sam.convert import convert_prompt_encoder
    from xlstm_yolo_tpu.models.sam.modules import PromptEncoder

    tpe = TorchPE(embed_dim=32, image_embedding_size=(8, 8),
                  input_image_size=(64, 64), mask_in_chans=16).eval()
    pts = torch.rand(2, 3, 2) * 64
    labs = torch.tensor([[1, 0, -1], [1, 1, 0]])
    boxes = torch.rand(2, 1, 4) * 64
    masks = torch.randn(2, 1, 32, 32)
    with torch.no_grad():
        sp_ref, dn_ref = tpe((pts, labs), boxes, masks)
        dpe_ref = tpe.get_dense_pe().numpy()

    params = convert_prompt_encoder(_t2n(tpe.state_dict()))
    fpe = PromptEncoder(embed_dim=32, image_embedding_size=(8, 8),
                        input_image_size=(64, 64), mask_in_chans=16)
    vars_ = {"params": jax.tree.map(jnp.asarray, params)}
    sp, dn = fpe.apply(
        vars_, points=(jnp.asarray(pts.numpy()), jnp.asarray(labs.numpy())),
        boxes=jnp.asarray(boxes.numpy()),
        masks=jnp.asarray(masks.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(sp), sp_ref.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dn).transpose(0, 3, 1, 2),
                               dn_ref.numpy(), atol=2e-5, rtol=1e-4)
    dpe = fpe.apply(vars_, method=PromptEncoder.get_dense_pe)
    np.testing.assert_allclose(np.asarray(dpe).transpose(0, 3, 1, 2)[0],
                               dpe_ref[0] if dpe_ref.ndim == 4 else dpe_ref,
                               atol=2e-5, rtol=1e-4)


def test_sam_mask_decoder_golden(jaxm):
    """TwoWayTransformer + MaskDecoder (ref:decoders.py:11-174,
    transformer.py:12-263)."""
    jax, jnp = jaxm
    from ultralytics.models.sam.modules.decoders import MaskDecoder as TorchMD
    from ultralytics.models.sam.modules.transformer import TwoWayTransformer as TorchTT

    from xlstm_yolo_tpu.models.sam.convert import convert_mask_decoder
    from xlstm_yolo_tpu.models.sam.modules import MaskDecoder

    td = 32
    tmd = TorchMD(
        num_multimask_outputs=3,
        transformer=TorchTT(depth=2, embedding_dim=td, mlp_dim=64, num_heads=4),
        transformer_dim=td, iou_head_depth=3, iou_head_hidden_dim=16,
    ).eval()
    emb = torch.randn(1, td, 8, 8)
    pe = torch.randn(1, td, 8, 8)
    sparse = torch.randn(1, 3, td)
    dense = torch.randn(1, td, 8, 8)
    with torch.no_grad():
        m_ref, iou_ref = tmd(emb, pe, sparse, dense, multimask_output=True)

    params = convert_mask_decoder(_t2n(tmd.state_dict()))
    fmd = MaskDecoder(transformer_dim=td, tf_heads=4, tf_mlp_dim=64,
                      iou_head_hidden_dim=16)
    m, iou = fmd.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(emb.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(pe.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(sparse.numpy()),
        jnp.asarray(dense.numpy().transpose(0, 2, 3, 1)),
        multimask_output=True)
    np.testing.assert_allclose(np.asarray(m), m_ref.numpy(), atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(iou), iou_ref.numpy(), atol=5e-5, rtol=1e-3)


def test_sam_model_end_to_end_shapes(jaxm):
    """Tiny SAMModel: encoder + prompts -> masks, jittable."""
    jax, jnp = jaxm
    from xlstm_yolo_tpu.models.sam.modules import SAMModel

    m = SAMModel(img_size=64, embed_dim=32, depth=2, num_heads=2,
                 global_attn_indexes=(1,), prompt_embed_dim=32)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    pts = (jnp.asarray([[[20.0, 20.0]]]), jnp.asarray([[1]]))
    v = m.init(jax.random.PRNGKey(0), img, points=pts)
    masks, iou = jax.jit(
        lambda vv, im, p: m.apply(vv, im, points=p))(v, img, pts)
    assert masks.shape == (1, 3, 16, 16) and iou.shape == (1, 3)


def test_sam_predictor_interactive(jaxm):
    """SAMPredictor: encode-once / decode-many prompt loop on a tiny model."""
    jax, jnp = jaxm
    from xlstm_yolo_tpu.models.sam.modules import SAMModel
    from xlstm_yolo_tpu.models.sam.predict import SAMPredictor

    m = SAMModel(img_size=64, embed_dim=32, depth=2, num_heads=2,
                 global_attn_indexes=(1,), prompt_embed_dim=32)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    pts = (jnp.zeros((1, 8, 2)), -jnp.ones((1, 8), jnp.int32))
    v = m.init(jax.random.PRNGKey(0), img, points=pts)

    pred = SAMPredictor(m, v, max_points=8)
    im = (np.random.default_rng(0).uniform(0, 255, (48, 60, 3))).astype(np.uint8)
    pred.set_image(im)
    masks, iou = pred.predict(points=[[30, 24]])
    assert masks.shape == (3, 48, 60) and iou.shape == (3,)
    masks2, _ = pred.predict(box=[5, 5, 50, 40])
    assert masks2.shape == (3, 48, 60)
