"""SAM2 video path: decoder golden vs torch + batched propagation smoke.

The SAM2MaskDecoder is golden-tested against the reference with
converted random weights (both multimask and stability-fallback paths);
the video predictor is exercised end-to-end on synthetic features — the
memory bank must grow to steady state and keep producing finite,
fixed-shape outputs.
"""

import numpy as np
import pytest

import ref_loader

ref_loader.load_reference()

import torch  # noqa: E402

torch.manual_seed(0)


@pytest.fixture(scope="module")
def jaxm():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    return jax, jnp


@pytest.mark.parametrize("multimask", [True, False])
def test_sam2_mask_decoder_golden(jaxm, multimask):
    jax, jnp = jaxm
    from ultralytics.models.sam.modules.blocks import SAM2TwoWayTransformer
    from ultralytics.models.sam.modules.decoders import (
        SAM2MaskDecoder as TDec,
    )

    from xlstm_yolo_tpu.models.sam.convert import convert_sam2_mask_decoder
    from xlstm_yolo_tpu.models.sam.video import SAM2MaskDecoder

    td = 256
    tm = TDec(
        transformer_dim=td,
        transformer=SAM2TwoWayTransformer(depth=2, embedding_dim=td,
                                          mlp_dim=512, num_heads=8),
        use_high_res_features=True, iou_prediction_use_sigmoid=True,
        pred_obj_scores=True, pred_obj_scores_mlp=True,
        use_multimask_token_for_obj_ptr=True,
        dynamic_multimask_via_stability=True,
    ).eval()

    B, h, w = 2, 8, 8
    img = torch.randn(B, td, h, w)
    pe = torch.randn(1, td, h, w)
    sparse = torch.randn(B, 3, td)
    dense = torch.randn(B, td, h, w)
    s0 = torch.randn(B, td // 8, 4 * h, 4 * w)
    s1 = torch.randn(B, td // 4, 2 * h, 2 * w)
    with torch.no_grad():
        wm, wiou, wtok, wobj = tm(img, pe, sparse, dense, multimask,
                                  repeat_image=False,
                                  high_res_features=[s0, s1])

    fm = SAM2MaskDecoder(transformer_dim=td, tf_mlp_dim=512)
    params = jax.tree.map(
        jnp.asarray,
        convert_sam2_mask_decoder(
            {k: v.detach().numpy() for k, v in tm.state_dict().items()}))
    nhwc = lambda x: jnp.asarray(x.numpy().transpose(0, 2, 3, 1))  # noqa: E731
    gm, giou, gtok, gobj = fm.apply(
        {"params": params}, nhwc(img),
        jnp.asarray(pe.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(sparse.numpy()), nhwc(dense), multimask,
        high_res_features=(nhwc(s0), nhwc(s1)))
    np.testing.assert_allclose(np.asarray(gm), wm.numpy(), atol=2e-3,
                               rtol=2e-3)
    np.testing.assert_allclose(np.asarray(giou), wiou.numpy(), atol=2e-4,
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gtok), wtok.numpy(), atol=2e-4,
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gobj), wobj.numpy(), atol=2e-4,
                               rtol=2e-4)


def test_sam2_video_propagation_smoke(jaxm):
    jax, jnp = jaxm
    from xlstm_yolo_tpu.models.sam.video import SAM2Base, SAM2VideoPredictor

    S, C = 64, 256
    gh = gw = S // 16
    base = SAM2Base(image_size=S, num_maskmem=3, max_obj_ptrs_in_encoder=4)

    rng = jax.random.PRNGKey(0)
    bb = jax.random.normal(rng, (1, gh, gw, C), jnp.float32) * 0.1
    high = (jax.random.normal(rng, (1, 4 * gh, 4 * gw, C), jnp.float32),
            jax.random.normal(rng, (1, 2 * gh, 2 * gw, C), jnp.float32))
    variables = base.init(rng, bb, high)

    pred = SAM2VideoPredictor(base, variables)

    def feats(seed):
        k = jax.random.PRNGKey(seed)
        ks = jax.random.split(k, 4)
        return {
            "pix_feat": jax.random.normal(ks[0], (1, gh, gw, C)) * 0.1,
            "pos": jax.random.normal(ks[1], (1, gh, gw, C)) * 0.1,
            "s0": jax.random.normal(ks[2], (1, 4 * gh, 4 * gw, C // 8)) * 0.1,
            "s1": jax.random.normal(ks[3], (1, 2 * gh, 2 * gw, C // 4)) * 0.1,
        }

    NF, NOBJ = 6, 2
    state = pred.init_state(NF)
    pts = np.array([[[20.0, 20.0]], [[40.0, 44.0]]], np.float32)
    lab = np.ones((NOBJ, 1), np.int32)
    high0, score0 = pred.add_new_points(state, 0, feats(0), pts, lab)
    assert high0.shape == (NOBJ, 1, S, S) and np.isfinite(high0).all()

    outs = list(pred.propagate_in_video(state, [feats(t) for t in range(NF)]))
    assert [t for t, _, _ in outs] == list(range(1, NF))
    for t, high, score in outs:
        assert high.shape == (NOBJ, 1, S, S)
        assert score.shape == (NOBJ, 1)
        assert np.isfinite(high).all() and np.isfinite(score).all()
    # memory bank reached steady state: spatial memories capped at
    # num_maskmem and pointers at max_obj_ptrs_in_encoder
    mem, pos, nptr = pred._build_memory(state, NF)
    assert mem.shape[1] <= base.num_maskmem * gh * gw + nptr
    assert nptr <= base.max_obj_ptrs_in_encoder * (C // base.mem_dim)
