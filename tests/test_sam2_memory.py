"""SAM2 memory modules vs the reference torch implementation (random
weights converted): MemoryAttention (RoPE self+cross attention with
object-pointer tokens excluded from rotation) and MemoryEncoder."""

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


def test_memory_attention_golden(jaxm):
    jax, jnp = jaxm
    from ultralytics.models.sam.modules.memory_attention import (
        MemoryAttention as TMA, MemoryAttentionLayer as TMAL,
    )

    from xlstm_yolo_tpu.models.sam.convert import convert_memory_attention
    from xlstm_yolo_tpu.models.sam.memory import MemoryAttention

    NLAYERS, B, C, MEMD = 2, 2, 256, 64
    T = 8 * 8          # current-frame tokens (square grid for RoPE)
    NMEM, NPTR = 3, 8  # 3 spatial memory frames + 8 obj-ptr tokens
    M = NMEM * T + NPTR

    tm = TMA(d_model=C, pos_enc_at_input=True,
             layer=TMAL(d_model=C, dim_feedforward=512, dropout=0.0),
             num_layers=NLAYERS).eval()

    curr = torch.randn(T, B, C)
    curr_pos = torch.randn(T, B, C)
    memory = torch.randn(M, B, MEMD)
    memory_pos = torch.randn(M, B, MEMD)
    with torch.no_grad():
        want = tm(curr, memory, curr_pos, memory_pos,
                  num_obj_ptr_tokens=NPTR)  # (T, B, C)

    fm = MemoryAttention(d_model=C, num_layers=NLAYERS, dim_feedforward=512,
                         mem_dim=MEMD)
    params = jax.tree.map(
        jnp.asarray,
        convert_memory_attention(
            {k: v.detach().numpy() for k, v in tm.state_dict().items()},
            num_layers=NLAYERS))
    got = fm.apply(
        {"params": params},
        jnp.asarray(curr.numpy().transpose(1, 0, 2)),
        jnp.asarray(memory.numpy().transpose(1, 0, 2)),
        curr_pos=jnp.asarray(curr_pos.numpy().transpose(1, 0, 2)),
        memory_pos=jnp.asarray(memory_pos.numpy().transpose(1, 0, 2)),
        num_obj_ptr_tokens=NPTR)
    np.testing.assert_allclose(
        np.asarray(got), want.numpy().transpose(1, 0, 2), atol=2e-4, rtol=2e-4)


def test_memory_encoder_golden(jaxm):
    jax, jnp = jaxm
    from ultralytics.models.sam.modules.encoders import MemoryEncoder as TME

    from xlstm_yolo_tpu.models.sam.convert import convert_memory_encoder
    from xlstm_yolo_tpu.models.sam.memory import MemoryEncoder

    tm = TME(out_dim=64, in_dim=256).eval()
    pix = torch.randn(2, 256, 16, 16)
    masks = torch.randn(2, 1, 256, 256)
    with torch.no_grad():
        want = tm(pix, masks)
    wfeat = want["vision_features"].numpy()          # (B, 64, 16, 16)
    wpos = want["vision_pos_enc"][-1].numpy()

    fm = MemoryEncoder(out_dim=64, in_dim=256)
    params = jax.tree.map(
        jnp.asarray,
        convert_memory_encoder(
            {k: v.detach().numpy() for k, v in tm.state_dict().items()}))
    feat, pos = fm.apply(
        {"params": params},
        jnp.asarray(pix.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(masks.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(feat).transpose(0, 3, 1, 2), wfeat,
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(pos).transpose(0, 3, 1, 2), wpos,
                               atol=1e-5, rtol=1e-5)
