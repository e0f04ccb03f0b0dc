"""RT-DETR transformer modules vs the reference torch implementation."""

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


def _lin(sd, name):
    return {"kernel": np.ascontiguousarray(sd[name + ".weight"].T),
            "bias": np.asarray(sd[name + ".bias"])}


def test_msdeform_attn_golden(jaxm):
    """MSDeformAttn bilinear-gather sampling matches torch grid_sample
    (ref:nn/modules/transformer.py:218-309, utils.py:42-78)."""
    jax, jnp = jaxm
    from ultralytics.nn.modules.transformer import MSDeformAttn as TorchMSDA

    from xlstm_yolo_tpu.nn.transformer import MSDeformAttn

    d, nh, nl, npts = 64, 4, 3, 4
    tm = TorchMSDA(d_model=d, n_levels=nl, n_heads=nh, n_points=npts).eval()
    shapes = [(8, 8), (4, 4), (2, 2)]
    V = sum(h * w for h, w in shapes)
    B, Q = 2, 10
    query = torch.randn(B, Q, d)
    value = torch.randn(B, V, d)
    refer4 = torch.rand(B, Q, nl, 4) * 0.8 + 0.1
    with torch.no_grad():
        y_ref = tm(query, refer4, value, shapes).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = {p: _lin(sd, p) for p in
              ("sampling_offsets", "attention_weights", "value_proj",
               "output_proj")}
    fm = MSDeformAttn(d_model=d, n_levels=nl, n_heads=nh, n_points=npts)
    y = fm.apply({"params": jax.tree.map(jnp.asarray, params)},
                 jnp.asarray(query.numpy()), jnp.asarray(refer4.numpy()),
                 jnp.asarray(value.numpy()), shapes)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-5, rtol=1e-4)


def test_aifi_golden(jaxm):
    """AIFI encoder layer vs reference (ref:transformer.py:86-115)."""
    jax, jnp = jaxm
    from ultralytics.nn.modules.transformer import AIFI as TorchAIFI

    from xlstm_yolo_tpu.nn.transformer import AIFI

    c, nh, dff = 64, 4, 128
    tm = TorchAIFI(c, dff, nh, act=torch.nn.GELU()).eval()
    x = torch.randn(2, c, 6, 6)  # NCHW
    with torch.no_grad():
        y_ref = tm(x).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    # torch MultiheadAttention: in_proj (3C, C) packed; flax MHDPA per-head
    dh = c // nh
    wq, wk, wv = np.split(sd["ma.in_proj_weight"], 3, 0)
    bq, bk, bv = np.split(sd["ma.in_proj_bias"], 3, 0)

    def mh(w, b):  # (C, C)->(C, nh, dh)
        return {"kernel": np.ascontiguousarray(w.T.reshape(c, nh, dh)),
                "bias": b.reshape(nh, dh)}

    params = {
        "ma": {
            "query": mh(wq, bq), "key": mh(wk, bk), "value": mh(wv, bv),
            "out": {"kernel": np.ascontiguousarray(
                        sd["ma.out_proj.weight"].T.reshape(nh, dh, c)),
                    "bias": sd["ma.out_proj.bias"]},
        },
        "fc1": _lin(sd, "fc1"),
        "fc2": _lin(sd, "fc2"),
        "norm1": {"scale": sd["norm1.weight"], "bias": sd["norm1.bias"]},
        "norm2": {"scale": sd["norm2.weight"], "bias": sd["norm2.bias"]},
    }
    fm = AIFI(d_ffn=dff, num_heads=nh)
    y = fm.apply({"params": jax.tree.map(jnp.asarray, params)},
                 jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), y_ref,
                               atol=2e-4, rtol=1e-3)
