"""Golden parity vs the reference torch fork running on CPU.

Level-2/3 tests per SURVEY.md §4: identical weights (converted torch ->
flax), identical inputs, compare activations.  The reference runs its
CPU native_autograd backend; we run the chunkwise jnp scan — the same
math through two independent implementations.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))
import ref_loader  # noqa: E402

if not ref_loader.REF.exists():
    pytest.skip("reference tree not mounted", allow_module_level=True)

ref_loader.load_reference()

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from xlstm_yolo_tpu.nn import layers as L  # noqa: E402
from xlstm_yolo_tpu.nn.tasks import build_detection_model  # noqa: E402
from xlstm_yolo_tpu.utils.torch_convert import convert_torch_state_dict  # noqa: E402

torch.manual_seed(0)


def torch_sd(module):
    return {k: v for k, v in module.state_dict().items()}


def test_matrix_lstm_cell_golden():
    from ultralytics.nn.modules.vision_lstm.vision_lstm2 import MatrixLSTMCell as TCell

    dim, nh, S, B = 64, 4, 25, 2
    tcell = TCell(dim=dim, num_heads=nh, chunk_size=16).eval()
    q = torch.randn(B, S, dim)
    k = torch.randn(B, S, dim)
    v = torch.randn(B, S, dim)
    with torch.no_grad():
        h_t = tcell(q, k, v).numpy()

    cell = L.MatrixLSTMCell(dim=dim, num_heads=nh, chunk_size=16, mode="train_with_padding")
    qj, kj, vj = (jnp.asarray(t.numpy()) for t in (q, k, v))
    variables = cell.init(jax.random.PRNGKey(0), qj, kj, vj)
    variables = convert_torch_state_dict(variables, torch_sd(tcell))
    h_j = np.asarray(cell.apply(variables, qj, kj, vj))
    np.testing.assert_allclose(h_j, h_t, atol=2e-4, rtol=1e-3)


def test_vil_block_pair_golden():
    from ultralytics.nn.modules.vision_lstm.vision_lstm2 import ViLBlockPair as TPair

    dim, S, B = 32, 64, 2
    tpair = TPair(dim=dim, seqlens=[8, 8], chunk_size=16, qkv_block_size=16,
                  num_blocks=None).eval()
    x = torch.randn(B, S, dim)
    with torch.no_grad():
        y_t = tpair(x).numpy()

    pair = L.ViLBlockPair(dim=dim, seqlens=(8, 8), chunk_size=16, qkv_block_size=16,
                          training=False)
    xj = jnp.asarray(x.numpy())
    variables = pair.init(jax.random.PRNGKey(0), xj)
    variables = convert_torch_state_dict(variables, torch_sd(tpair))
    y_j = np.asarray(pair.apply(variables, xj))
    np.testing.assert_allclose(y_j, y_t, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_full_model_golden_640():
    """Full 640-base192 graph: converted weights, same image, same boxes."""
    from ultralytics.nn.tasks import DetectionModel as TorchDetectionModel

    tm = TorchDetectionModel("/root/reference/640-base192.yaml", verbose=False).eval()

    rng = np.random.default_rng(7)
    img = rng.uniform(0, 1, size=(1, 640, 640, 3)).astype(np.float32)
    x_t = torch.from_numpy(img.transpose(0, 3, 1, 2))
    with torch.no_grad():
        y_t, aux_t = tm(x_t)
    y_t = y_t.numpy()

    model, _ = build_detection_model("/root/reference/640-base192.yaml")
    xj = jnp.asarray(img)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), xj)
    variables = convert_torch_state_dict(variables, torch_sd(tm), prefix="")
    variables = jax.tree.map(jnp.asarray, variables)
    y_j, aux_j = model.apply(variables, xj)
    y_j = np.asarray(y_j)

    # 1) raw one2one head maps must agree level by level (deterministic)
    for lvl, (mt, mj) in enumerate(zip(aux_t["one2one"], aux_j["one2one"])):
        mt = mt.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC
        mj = np.asarray(mj)
        np.testing.assert_allclose(
            mj, mt, atol=5e-3, rtol=1e-3, err_msg=f"one2one level {lvl}"
        )

    # 2) decoded detections: scores of the confident top-k agree
    def canon(y, k=50):
        order = np.argsort(-y[0, :, 4])[:k]
        return y[0, order]

    a, b = canon(y_j), canon(y_t)
    np.testing.assert_allclose(a[:, 4], b[:, 4], atol=2e-3)  # scores
    # boxes: compare where both picked the same anchor (ties can reorder)
    same = np.abs(a[:, 4] - b[:, 4]) < 1e-6
    close = np.abs(a[:, :4] - b[:, :4]).max(-1) < 0.5
    assert (close | ~same).mean() > 0.8
