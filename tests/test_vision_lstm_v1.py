"""Goldens for the dormant reference modules: v1 VisionLSTM + YOLO-Head.

The reference's v1 ``vision_lstm.py`` is exported but broken upstream
(``SequenceConv2d`` used without import — NameError at construction);
``YOLO-Head.py`` is unimportable (dashed filename) and its final
``ResidualMLPHead``/``GatedMLPHead`` forwards hit a ``num_classes``
NameError.  These tests repair the reference in-memory (inject the
missing names) to obtain runnable oracles, then check our flax twins
against converted weights.
"""

import importlib.util
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

from xlstm_yolo_tpu.nn import exp_heads as EH  # noqa: E402
from xlstm_yolo_tpu.nn import vision_lstm_v1 as V1  # noqa: E402
from xlstm_yolo_tpu.utils.torch_convert import convert_torch_state_dict  # noqa: E402

torch.manual_seed(0)


def _torch_v1():
    """Import the reference v1 module, repairing its missing import."""
    import ultralytics.nn.modules.vision_lstm.vision_lstm as tv1
    from ultralytics.nn.modules.vision_lstm import vision_lstm_util as util

    if not hasattr(tv1, "SequenceConv2d"):
        tv1.SequenceConv2d = util.SequenceConv2d  # ref::773 uses it unimported
    if not getattr(tv1.MatrixLSTMCell, "_eps_patched", False):
        # ref::781-785 passes eps=1e-5 to a cell whose __init__ doesn't
        # accept it (TypeError upstream) — swallow the kwarg
        orig = tv1.MatrixLSTMCell.__init__

        def _init(self, dim, num_heads, norm_bias=True, eps=None):
            orig(self, dim=dim, num_heads=num_heads, norm_bias=norm_bias)

        tv1.MatrixLSTMCell.__init__ = _init
        tv1.MatrixLSTMCell._eps_patched = True
    return tv1


def _torch_heads():
    """Load YOLO-Head.py (dashed filename) under the reference package."""
    name = "ultralytics.nn.modules.vision_lstm.yolo_head_ref"
    if name in sys.modules:
        return sys.modules[name]
    # YOLO-Head.py:3 imports small_init_/wang_init_ from vision_lstm_util,
    # which doesn't define them (ImportError upstream) — lend it the v1
    # module's identical definitions
    from ultralytics.nn.modules.vision_lstm import vision_lstm_util as util

    tv1 = _torch_v1()
    if not hasattr(util, "small_init_"):
        util.small_init_ = tv1.small_init_
        util.wang_init_ = tv1.wang_init_
    path = ref_loader.REF / "ultralytics/nn/modules/vision_lstm/YOLO-Head.py"
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_vision_lstm_v1_classifier_golden():
    tv1 = _torch_v1()
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tm = tv1.VisionLSTM(
            dim=64, input_shape=(3, 32, 32), patch_size=8, depth=2,
            output_shape=(10,), mode="classifier", pooling="bilateral_avg",
        ).eval()
    torch.manual_seed(0)
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        y_t = tm(x).numpy()

    m = V1.VisionLSTMV1(
        dim=64, depth=2, patch_size=8, input_resolution=(32, 32),
        num_classes=10, training=False,
    )
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))  # NCHW -> NHWC
    variables = m.init(jax.random.PRNGKey(0), xj)
    variables = convert_torch_state_dict(variables, tm.state_dict())
    y_j = np.asarray(m.apply(variables, xj))
    np.testing.assert_allclose(y_j, y_t, atol=2e-4, rtol=1e-3)


def test_vision_lstm_v1_feature_mode():
    m = V1.VisionLSTMV1(
        dim=32, depth=2, patch_size=8, input_resolution=(32, 32),
        num_classes=None, mode=None, training=False,
    )
    x = jnp.ones((2, 32, 32, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (2, 16, 32)
    assert bool(jnp.isfinite(y).all())


def test_vil_layer_v1_backward_direction_golden():
    tv1 = _torch_v1()
    tl = tv1.ViLLayer(dim=32, direction=tv1.SequenceTraversal.ROWWISE_FROM_BOT_RIGHT).eval()
    torch.manual_seed(0)
    x = torch.randn(2, 16, 32)
    with torch.no_grad():
        y_t = tl(x).numpy()

    layer = V1.ViLLayerV1(dim=32, direction="rowwise_from_bot_right", training=False)
    xj = jnp.asarray(x.numpy())
    variables = layer.init(jax.random.PRNGKey(0), xj)
    variables = convert_torch_state_dict(variables, tl.state_dict())
    y_j = np.asarray(layer.apply(variables, xj))
    np.testing.assert_allclose(y_j, y_t, atol=2e-4, rtol=1e-3)


HEAD_CASES = [
    ("YOLOMLPHead", EH.YOLOMLPHead, {}),
    ("DeepMLPHead", EH.DeepMLPHead, {"num_hidden_layers": 2}),
    ("SeparatedMLPHead", EH.SeparatedMLPHead, {}),
    ("DETRMLPHead", EH.DETRMLPHead, {}),
    ("DINOMLPHead", EH.DINOMLPHead, {}),
    ("ResidualMLPHead", EH.ResidualMLPHead, {"num_residual_blocks": 2}),
    ("GatedMLPHead", EH.GatedMLPHead, {"num_hidden_layers": 1}),
]


@pytest.mark.parametrize("tname,cls,kw", HEAD_CASES, ids=[c[0] for c in HEAD_CASES])
def test_exp_head_golden(tname, cls, kw):
    mod = _torch_heads()
    # the final ResidualMLPHead/GatedMLPHead forwards read a bare
    # ``num_classes`` (module-global NameError upstream); inject it so
    # the oracle runs with the intended value
    mod.num_classes = 7
    th = getattr(mod, tname)(dim=48, num_classes=7, num_boxes=2,
                             hidden_dim=64, **kw).eval()
    # the final DeepMLPHead/SeparatedMLPHead defs never store
    # self.num_classes but read it in forward (AttributeError upstream)
    th.num_classes = 7
    torch.manual_seed(0)
    x = torch.randn(2, 9, 48)
    with torch.no_grad():
        y_t = th(x).numpy()

    m = cls(dim=48, num_classes=7, num_boxes=2, hidden_dim=64,
            training=False, **kw)
    xj = jnp.asarray(x.numpy())
    variables = m.init(jax.random.PRNGKey(0), xj)
    variables = convert_torch_state_dict(variables, th.state_dict())
    y_j = np.asarray(m.apply(variables, xj))
    assert y_j.shape == (2, 9, 2, 12)
    np.testing.assert_allclose(y_j, y_t, atol=1e-4, rtol=1e-4)
