"""TTA (_predict_augment parity): scales+flip merge along anchors.

Parity: ref:ultralytics/nn/tasks.py:376-413 — scales (1, 0.83, 0.67),
lr-flip on the middle pass, descale, tail clipping, anchor concat; and
end2end models revert to single-scale.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from xlstm_yolo_tpu.nn.tasks import (
    build_detection_model,
    clip_augmented,
    descale_pred,
    predict_augment,
    scale_img,
)

CFG = Path(__file__).resolve().parents[1] / "xlstm_yolo_tpu" / "cfg" / "models" / "vil-det-tiny.yaml"


def _plain_detect_cfg():
    d = yaml.safe_load(CFG.read_text())
    d["head"][-1][2] = "Detect"  # v10Detect -> plain (non-end2end) head
    return d


def test_scale_img_shapes_and_pad():
    x = jnp.ones((1, 160, 160, 3), jnp.float32)
    assert scale_img(x, 1.0) is x
    y = scale_img(x, 0.67)
    assert y.shape == (1, 128, 128, 3)
    # padded region carries the reference's 0.447 fill
    assert np.allclose(np.asarray(y[0, 120, 120]), 0.447, atol=1e-6)


def test_descale_pred_lr_flip_roundtrip():
    p = jnp.asarray([[[30.0, 50.0, 10.0, 20.0, 0.9]]])  # (1, 1, 4+1) xywh
    out = descale_pred(p * jnp.asarray([0.5, 0.5, 0.5, 0.5, 1.0]), 3, 0.5, (160, 160))
    # x de-flipped against the original width, wh descaled
    np.testing.assert_allclose(np.asarray(out[0, 0]), [160 - 30, 50, 10, 20, 0.9], rtol=1e-6)


def test_clip_augmented_tail_drop():
    a0, a1, a2 = 525, 336, 336
    ys = [jnp.zeros((1, a0, 6)), jnp.zeros((1, a1, 6)), jnp.zeros((1, a2, 6))]
    c = clip_augmented(ys)
    assert c[0].shape[1] == a0 - a0 // 21
    assert c[1].shape[1] == a1
    assert c[2].shape[1] == a2 - (a2 // 21) * 16


def test_predict_augment_plain_detect():
    model, _ = build_detection_model(_plain_detect_cfg())
    x = jnp.linspace(0, 1, 1 * 160 * 160 * 3, dtype=jnp.float32).reshape(1, 160, 160, 3)
    variables = model.init(jax.random.PRNGKey(0), x)

    y_single, _ = model.apply(variables, x)  # (B, A, 4+nc) xywh
    y_tta, aux = jax.jit(lambda v, xi: predict_augment(model, v, xi))(variables, x)
    assert aux is None
    A0 = y_single.shape[1]
    nc = y_single.shape[-1] - 4
    assert y_tta.shape[0] == 1 and y_tta.shape[-1] == 4 + nc
    assert y_tta.shape[1] > A0  # merged anchors from three passes
    # the scale-1.0 unflipped pass is bitwise the single-scale prediction
    np.testing.assert_allclose(
        np.asarray(y_tta[:, : A0 - A0 // 21]),
        np.asarray(y_single[:, : A0 - A0 // 21]),
        rtol=5e-3, atol=1e-3,  # jit-vs-eager fusion reassociation noise
    )
    assert np.isfinite(np.asarray(y_tta)).all()


def test_predict_augment_end2end_reverts():
    model, _ = build_detection_model(CFG)  # v10Detect end2end
    x = jnp.zeros((1, 160, 160, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    y_ref, _ = model.apply(variables, x)
    y_tta, _ = predict_augment(model, variables, x)
    np.testing.assert_allclose(np.asarray(y_tta), np.asarray(y_ref), rtol=1e-6)
