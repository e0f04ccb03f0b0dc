"""Feature-extraction API (hook-extractor + embed parity).

Parity: ref:vil_backbone.py (hook-based stage extractor) and
ref:ultralytics/nn/tasks.py:178-181 (BaseModel ``embed=``).
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from xlstm_yolo_tpu.nn.tasks import (
    build_detection_model,
    embed_features,
    extract_features,
)

CFG = Path(__file__).resolve().parents[1] / "xlstm_yolo_tpu" / "cfg" / "models" / "vil-det-tiny.yaml"


def test_extract_features_shapes_and_param_sharing():
    model, _ = build_detection_model(CFG)
    x = jnp.zeros((2, 160, 160, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    # FPN image-space taps: 7 (20x20), 8 (10x10), 9 (5x5) SequenceToImage
    feats = extract_features(CFG, variables, x, layers=(7, 8, 9))
    assert feats[7].shape == (2, 20, 20, 32)
    assert feats[8].shape == (2, 10, 10, 32)
    assert feats[9].shape == (2, 5, 5, 32)
    # a sequence-space tap pools over S
    emb = embed_features(CFG, variables, x, layers=(7, 9))
    assert emb.shape == (2, 64)
    np.testing.assert_allclose(
        np.asarray(emb[:, :32]), np.asarray(feats[7].mean(axis=(1, 2))), rtol=1e-6
    )
    assert np.isfinite(np.asarray(emb)).all()


def test_extract_jittable():
    model, _ = build_detection_model(CFG)
    x = jnp.zeros((1, 160, 160, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    f = jax.jit(lambda v, xi: extract_features(CFG, v, xi, layers=(9,)))
    out = f(variables, x)
    assert out[9].shape == (1, 5, 5, 32)
