"""Graph compiler + model forward tests (level 2 of the test pyramid)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xlstm_yolo_tpu.nn.tasks import build_detection_model, parse_model_specs, yaml_model_load

CFG_DIR = Path(__file__).resolve().parents[1] / "xlstm_yolo_tpu" / "cfg" / "models"
REF_CFG = Path("/root/reference/640-base192.yaml")


def test_parse_reference_yaml_unchanged():
    """The reference's own YAML must load through our compiler."""
    if not REF_CFG.exists():
        pytest.skip("reference tree not mounted")
    d = yaml_model_load(REF_CFG)
    specs, save, ch = parse_model_specs(d)
    assert len(specs) == 32
    assert specs[-1]["module"] == "v10Detect"
    assert specs[-1]["kwargs"]["ch"] == (192, 192, 192, 192)
    assert 2 in save and 12 in save and 21 in save


def test_parse_own_yaml_matches_reference():
    d_own = yaml_model_load(CFG_DIR / "vil-det-192.yaml")
    specs_own, save_own, ch_own = parse_model_specs(d_own)
    if REF_CFG.exists():
        d_ref = yaml_model_load(REF_CFG)
        specs_ref, save_ref, ch_ref = parse_model_specs(d_ref)
        assert [s["module"] for s in specs_own] == [s["module"] for s in specs_ref]
        assert ch_own == ch_ref
        assert save_own == save_ref


def test_full_model_shapes_eval_shape():
    """640px flagship graph: shape-only init (no FLOPs) validates wiring."""
    model, d = build_detection_model(CFG_DIR / "vil-det-192.yaml")
    x = jnp.zeros((1, 640, 640, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(model.init, rng, x)
    n_params = sum(
        int(np.prod(l.shape)) for l in jax.tree.leaves(shapes["params"])
    )
    assert n_params > 1e6
    out_sd = jax.eval_shape(
        lambda p, x: model.apply(p, x), shapes, x
    )
    y, aux = out_sd
    assert y.shape == (1, 300, 6)
    assert set(aux.keys()) == {"one2many", "one2one"}
    assert aux["one2one"][0].shape == (1, 80, 80, 144)  # 4*16 + 80


def test_tiny_model_forward_and_train_mode():
    model, d = build_detection_model(CFG_DIR / "vil-det-tiny.yaml")
    x = jnp.ones((2, 160, 160, 3), jnp.float32) * 0.5
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, x)
    y, aux = model.apply(variables, x)
    assert y.shape == (2, 300, 6)
    assert np.isfinite(np.asarray(y)).all()
    # scores in [0, 1], classes in [0, nc)
    assert float(y[..., 4].max()) <= 1.0 and float(y[..., 4].min()) >= 0.0
    assert float(y[..., 5].max()) < 80

    # training graph: same params, returns raw head dict + batch_stats updates
    model_t, _ = build_detection_model(CFG_DIR / "vil-det-tiny.yaml", training=True)
    out, mutated = model_t.apply(
        variables, x, mutable=["batch_stats"], rngs={"droppath": rng}
    )
    assert set(out.keys()) == {"one2many", "one2one"}
    assert len(out["one2many"]) == 3
    assert "batch_stats" in mutated


def test_train_eval_param_structure_identical():
    m_eval, _ = build_detection_model(CFG_DIR / "vil-det-tiny.yaml", training=False)
    m_train, _ = build_detection_model(CFG_DIR / "vil-det-tiny.yaml", training=True)
    x = jnp.zeros((1, 160, 160, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    s_eval = jax.eval_shape(m_eval.init, rng, x)
    s_train = jax.eval_shape(m_train.init, rng, x)
    assert jax.tree.structure(s_eval["params"]) == jax.tree.structure(s_train["params"])


@pytest.mark.slow
@pytest.mark.parametrize("name", ["640-base192.yaml", "640-base256.yaml", "640-base384.yaml"])
def test_all_reference_configs_compile(name):
    """All three shipped reference configs parse and shape-check."""
    p = Path("/root/reference") / name
    if not p.exists():
        pytest.skip("reference tree not mounted")
    model, d = build_detection_model(p)
    x = jnp.zeros((1, 640, 640, 3), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    y, aux = jax.eval_shape(lambda v, x: model.apply(v, x), shapes, x)
    assert y.shape == (1, 300, 6)
    assert len(aux["one2one"]) == 4
