"""Exporter round-trips (VERDICT r3 item 8: export formats in the suite).

Covers, on the tiny model so CPU stays fast:
- stablehlo: serialize -> deserialize -> numerically identical outputs
  (ref:ultralytics/engine/exporter.py:207 export dispatch);
- orbax / orbax_int8: checkpoint reload through AutoBackend with a
  bounded int8 dequantization error (ref:nn/autobackend.py:54);
- tflite: flatbuffer conversion + Interpreter reload when tensorflow is
  importable (ref:engine/exporter.py:1100), else skipped.
"""

from pathlib import Path
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xlstm_yolo_tpu.engine.exporter import Exporter, export_formats, load_stablehlo
from xlstm_yolo_tpu.nn.tasks import build_detection_model

CFG = Path(__file__).resolve().parents[1] / "xlstm_yolo_tpu" / "cfg" / "models" / "vil-det-tiny.yaml"
IMGSZ = 160


@pytest.fixture(scope="module")
def bundle():
    model, _ = build_detection_model(CFG, compute_dtype=jnp.float32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, IMGSZ, IMGSZ, 3), jnp.float32))
    return {"model": model, "variables": variables}


@pytest.fixture(scope="module")
def img():
    return np.asarray(
        jax.random.randint(jax.random.PRNGKey(1), (1, IMGSZ, IMGSZ, 3), 0, 255, jnp.uint8))


def _predict(bundle, img_u8):
    x = jnp.asarray(img_u8).astype(jnp.float32) / 255.0
    y, _ = bundle["model"].apply(bundle["variables"], x)
    return np.asarray(y)


def test_export_formats_table():
    fmts = {r["format"] for r in export_formats()}
    assert {"stablehlo", "orbax", "orbax_int8", "savedmodel", "tflite"} <= fmts


@pytest.mark.slow
def test_stablehlo_roundtrip(bundle, img, tmp_path):
    args = SimpleNamespace(format="stablehlo", imgsz=IMGSZ, batch=1)
    path = Exporter(args)(bundle, out_dir=tmp_path)
    assert Path(path).exists() and Path(path).stat().st_size > 1000
    fn = load_stablehlo(path)
    got = np.asarray(fn(jnp.asarray(img)))
    want = _predict(bundle, img)
    # recompiled program: fusion-order float drift only (pixel-scale boxes)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


@pytest.mark.slow
def test_orbax_roundtrip_via_autobackend(bundle, img, tmp_path):
    from xlstm_yolo_tpu.nn.autobackend import AutoBackend

    args = SimpleNamespace(format="orbax", imgsz=IMGSZ, batch=1)
    path = Exporter(args)(bundle, out_dir=tmp_path)
    backend = AutoBackend(path, model_cfg=CFG, imgsz=IMGSZ,
                          compute_dtype=jnp.float32)
    got = np.asarray(backend.forward(jnp.asarray(img)))
    want = _predict(bundle, img)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


@pytest.mark.slow
def test_orbax_int8_bounded_error(bundle, img, tmp_path):
    from xlstm_yolo_tpu.nn.autobackend import AutoBackend

    args = SimpleNamespace(format="orbax_int8", imgsz=IMGSZ, batch=1)
    path = Exporter(args)(bundle, out_dir=tmp_path)
    backend = AutoBackend(path, model_cfg=CFG, imgsz=IMGSZ,
                          compute_dtype=jnp.float32)
    got = np.asarray(backend.forward(jnp.asarray(img)))
    want = _predict(bundle, img)
    assert got.shape == want.shape
    # the test is the RELOAD path, not PTQ quality: a random-init model's
    # box decode is chaotic under 0.4% weight noise, so assert structure
    # (finite, valid class ids, conf in [0,1]) rather than box closeness;
    # the dequant error bound itself is covered by
    # test_quantize_tree_dequant_error_bound.
    assert np.isfinite(got).all()
    assert ((got[..., 5] >= 0) & (got[..., 5] < 80)).all()
    assert ((got[..., 4] >= 0) & (got[..., 4] <= 1)).all()


def test_quantize_tree_dequant_error_bound():
    from xlstm_yolo_tpu.utils.quantize import dequantize_tree, quantize_tree

    r = np.random.default_rng(0)
    params = {"dense": {"kernel": r.normal(size=(64, 32)).astype(np.float32),
                        "bias": r.normal(size=(32,)).astype(np.float32)}}
    deq = dequantize_tree(quantize_tree(params))
    k, dk = params["dense"]["kernel"], deq["dense"]["kernel"]
    # per-channel symmetric int8: max error <= scale/2 = max|w|/127/2 per column
    bound = np.abs(k).max(axis=0) / 127.0
    assert (np.abs(k - dk) <= bound[None, :] + 1e-7).all()
    np.testing.assert_allclose(deq["dense"]["bias"], params["dense"]["bias"],
                               atol=np.abs(params["dense"]["bias"]).max() / 126)


@pytest.mark.slow
def test_tflite_roundtrip(bundle, img, tmp_path):
    tf = pytest.importorskip("tensorflow")
    args = SimpleNamespace(format="tflite", imgsz=IMGSZ, batch=1)
    path = Exporter(args)(bundle, out_dir=tmp_path)
    interp = tf.lite.Interpreter(model_path=str(path))
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    interp.set_tensor(inp["index"], img)
    interp.invoke()
    got = interp.get_tensor(interp.get_output_details()[0]["index"])
    want = _predict(bundle, img)
    # float drift can swap near-tied rows at the top-k selection boundary;
    # require <1% of elements outside tolerance instead of all-close
    bad = ~np.isclose(got, want, atol=5e-3, rtol=2e-3)
    assert bad.mean() < 0.01, f"tflite deviates on {bad.mean():.1%} of elements"
