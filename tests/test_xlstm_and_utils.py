"""Tests: xLSTM LM stack, on-device NMS, CLI parsing, checks, converters."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_slstm_cell_shapes_and_state():
    from xlstm_yolo_tpu.nn.xlstm import sLSTMCell

    cell = sLSTMCell(dim=32, num_heads=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 10, 32)), jnp.float32)
    v = cell.init(jax.random.PRNGKey(0), x)
    y, state = cell.apply(v, x)
    assert y.shape == (2, 10, 32)
    assert np.isfinite(np.asarray(y)).all()
    h, c, n, m = state
    assert h.shape == (2, 4, 8)

    # stepwise == full-sequence (stateful consistency)
    y1, s1 = cell.apply(v, x[:, :5])
    y2, s2 = cell.apply(v, x[:, 5:], s1)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2], 1)), np.asarray(y), atol=1e-5, rtol=1e-4
    )


def test_xlstm_block_stack_mixed():
    from xlstm_yolo_tpu.nn.xlstm import xLSTMBlockStack

    stack = xLSTMBlockStack(dim=32, num_blocks=3, slstm_at=(1,), chunk_size=8,
                            qkv_block_size=16)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 32)), jnp.float32)
    v = stack.init(jax.random.PRNGKey(0), x)
    y = stack.apply(v, x)
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()


def test_xlstm_large_generate():
    from xlstm_yolo_tpu.nn.xlstm import generate, xLSTMLarge

    lm = xLSTMLarge(vocab_size=50, dim=32, num_blocks=2)
    tokens = jnp.asarray([[1, 2, 3]])
    v = lm.init(jax.random.PRNGKey(0), tokens)
    out = generate(lm, v, tokens[0], max_new_tokens=4)
    assert out.shape == (1, 7)
    assert int(out.max()) < 50


def test_nms_jax_suppresses_overlaps():
    from xlstm_yolo_tpu.utils.ops import nms_jax, non_max_suppression

    boxes = jnp.asarray([
        [10, 10, 50, 50], [12, 12, 52, 52], [100, 100, 140, 150], [11, 11, 51, 51],
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    keep_idx, keep_ok = nms_jax(boxes, scores, iou_thres=0.5, max_out=4)
    kept = np.asarray(keep_idx)[np.asarray(keep_ok)]
    assert list(kept) == [0, 2]

    # batched multi-class path: boxes of different classes never suppress
    preds = jnp.zeros((1, 4, 4 + 3))
    preds = preds.at[0, 0].set(jnp.asarray([30, 30, 40, 40, 0.9, 0.0, 0.0]))
    preds = preds.at[0, 1].set(jnp.asarray([31, 31, 40, 40, 0.0, 0.8, 0.0]))  # cls 1 same spot
    out, ok = non_max_suppression(preds, conf_thres=0.1, iou_thres=0.5, max_det=4, nc=3)
    assert int(np.asarray(ok).sum()) == 2


def test_cli_parsing(monkeypatch, tmp_path):
    from xlstm_yolo_tpu.cfg import _coerce, get_cfg

    cfg = get_cfg(overrides={"imgsz": "320", "conf": "0.5", "save": "False"})
    assert cfg.imgsz == 320 and cfg.conf == 0.5 and cfg.save is False
    with pytest.raises(KeyError) as e:
        get_cfg(overrides={"imgzs": 320})
    assert "imgsz" in str(e.value)  # suggestion


def test_checks():
    from xlstm_yolo_tpu.utils.checks import check_imgsz, check_version

    assert check_imgsz(641) == 672
    assert check_imgsz([640, 480]) == [640, 480]
    assert check_version("0.4.30", ">=0.4.20")
    assert not check_version("0.4.10", ">=0.4.20")


def test_coco_converter(tmp_path):
    from xlstm_yolo_tpu.data.converter import convert_coco

    ann = {
        "images": [{"id": 1, "file_name": "im1.jpg", "width": 100, "height": 50}],
        "annotations": [
            {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "iscrowd": 0},
            {"image_id": 1, "category_id": 13, "bbox": [0, 0, 10, 10], "iscrowd": 0},
        ],
        "categories": [],
    }
    (tmp_path / "instances_val2017.json").write_text(json.dumps(ann))
    out = convert_coco(tmp_path, tmp_path / "out")
    txt = (out / "labels" / "val2017" / "im1.txt").read_text().splitlines()
    assert len(txt) == 2
    c0, cx, cy, w, h = txt[0].split()
    assert c0 == "0" and float(cx) == 0.2 and float(w) == 0.2
    assert txt[1].split()[0] == "11"  # cat 13 (stop sign) -> 80-index 11


def test_exporter_stablehlo(tmp_path):
    from types import SimpleNamespace

    from xlstm_yolo_tpu.engine.exporter import Exporter, load_stablehlo
    from xlstm_yolo_tpu.nn.tasks import build_detection_model

    cfg_tiny = Path(__file__).resolve().parents[1] / "xlstm_yolo_tpu/cfg/models/vil-det-tiny.yaml"
    model, _ = build_detection_model(cfg_tiny)
    img = jnp.zeros((1, 160, 160, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    args = SimpleNamespace(format="stablehlo", imgsz=160, batch=1)
    path = Exporter(args)({"model": model, "variables": variables}, out_dir=tmp_path)
    assert Path(path).exists() and Path(path).stat().st_size > 1000
    fn = load_stablehlo(path)
    y = fn(jnp.zeros((1, 160, 160, 3), jnp.uint8))
    assert np.asarray(y).shape == (1, 300, 6)


def test_generic_yolo_yaml_with_conv_zoo(tmp_path):
    """A conventional conv-based YOLO yaml (C3k2/SPPF/Detect) also compiles."""
    import yaml as _yaml

    from xlstm_yolo_tpu.nn.tasks import build_detection_model

    d = {
        "nc": 4,
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 2, "C3k2", [32, False]],
            [-1, 1, "Conv", [64, 3, 2]],
            [-1, 1, "C2f", [64, True]],
            [-1, 1, "SPPF", [64, 5]],
        ],
        "head": [
            [-1, 1, "nn.Upsample", [None, 2, "nearest"]],
            [[-1, 2], 1, "Concat", [1]],
            [-1, 1, "C3", [32]],
            [[5, 8], 1, "Detect", ["nc"]],
        ],
    }
    model, _ = build_detection_model(d)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    y, aux = model.apply(v, x)
    assert y.shape[0] == 1 and y.shape[-1] == 4 + 4  # xyxy/xywh + nc? -> 4 box + nc


def test_conv_bn_fusion_matches_eval():
    """fuse_variables-folded conv (fused=True module) == conv+BN eval."""
    from xlstm_yolo_tpu.nn.blocks import ConvBNAct
    from xlstm_yolo_tpu.utils.fuse import fuse_variables

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)

    m = ConvBNAct(c2=12, k=3, training=False)
    v = m.init(jax.random.PRNGKey(0), x)
    # give BN non-trivial stats/affines so the fold actually does work
    v = jax.tree.map(np.asarray, v)
    v["batch_stats"]["bn"]["mean"] = rng.normal(size=12).astype(np.float32) * 0.3
    v["batch_stats"]["bn"]["var"] = (rng.uniform(0.5, 2.0, 12)).astype(np.float32)
    v["params"]["bn"]["scale"] = rng.uniform(0.5, 1.5, 12).astype(np.float32)
    v["params"]["bn"]["bias"] = rng.normal(size=12).astype(np.float32) * 0.2

    y_ref = m.apply(jax.tree.map(jnp.asarray, v), x)

    fused_vars = fuse_variables(v)
    assert "bn" not in fused_vars["params"]
    mf = ConvBNAct(c2=12, k=3, fused=True)
    y_fused = mf.apply(jax.tree.map(jnp.asarray, fused_vars), x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref), atol=2e-5, rtol=1e-4)


def test_lsblock_fusion_with_biased_conv():
    """norm->fc1 folding must account for fc1's existing bias
    (b' = beta + (b0 - mean) * scale, ref:torch_utils.py:242)."""
    from xlstm_yolo_tpu.nn.blocks import LSBlock
    from xlstm_yolo_tpu.utils.fuse import fuse_variables

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)

    m = LSBlock(dim=16, training=False)
    v = jax.tree.map(np.asarray, m.init(jax.random.PRNGKey(0), x))
    v["params"]["fc1"]["bias"] = rng.normal(size=16).astype(np.float32)
    v["batch_stats"]["norm"]["mean"] = rng.normal(size=16).astype(np.float32) * 0.3
    v["batch_stats"]["norm"]["var"] = rng.uniform(0.5, 2.0, 16).astype(np.float32)
    v["params"]["norm"]["scale"] = rng.uniform(0.5, 1.5, 16).astype(np.float32)
    v["params"]["norm"]["bias"] = rng.normal(size=16).astype(np.float32) * 0.2

    y_ref = m.apply(jax.tree.map(jnp.asarray, v), x)
    fused_vars = fuse_variables(v)
    assert "norm" not in fused_vars["params"]
    y_fused = LSBlock(dim=16, fused=True).apply(jax.tree.map(jnp.asarray, fused_vars), x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref), atol=2e-5, rtol=1e-4)


def test_profiling_trace_harness(tmp_path):
    """jax.profiler trace capture writes an xplane artifact."""
    import jax
    import jax.numpy as jnp

    from xlstm_yolo_tpu.utils.profiling import annotate, profile_step, trace

    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    d = profile_step(f, x, logdir=tmp_path / "prof", iters=2)
    artifacts = list(Path(d).rglob("*.xplane.pb")) + list(Path(d).rglob("*.trace.json.gz"))
    assert artifacts, f"no trace artifacts under {d}"
    with trace(tmp_path / "prof2"):
        with annotate("one"):
            float(f(x))


def test_sequence_parallel_chunkwise_exact():
    """S sharded over the 8-device CPU mesh == single-device chunkwise
    (SURVEY §2.6 long-context design: tiny (C, n) states thread between
    shards; the recurrence is associative so sharding is exact)."""
    from jax.sharding import Mesh

    from xlstm_yolo_tpu.ops.mlstm_chunkwise import mlstm_siging_chunkwise
    from xlstm_yolo_tpu.parallel.sequence import sequence_parallel_chunkwise

    devs = np.array(jax.devices()[:8])
    assert devs.size == 8, "conftest must provide the 8-device CPU mesh"
    mesh = Mesh(devs, ("seq",))

    B, NH, S, DH = 2, 3, 512, 16
    r = np.random.default_rng(0)
    q, k, v = (jnp.asarray(r.normal(size=(B, NH, S, DH)), jnp.float32)
               for _ in range(3))
    i = jnp.asarray(r.normal(size=(B, NH, S)), jnp.float32)
    f = jnp.asarray(r.normal(size=(B, NH, S)) + 2.0, jnp.float32)

    ref = mlstm_siging_chunkwise(q, k, v, i, f, chunk_size=64)
    h = sequence_parallel_chunkwise(mesh, "seq", q, k, v, i, f, chunk_size=64)
    np.testing.assert_allclose(np.asarray(h), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
