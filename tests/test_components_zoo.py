"""Conv zoo long tail + ViL extras + seg/pose heads: build/shape/fusion tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture
def x_img(rng):
    return jnp.asarray(rng.normal(size=(2, 16, 16, 64)), jnp.float32)


def test_conv_zoo_shapes(rng, x_img):
    from xlstm_yolo_tpu.nn import blocks as B

    cases = [
        (B.Focus(c2=32), (2, 8, 8, 32)),
        (B.GhostConv(c2=64, k=3), (2, 16, 16, 64)),
        (B.GhostBottleneck(c2=64), (2, 16, 16, 64)),
        (B.GhostBottleneck(c2=96, s=2), (2, 8, 8, 96)),
        (B.RepConv(c2=64), (2, 16, 16, 64)),
        (B.SCDown(c2=96), (2, 8, 8, 96)),
        (B.PSA(c2=64), (2, 16, 16, 64)),
    ]
    for mod, want in cases:
        v = mod.init(jax.random.PRNGKey(0), x_img)
        assert mod.apply(v, x_img).shape == want, type(mod).__name__


def test_repconv_deploy_fusion(rng, x_img):
    """Three-branch RepConv == single fused 3x3 conv (get_equivalent_kernel_bias
    parity, ref:nn/modules/conv.py:206-233)."""
    from xlstm_yolo_tpu.nn import blocks as B

    m = B.RepConv(c2=64, use_id_bn=True)
    v = jax.tree.map(np.asarray, m.init(jax.random.PRNGKey(1), x_img))
    for br in ("conv1", "conv2", "bn"):
        key = "bn" if br == "bn" else "bn"
        node = v["batch_stats"][br] if br == "bn" else v["batch_stats"][br]["bn"]
        node["mean"] = rng.normal(size=64).astype(np.float32) * 0.2
        node["var"] = rng.uniform(0.5, 2.0, 64).astype(np.float32)
    y_ref = m.apply(jax.tree.map(jnp.asarray, v), x_img)
    fused = B.repconv_fuse(v["params"], v["batch_stats"])
    y_f = B.RepConv(c2=64, deploy=True).apply(
        {"params": jax.tree.map(jnp.asarray, fused)}, x_img
    )
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref), atol=1e-4)


def test_vil_extras_shapes(rng):
    from xlstm_yolo_tpu.nn import vil_extras as V

    x = jnp.asarray(rng.normal(size=(2, 16, 32)), jnp.float32)
    lhe = V.LinearHeadwiseExpand(dim=32, num_heads=4, expand_factor=2)
    v = lhe.init(jax.random.PRNGKey(0), x)
    assert lhe.apply(v, x).shape == (2, 16, 64)
    # block-diagonal semantics: head h of the output only sees head h input
    w = np.asarray(v["params"]["weight"])  # (NH, d_out, d_in)
    xs = np.asarray(x)
    y = np.asarray(lhe.apply(v, x))
    manual = np.einsum("bsnd,nod->bsno", xs.reshape(2, 16, 4, 8), w).reshape(2, 16, 64)
    np.testing.assert_allclose(y, manual, atol=1e-5)

    pm = V.PatchMerge(input_seqlens=(4, 4), out_dim=64)
    vp = pm.init(jax.random.PRNGKey(0), x)
    assert pm.apply(vp, x).shape == (2, 4, 64)

    hv = V.HierarchicalVisionLSTM(
        resolution=(64, 64), patch_size=16, base_dim=32,
        num_groups=2, local_depth=1, num_classes=10,
    )
    img = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    vv = hv.init(jax.random.PRNGKey(0), img)
    assert hv.apply(vv, img).shape == (2, 10)


@pytest.mark.slow
def test_seg_pose_heads_and_losses(rng):
    """Tiny seg/pose configs build, losses are finite with nonzero grads
    (the 'one config trains a step' foundation check)."""
    import optax

    from xlstm_yolo_tpu.nn.tasks import build_detection_model
    from xlstm_yolo_tpu.utils.loss import v8_pose_loss, v8_segmentation_loss

    B, M = 2, 8
    img = jnp.zeros((B, 160, 160, 3), jnp.float32)
    key = jax.random.PRNGKey(0)
    gt_labels = jnp.zeros((B, M), jnp.int32)
    gt_bboxes = jnp.tile(jnp.asarray([10.0, 10.0, 80.0, 90.0]), (B, M, 1))
    mask_gt = jnp.ones((B, M), bool).at[:, 4:].set(False)

    m, _ = build_detection_model(
        "xlstm_yolo_tpu/cfg/models/vil-det-tiny-seg.yaml", training=True, nc=2
    )
    v = jax.jit(m.init)({"params": key, "droppath": key}, img)
    out, _ = m.apply(v, img, mutable=["batch_stats"], rngs={"droppath": key})
    Hm, Wm = out["proto"].shape[1:3]
    gt_masks = jnp.zeros((B, M, Hm, Wm)).at[:, :, 4:20, 4:16].set(1.0)
    strides = [160 / f.shape[1] for f in out["one2many"]]

    def seg_loss(params):
        o, _ = m.apply({"params": params, "batch_stats": v["batch_stats"]}, img,
                       mutable=["batch_stats"], rngs={"droppath": key})
        t, _, _ = v8_segmentation_loss(
            o, gt_labels, gt_bboxes, mask_gt, gt_masks, strides, img_size=160, nc=2)
        return t

    l, g = jax.value_and_grad(seg_loss)(v["params"])
    assert np.isfinite(float(l)) and float(optax.global_norm(g)) > 0

    mp, _ = build_detection_model(
        "xlstm_yolo_tpu/cfg/models/vil-det-tiny-pose.yaml", training=True, nc=2
    )
    vp = jax.jit(mp.init)({"params": key, "droppath": key}, img)
    gt_kpts = jnp.concatenate(
        [jax.random.uniform(key, (B, M, 17, 2)) * 160, jnp.ones((B, M, 17, 1))], -1
    )

    def pose_loss(params):
        o, _ = mp.apply({"params": params, "batch_stats": vp["batch_stats"]}, img,
                        mutable=["batch_stats"], rngs={"droppath": key})
        t, _, _ = v8_pose_loss(o, gt_labels, gt_bboxes, mask_gt, gt_kpts, strides, nc=2)
        return t

    lp, gp = jax.value_and_grad(pose_loss)(vp["params"])
    assert np.isfinite(float(lp)) and float(optax.global_norm(gp)) > 0


def test_mosaic9_and_copypaste(rng, tmp_path):
    import random

    import cv2
    import yaml

    from xlstm_yolo_tpu.cfg import get_cfg
    from xlstm_yolo_tpu.data.augment import CopyPaste, Mosaic
    from xlstm_yolo_tpu.data.dataset import YOLODataset

    (tmp_path / "images" / "train").mkdir(parents=True)
    (tmp_path / "labels" / "train").mkdir(parents=True)
    r = random.Random(0)
    for i in range(4):
        im = np.full((120, 160, 3), 90, np.uint8)
        cv2.rectangle(im, (20, 20), (60, 70), (0, 0, 255), -1)
        cv2.imwrite(str(tmp_path / "images" / "train" / f"{i}.jpg"), im)
        (tmp_path / "labels" / "train" / f"{i}.txt").write_text(
            "0 0.25 0.375 0.25 0.4167"
        )
    cfg = get_cfg(overrides={"imgsz": 128, "max_targets": 16})
    ds = YOLODataset(str(tmp_path / "images" / "train"), imgsz=128, augment=True,
                     hyp=cfg, max_targets=16, cache="disk")
    img9, lab9 = Mosaic(ds, 128, n=9)(0, r)
    b9 = lab9["bboxes"]
    assert img9.shape == (256, 256, 3)
    assert (b9[:, 2:] >= b9[:, :2]).all()

    im, lab = ds.load_for_mosaic(0, 128)
    i2, lab2 = CopyPaste(p=1.0)(im, lab, random.Random(1))
    assert len(lab2["bboxes"]) >= len(lab["bboxes"])
    # disk cache sidecar written and reused
    assert (tmp_path / "images" / "train" / "0.npy").exists()


def test_solutions_suite():
    """Queue/region/distance/gym/zone/analytics solutions on synthetic tracks."""
    from xlstm_yolo_tpu.solutions import (
        AIGym, Analytics, DistanceCalculation, QueueManager, RegionCounter,
        TrackZone,
    )

    tracks = np.array(
        [[10, 10, 30, 30, 1, 0.9, 0], [50, 50, 80, 90, 2, 0.8, 1]], np.float32
    )
    assert QueueManager(region=[(0, 0), (100, 0), (100, 100), (0, 100)]).update(tracks) == 2
    rc = RegionCounter(regions={
        "a": [(0, 0), (40, 0), (40, 40), (0, 40)],
        "b": [(40, 40), (100, 40), (100, 100), (40, 100)],
    })
    assert rc.update(tracks) == {"a": 1, "b": 1}

    dc = DistanceCalculation(px_per_meter=10)
    dc.select(1)
    dc.select(2)
    assert abs(dc.update(tracks) - 6.73) < 0.02

    g = AIGym("pushup")
    kp_up = np.zeros((17, 2)); kp_up[5] = [0, 0]; kp_up[7] = [10, 0]; kp_up[9] = [20, 0]
    kp_dn = kp_up.copy(); kp_dn[9] = [5, 5]
    g.update({1: kp_up}); g.update({1: kp_dn})
    assert g.update({1: kp_up})[1] == 1

    tz = TrackZone(region=[(0, 0), (40, 0), (40, 40), (0, 40)])
    assert len(tz.filter(tracks)) == 1

    a = Analytics()
    a.update(tracks)
    assert dict(a.totals()) == {0: 1, 1: 1}


def test_object_counter_line_and_region():
    """Directed line crossings + polygon entries on synthetic trajectories
    (parity: ref:solutions/object_counter.py count semantics)."""
    from xlstm_yolo_tpu.solutions import ObjectCounter

    def track_row(tid, cx, cy, cls=0):
        return np.array([[cx - 5, cy - 5, cx + 5, cy + 5, tid, 0.9, cls]], np.float32)

    # vertical line at x=50: track 1 crosses left->right, track 2 right->left
    oc = ObjectCounter(line=[(50, 0), (50, 100)], names={0: "car", 1: "bus"})
    for x in (20, 40, 60, 80):
        oc.update(track_row(1, x, 30, cls=0))
    for x in (80, 60, 40, 20):
        oc.update(track_row(2, x, 70, cls=1))
    assert (oc.in_count, oc.out_count) == (1, 1)
    assert oc.classwise_counts["car"]["IN"] + oc.classwise_counts["car"]["OUT"] == 1
    assert oc.classwise_counts["bus"]["IN"] + oc.classwise_counts["bus"]["OUT"] == 1
    im = oc.annotate(np.zeros((120, 120, 3), np.uint8))
    assert im.any()  # region + banner drawn

    # polygon region: a track entering the box counts once as IN
    oc2 = ObjectCounter(region=[(40, 40), (80, 40), (80, 80), (40, 80)])
    for x in (10, 30, 60):
        oc2.update(track_row(3, x, 60))
    assert oc2.in_count == 1 and oc2.out_count == 0
    # leaving again does not double-count the same track
    oc2.update(track_row(3, 90, 60))
    assert oc2.in_count + oc2.out_count == 1


def test_probiou_golden_vs_reference():
    """probiou matches the torch reference on random rotated boxes."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    import ref_loader

    if not ref_loader.REF.exists():
        pytest.skip("reference tree not mounted")
    ref_loader.load_reference()
    import torch
    from ultralytics.utils.metrics import probiou as t_probiou

    from xlstm_yolo_tpu.utils.metrics import probiou

    r = np.random.default_rng(3)
    a = np.concatenate(
        [r.uniform(0, 100, (64, 2)), r.uniform(2, 50, (64, 2)),
         r.uniform(-np.pi / 4, 3 * np.pi / 4, (64, 1))], -1).astype(np.float32)
    b = np.concatenate(
        [r.uniform(0, 100, (64, 2)), r.uniform(2, 50, (64, 2)),
         r.uniform(-np.pi / 4, 3 * np.pi / 4, (64, 1))], -1).astype(np.float32)
    want = t_probiou(torch.from_numpy(a), torch.from_numpy(b)).squeeze(-1).numpy()
    got = np.asarray(probiou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)

    from ultralytics.utils.ops import xywhr2xyxyxyxy as t_corners

    from xlstm_yolo_tpu.utils.tal import xywhr2xyxyxyxy

    want_c = t_corners(torch.from_numpy(a)).numpy()
    got_c = np.asarray(xywhr2xyxyxyxy(jnp.asarray(a)))
    np.testing.assert_allclose(got_c, want_c, atol=1e-4)


def test_obb_head_and_loss(rng):
    """Tiny OBB config builds; loss finite with nonzero grads."""
    import optax

    from xlstm_yolo_tpu.nn.tasks import build_detection_model
    from xlstm_yolo_tpu.utils.loss import v8_obb_loss

    B, M = 2, 8
    img = jnp.zeros((B, 160, 160, 3), jnp.float32)
    key = jax.random.PRNGKey(0)
    gt_labels = jnp.zeros((B, M), jnp.int32)
    gt_rboxes = jnp.tile(jnp.asarray([50.0, 50.0, 60.0, 30.0, 0.4]), (B, M, 1))
    mask_gt = jnp.ones((B, M), bool).at[:, 4:].set(False)

    m, _ = build_detection_model(
        "xlstm_yolo_tpu/cfg/models/vil-det-tiny-obb.yaml", training=True, nc=2
    )
    v = jax.jit(m.init)({"params": key, "droppath": key}, img)
    out, _ = m.apply(v, img, mutable=["batch_stats"], rngs={"droppath": key})
    assert set(out) == {"one2many", "angle"}
    strides = [160 / f.shape[1] for f in out["one2many"]]

    def loss(params):
        o, _ = m.apply({"params": params, "batch_stats": v["batch_stats"]}, img,
                       mutable=["batch_stats"], rngs={"droppath": key})
        t, _ = v8_obb_loss(o, gt_labels, gt_rboxes, mask_gt, strides, nc=2)
        return t

    l, g = jax.value_and_grad(loss)(v["params"])
    assert np.isfinite(float(l)) and float(optax.global_norm(g)) > 0

    # eval mode decodes (B, A, 4+nc+1)
    me, _ = build_detection_model(
        "xlstm_yolo_tpu/cfg/models/vil-det-tiny-obb.yaml", training=False, nc=2
    )
    y, aux = me.apply(v, img)
    assert y.shape[-1] == 4 + 2 + 1
    ang = np.asarray(y[..., -1])
    assert (ang >= -np.pi / 4 - 1e-3).all() and (ang <= 3 * np.pi / 4 + 1e-3).all()


def test_classify_head_and_loss(rng):
    import optax

    from xlstm_yolo_tpu.nn.tasks import build_detection_model
    from xlstm_yolo_tpu.utils.loss import v8_classification_loss

    img = jnp.asarray(rng.normal(size=(4, 160, 160, 3)), jnp.float32)
    key = jax.random.PRNGKey(0)
    m, _ = build_detection_model(
        "xlstm_yolo_tpu/cfg/models/vil-cls-tiny.yaml", training=True, nc=10
    )
    v = jax.jit(m.init)({"params": key, "droppath": key}, img)
    labels = jnp.asarray([0, 3, 7, 9], jnp.int32)

    def loss(params):
        logits, _ = m.apply({"params": params, "batch_stats": v["batch_stats"]}, img,
                            mutable=["batch_stats"], rngs={"droppath": key})
        t, _ = v8_classification_loss(logits, labels)
        return t

    l, g = jax.value_and_grad(loss)(v["params"])
    assert np.isfinite(float(l)) and float(optax.global_norm(g)) > 0
    # ~log(10) at random init
    assert 1.5 < float(l) < 3.5

    me, _ = build_detection_model(
        "xlstm_yolo_tpu/cfg/models/vil-cls-tiny.yaml", training=False, nc=10
    )
    probs, logits = me.apply(v, img)
    assert probs.shape == (4, 10)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def test_rare_wrapper_blocks(rng):
    """FeatureSplitIndex / PermuteBlock / FlattenPosEmbedBlock /
    SequenceConv2dBlock / ConvTranspose / VisionLSTM monolith
    (ref:ultralytics/nn/modules/block.py:1405,1621,1818,1864,2024;
    conv.py:118)."""
    import jax

    from xlstm_yolo_tpu.nn import blocks as B

    key = jax.random.PRNGKey(0)
    seq = jnp.asarray(rng.normal(size=(2, 64, 32)), jnp.float32)

    pb = B.PermuteBlock(seqlens=(8, 8))
    y = pb.apply(pb.init(key, seq), seq)
    assert y.shape == (2, 8, 8, 32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(seq).reshape(2, 8, 8, 32))

    fpe = B.FlattenPosEmbedBlock(dim=32, seqlens=(8, 8))
    v = fpe.init(key, seq)
    y = fpe.apply(v, seq)
    assert y.shape == seq.shape
    # zero-init pos embed => identity at init (reference trunc-normal-0 quirk aside)
    pe = jax.tree.leaves(v["params"])[0]
    assert pe.shape[-1] == 32

    sc = B.SequenceConv2dBlock(c2=48, k=3, s=2, seqlens=(8, 8))
    y = sc.apply(sc.init(key, seq), seq)
    assert y.shape == (2, 16, 48)  # 8x8 grid strided to 4x4

    img = jnp.asarray(rng.normal(size=(2, 8, 8, 32)), jnp.float32)
    ct = B.ConvTransposeBlock(c2=16, k=2, s=2)
    y = ct.apply(ct.init(key, img), img, mutable=["batch_stats"])[0]
    assert y.shape == (2, 16, 16, 16)

    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    vl = B.VisionLSTMBlock(dim=32, depth=2, patch_size=16,
                           output_indices=(0,), qkv_block_size=16, chunk_size=4)
    outs = vl.apply(vl.init(key, x), x)
    assert isinstance(outs, list) and len(outs) == 2
    assert outs[0].shape == (2, 2, 2, 32) and outs[-1].shape == (2, 2, 2, 32)

    fsi = B.FeatureSplitIndex(index=1)
    y = fsi.apply(fsi.init(key, outs), outs)
    np.testing.assert_allclose(np.asarray(y), np.asarray(outs[1]))


def test_rare_blocks_yaml_graph():
    """The rare blocks compile through parse_model_specs/DetectionModel."""
    import jax

    from xlstm_yolo_tpu.nn.tasks import build_detection_model

    d = {
        "nc": 4,
        "imgsz": 64,
        "backbone": [
            [-1, 1, "VisionLSTM", [3, 32, {"depth": 2, "resolution": [64, 64],
                                           "patch_size": 16, "output_indices": [0],
                                           "chunk_size": 4, "qkv_block_size": 16}]],
            [-1, 1, "FeatureSplitIndex", [0]],
            [-1, 1, "Conv", [64, 3, 2]],
        ],
        "head": [
            [-1, 1, "ConvTranspose", [32, 2, 2]],
            [[-1], 1, "Detect", ["nc"]],
        ],
    }
    model, _ = build_detection_model(d, training=True)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(v, x, mutable=["batch_stats"])[0]
    # training-mode Detect emits the raw per-level feature maps
    feats = out["one2many"] if isinstance(out, dict) else out
    assert feats[0].shape[0] == 1 and feats[0].ndim == 4


def test_topk_postprocess_variants_agree():
    """sorted and matmul postprocess twins match the gather-based one."""
    import jax

    from xlstm_yolo_tpu.nn.head import (
        topk_postprocess,
        topk_postprocess_matmul,
        topk_postprocess_sorted,
    )

    r = np.random.default_rng(3)
    preds = jnp.asarray(r.uniform(size=(2, 130, 4 + 7)), jnp.float32)
    preds = preds.at[..., :4].mul(64.0)
    ref = np.asarray(topk_postprocess(preds, max_det=20, nc=7))
    for fn in (topk_postprocess_matmul, topk_postprocess_sorted):
        got = np.asarray(jax.jit(lambda p, fn=fn: fn(p, 20, 7))(preds))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_mlstm_layer_vision_twins():
    """mlstm_large vision layer family fwd+bwd (ref:mlstm_large.py:135,366)."""
    import jax
    import jax.numpy as jnp

    from xlstm_yolo_tpu.nn.vil_extras import MLSTMLayerVision, VilLayerUpdated

    x = jnp.ones((2, 64, 96), jnp.float32) * 0.1
    for mod in (
        MLSTMLayerVision(dim=96, num_heads=4),
        VilLayerUpdated(dim=96, num_heads=4, direction="rowwise_from_bot_right"),
    ):
        v = mod.init(jax.random.PRNGKey(0), x)
        y = mod.apply(v, x)
        assert y.shape == x.shape and bool(jnp.isfinite(y).all())
        g = jax.grad(lambda p: mod.apply(p, x).sum())(v)
        assert all(bool(jnp.isfinite(l).all()) for l in jax.tree.leaves(g))

    # directional flip equivariance: bot_right(x) == flip(top_left(flip(x)))
    tl = VilLayerUpdated(dim=96, num_heads=4, direction="rowwise_from_top_left")
    br = VilLayerUpdated(dim=96, num_heads=4, direction="rowwise_from_bot_right")
    v = tl.init(jax.random.PRNGKey(1), x)
    r = jax.random.normal(jax.random.PRNGKey(2), x.shape)
    a = br.apply(v, r)
    b = tl.apply(v, r[:, ::-1])[:, ::-1]
    assert float(jnp.abs(a - b).max()) < 1e-5


def test_dw_shift9_matches_grouped_conv():
    """shift9 depthwise 3x3 is numerically identical to the grouped-conv
    lowering and param-compatible (same tree) — nn/blocks.py DW_IMPL."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from xlstm_yolo_tpu.nn import blocks as B
    from xlstm_yolo_tpu.nn.layers import SequenceConv2d

    rng = np.random.default_rng(0)
    x_img = jnp.asarray(rng.standard_normal((2, 16, 16, 32)), jnp.float32)
    x_seq = jnp.asarray(rng.standard_normal((2, 64, 32)), jnp.float32)

    conv = B.ConvBNAct(c2=32, k=3, g=32, fused=True, act=None)
    seq = SequenceConv2d(dim=32)

    old = B.DW_IMPL
    try:
        B.DW_IMPL = "grouped"
        v1 = conv.init(jax.random.PRNGKey(0), x_img)
        y1 = conv.apply(v1, x_img)
        s1 = seq.init(jax.random.PRNGKey(1), x_seq)
        z1 = seq.apply(s1, x_seq)
        B.DW_IMPL = "shift9"
        v2 = conv.init(jax.random.PRNGKey(0), x_img)
        # identical param trees (names + shapes) -> cross-loadable
        assert jax.tree.structure(v1) == jax.tree.structure(v2)
        y2 = conv.apply(v1, x_img)  # grouped-init params through shift9
        z2 = seq.apply(s1, x_seq)
        assert float(jnp.abs(y1 - y2).max()) < 1e-5
        assert float(jnp.abs(z1 - z2).max()) < 1e-5
    finally:
        B.DW_IMPL = old


def test_ifgate_split_matches_concat():
    """The concat-free ifgate projection (XY_IFGATE=split) is numerically
    equivalent to the Dense-over-concat path and param-compatible (same
    {"ifgate": {kernel, bias}} tree) — values AND input grads."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from xlstm_yolo_tpu.nn import layers as L

    rng = np.random.default_rng(0)
    B_, S, H, NH = 2, 64, 32, 4
    q = jnp.asarray(rng.standard_normal((B_, S, H)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B_, S, H)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B_, S, H)), jnp.float32)
    cell = L.MatrixLSTMCell(dim=H, num_heads=NH, chunk_size=16,
                            mode="train_with_padding")

    old = L.IFGATE_IMPL
    try:
        L.IFGATE_IMPL = "concat"
        v1 = cell.init(jax.random.PRNGKey(0), q, k, v)
        # the zero-init ifgate kernel hides the matmul — randomize it
        v1 = jax.tree.map(
            lambda x: jnp.asarray(rng.standard_normal(x.shape), x.dtype) * 0.1
            if x.ndim == 2 else x, v1)

        def f(variables, qq):
            return cell.apply(variables, qq, k, v).astype(jnp.float32).sum()

        y1 = cell.apply(v1, q, k, v)
        g1 = jax.grad(f, argnums=1)(v1, q)
        L.IFGATE_IMPL = "split"
        v2 = cell.init(jax.random.PRNGKey(0), q, k, v)
        assert jax.tree.structure(v1) == jax.tree.structure(v2)
        y2 = cell.apply(v1, q, k, v)  # concat-init params through split
        g2 = jax.grad(f, argnums=1)(v1, q)
        assert float(jnp.abs(y1 - y2).max()) < 1e-5
        assert float(jnp.abs(g1 - g2).max()) < 1e-5
    finally:
        L.IFGATE_IMPL = old
