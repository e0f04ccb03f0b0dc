"""Loss/TAL golden test vs the reference torch implementation.

Feeds identical synthetic head outputs + targets to the reference's
v8DetectionLoss (CPU torch) and our fixed-shape JAX loss; the TAL
assignment and the box/cls/dfl loss items must agree.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))
import ref_loader  # noqa: E402

if not ref_loader.REF.exists():
    pytest.skip("reference tree not mounted", allow_module_level=True)

ref_loader.load_reference()

import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from xlstm_yolo_tpu.utils.loss import v8_detection_loss  # noqa: E402


class _FakeDetect(torch.nn.Module):
    def __init__(self, nc, strides):
        super().__init__()
        self.nc = nc
        self.reg_max = 16
        self.stride = torch.tensor(strides, dtype=torch.float32)
        self._p = torch.nn.Parameter(torch.zeros(1))


class _FakeModel(torch.nn.Module):
    def __init__(self, nc, strides):
        super().__init__()
        self.model = torch.nn.ModuleList([_FakeDetect(nc, strides)])
        self.args = types.SimpleNamespace(box=7.5, cls=0.5, dfl=1.5)


def test_v8_loss_matches_reference():
    from ultralytics.utils.loss import v8DetectionLoss

    rng = np.random.default_rng(3)
    B, nc = 2, 4
    strides = [8.0, 16.0]
    shapes = [(16, 16), (8, 8)]  # imgsz 128
    no = nc + 64

    feats_np = [rng.normal(size=(B, no, h, w)).astype(np.float32) * 0.5 for h, w in shapes]

    # targets: 3 boxes in image 0, 1 box in image 1 (normalized xywh)
    batch_idx = np.array([0, 0, 0, 1], np.float32)
    cls = np.array([0, 1, 2, 3], np.float32)
    xywh = np.array(
        [[0.3, 0.3, 0.2, 0.25], [0.7, 0.6, 0.3, 0.3], [0.2, 0.8, 0.15, 0.2],
         [0.5, 0.5, 0.4, 0.5]],
        np.float32,
    )

    loss_fn = v8DetectionLoss(_FakeModel(nc, strides), tal_topk=10)
    tbatch = {
        "batch_idx": torch.from_numpy(batch_idx),
        "cls": torch.from_numpy(cls),
        "bboxes": torch.from_numpy(xywh),
    }
    with torch.no_grad():
        total_t, items_t = loss_fn([torch.from_numpy(f) for f in feats_np], tbatch)
    items_t = items_t.numpy()  # [box, cls, dfl] (gain-scaled)

    # ours: NHWC feats, padded per-image targets in pixel xyxy
    feats_j = [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats_np]
    imgsz = 128.0
    M = 8
    gt_cls = np.zeros((B, M), np.int32)
    gt_box = np.zeros((B, M, 4), np.float32)
    gt_mask = np.zeros((B, M), bool)
    for bi in range(B):
        sel = batch_idx == bi
        n = sel.sum()
        gt_cls[bi, :n] = cls[sel].astype(np.int32)
        b = xywh[sel] * imgsz
        gt_box[bi, :n] = np.concatenate([b[:, :2] - b[:, 2:] / 2, b[:, :2] + b[:, 2:] / 2], 1)
        gt_mask[bi, :n] = True

    total_j, items_j = v8_detection_loss(
        feats_j, jnp.asarray(gt_cls), jnp.asarray(gt_box), jnp.asarray(gt_mask),
        strides, nc=nc, tal_topk=10,
    )
    ours = np.array([float(items_j.box), float(items_j.cls), float(items_j.dfl)])
    np.testing.assert_allclose(ours, items_t, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(float(total_j), float(total_t), rtol=2e-3)


def test_ademamix_matches_reference():
    """Our optax AdEMAMix reproduces the torch reference update-for-update."""
    import jax
    import jax.numpy as jnp

    from ultralytics.engine.ademamix import AdEMAMix as TorchAdEMAMix

    from xlstm_yolo_tpu.engine.optimizers import ademamix

    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(5, 3)).astype(np.float32)
    grads = [rng.normal(size=(5, 3)).astype(np.float32) for _ in range(12)]

    # torch side
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = TorchAdEMAMix([wt], lr=1e-2, betas=(0.9, 0.999, 0.9999), alpha=8.0,
                        beta3_warmup=10, alpha_warmup=10, weight_decay=0.01)
    for g in grads:
        wt.grad = torch.from_numpy(g.copy())
        opt.step()

    # jax side
    tx = ademamix(1e-2, b1=0.9, b2=0.999, b3=0.9999, alpha=8.0,
                  beta3_warmup=10, alpha_warmup=10, weight_decay=0.01)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), wt.detach().numpy(), atol=1e-5, rtol=1e-4
    )


def test_warmup_matches_torch_sgd_groups():
    """build_optimizer's warmup == the reference's per-group np.interp
    warmup of lr (bias group from warmup_bias_lr) and momentum
    (ref:engine/trainer.py:369-378), stepped against torch SGD."""
    import math

    import optax
    import torch

    from xlstm_yolo_tpu.engine import optimizers as opt_lib

    params = {"layer": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}}
    sched = opt_lib.cosine_lr(0.01, 0.01, 10, 100)
    tx, _, _ = opt_lib.build_optimizer(
        params, name="SGD", lr=0.01, momentum=0.937, schedule=sched,
        weight_decay=0.0, warmup_steps=100, warmup_momentum=0.8,
        warmup_bias_lr=0.1,
    )
    st = tx.init(params)
    g = {"layer": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))}}

    tk = torch.ones(4, 4, requires_grad=True)
    tb = torch.zeros(4, requires_grad=True)
    opt = torch.optim.SGD(
        [{"params": [tk]}, {"params": [tb]}], lr=0.01, momentum=0.937, nesterov=True
    )
    p = params
    for ni in range(120):
        lf = 0.01 + (1 - 0.01) * (1 + math.cos(math.pi * min(ni / 1000, 1))) / 2
        for j, x in enumerate(opt.param_groups):
            x["lr"] = np.interp(ni, [0, 100], [0.1 if j == 1 else 0.0, 0.01 * lf])
            x["momentum"] = np.interp(ni, [0, 100], [0.8, 0.937])
        tk.grad = torch.ones(4, 4)
        tb.grad = torch.ones(4)
        opt.step()
        u, st = tx.update(g, st, p)
        p = optax.apply_updates(p, u)
    np.testing.assert_allclose(
        np.asarray(p["layer"]["kernel"]), tk.detach().numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(p["layer"]["bias"]), tb.detach().numpy(), atol=2e-4
    )


def test_topk_select_mask_matches_lax_topk():
    """topk_select_mask picks exactly lax.top_k's set, incl. tie-heavy and
    all-zero rows (the regimes the assigner actually sees)."""
    import jax
    import jax.numpy as jnp

    from xlstm_yolo_tpu.utils.tal import topk_select_mask

    rng = np.random.default_rng(0)
    A, k = 97, 10
    cases = [
        rng.uniform(0, 1, (4, 6, A)).astype(np.float32),
        np.zeros((2, 3, A), np.float32),                      # all ties
        np.repeat(rng.uniform(0, 1, (2, 3, 1)), A, -1).astype(np.float32),
    ]
    sparse = np.zeros((2, 3, A), np.float32)                  # < k nonzero
    sparse[..., :4] = rng.uniform(0.5, 1, (2, 3, 4))
    cases.append(sparse)
    for m in cases:
        got = np.asarray(topk_select_mask(jnp.asarray(m), k))
        _, idx = jax.lax.top_k(jnp.asarray(m), k)
        want = np.zeros_like(got)
        np.put_along_axis(want, np.asarray(idx), True, axis=-1)
        np.testing.assert_array_equal(got, want)

    # per-sample k (k_arr): each sample b selects exactly its top-k_arr[b]
    m = jnp.asarray(rng.uniform(0, 1, (4, 6, A)).astype(np.float32))
    k_arr = jnp.asarray([10, 1, 3, 10], jnp.int32)
    got = np.asarray(topk_select_mask(m, 10, k_arr=k_arr))
    for b in range(4):
        kb = int(k_arr[b])
        _, idx = jax.lax.top_k(m[b], kb)
        want = np.zeros((6, A), bool)
        np.put_along_axis(want, np.asarray(idx), True, axis=-1)
        np.testing.assert_array_equal(got[b], want, err_msg=f"sample {b}")


def test_e2e_batched_matches_two_pass(monkeypatch):
    """_e2e_detect_loss_batched (stacked one2many+one2one, per-sample
    top-k) == the two v8 passes: totals, items, and grads wrt the raw
    feature maps."""
    import jax
    import jax.numpy as jnp

    from xlstm_yolo_tpu.utils import loss as loss_lib

    rng = np.random.default_rng(1)
    B, M, nc, reg_max = 2, 8, 7, 16
    no = nc + 4 * reg_max
    shapes = [(16, 16), (8, 8), (4, 4)]
    strides = [8.0, 16.0, 32.0]

    def mk_feats():
        return [jnp.asarray(rng.standard_normal((B, h, w, no)), jnp.float32)
                for h, w in shapes]

    preds = {"one2many": mk_feats(), "one2one": mk_feats()}
    cls = jnp.asarray(rng.integers(0, nc, (B, M)), jnp.int32)
    xy = jnp.asarray(rng.uniform(10, 60, (B, M, 2)), jnp.float32)
    wh = jnp.asarray(rng.uniform(10, 50, (B, M, 2)), jnp.float32)
    bb = jnp.concatenate([xy, xy + wh], -1)
    mask = jnp.ones((B, M), bool).at[:, 5:].set(False)

    def run(batched):
        monkeypatch.setenv("XY_E2E_BATCHED", "1" if batched else "0")

        def f(p):
            return loss_lib.e2e_detect_loss(p, cls, bb, mask, strides, nc=nc)

        g = jax.grad(lambda p: f(p)[0])(preds)
        return f(preds), g

    (t0, it0), g0 = run(False)
    (t1, it1), g1 = run(True)
    np.testing.assert_allclose(float(t0), float(t1), rtol=1e-5)
    for a, b in zip(it0, it1):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
