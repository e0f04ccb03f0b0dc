"""Fused Pallas TAL-metric kernel vs the jnp assigner (interpret on CPU).

The kernel (ops/pallas/tal_metric.py) must reproduce task_aligned_assign's
metric stage exactly: masked CIoU, one-hot score gather, align metric,
and the top-k selection incl. tie-breaking (lowest index) and per-sample
k — so the full AssignResult from either path is identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xlstm_yolo_tpu.utils import tal

f32 = jnp.float32


def _mk(B=3, A=200, M=9, nc=11, seed=0, degenerate=False):
    rng = np.random.default_rng(seed)
    scores = jnp.asarray(rng.uniform(0, 1, (B, A, nc)), f32)
    # anchors on a rough grid in a 320px image
    anc = jnp.asarray(rng.uniform(0, 320, (A, 2)), f32)
    pxy = jnp.asarray(rng.uniform(0, 280, (B, A, 2)), f32)
    pwh = jnp.asarray(rng.uniform(5, 120, (B, A, 2)), f32)
    pboxes = jnp.concatenate([pxy, pxy + pwh], -1)
    gxy = jnp.asarray(rng.uniform(0, 250, (B, M, 2)), f32)
    gwh = jnp.asarray(rng.uniform(30, 160, (B, M, 2)), f32)
    gboxes = jnp.concatenate([gxy, gxy + gwh], -1)
    labels = jnp.asarray(rng.integers(0, nc, (B, M)), jnp.int32)
    mask = jnp.asarray(rng.uniform(0, 1, (B, M)) > 0.3)
    if degenerate:
        # image 0: no valid gts at all; image 1: zero-area gt boxes
        mask = mask.at[0].set(False)
        gboxes = gboxes.at[1].set(0.0)
    return scores, pboxes, anc, labels, gboxes, mask


def _run(kernel: bool, args, monkeypatch, topk=10, topk_arr=None):
    fn = (tal.task_aligned_assign_pallas_metric if kernel
          else tal.task_aligned_assign)
    return fn(*args, topk=topk, num_classes=args[0].shape[-1],
              topk_arr=topk_arr)


@pytest.mark.parametrize("degenerate", [False, True])
def test_tal_kernel_matches_jnp(monkeypatch, degenerate):
    args = _mk(degenerate=degenerate)
    r0 = _run(False, args, monkeypatch)
    r1 = _run(True, args, monkeypatch)
    np.testing.assert_array_equal(np.asarray(r0.fg_mask), np.asarray(r1.fg_mask))
    np.testing.assert_array_equal(np.asarray(r0.target_labels),
                                  np.asarray(r1.target_labels))
    np.testing.assert_array_equal(np.asarray(r0.target_gt_idx),
                                  np.asarray(r1.target_gt_idx))
    np.testing.assert_allclose(np.asarray(r0.target_bboxes),
                               np.asarray(r1.target_bboxes), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(r0.target_scores),
                               np.asarray(r1.target_scores),
                               rtol=2e-5, atol=1e-7)


def test_tal_kernel_per_sample_k(monkeypatch):
    """topk_arr: one2many/one2one halves of the batched E2E loss."""
    args = _mk(B=4, seed=3)
    k_arr = jnp.asarray([10, 1, 3, 10], jnp.int32)
    r0 = _run(False, args, monkeypatch, topk=10, topk_arr=k_arr)
    r1 = _run(True, args, monkeypatch, topk=10, topk_arr=k_arr)
    np.testing.assert_array_equal(np.asarray(r0.fg_mask), np.asarray(r1.fg_mask))
    np.testing.assert_allclose(np.asarray(r0.target_scores),
                               np.asarray(r1.target_scores),
                               rtol=2e-5, atol=1e-7)


def test_tal_kernel_lane_padding(monkeypatch):
    """A not a multiple of 128: padded anchors must never be selected."""
    args = _mk(A=97, seed=7)
    r0 = _run(False, args, monkeypatch)
    r1 = _run(True, args, monkeypatch)
    np.testing.assert_array_equal(np.asarray(r0.fg_mask), np.asarray(r1.fg_mask))
    np.testing.assert_allclose(np.asarray(r0.target_scores),
                               np.asarray(r1.target_scores),
                               rtol=2e-5, atol=1e-7)


def test_tal_kernel_metric_stage_values(monkeypatch):
    """Direct metric/overlap/mask parity of the kernel vs tal steps 1-3."""
    from xlstm_yolo_tpu.ops.pallas.tal_metric import tal_metric_pallas
    from xlstm_yolo_tpu.utils.metrics import bbox_iou

    scores, pboxes, anc, labels, gboxes, mask = _mk(seed=11)
    B, A, nc = scores.shape
    M = gboxes.shape[1]

    m_k, ov_k, pos_k = tal_metric_pallas(
        scores, pboxes, anc, labels, gboxes, mask, topk=10, num_classes=nc)

    lt = gboxes[..., None, :2]
    rb = gboxes[..., None, 2:]
    deltas = jnp.concatenate([anc[None, None] - lt, rb - anc[None, None]], -1)
    mask_in = deltas.min(-1) > 1e-9
    valid = mask_in & mask[..., None]
    ious = bbox_iou(gboxes[:, :, None, :], pboxes[:, None, :, :],
                    xywh=False, kind="ciou")
    ov = jnp.where(valid, jnp.clip(ious, 0.0, None), 0.0)
    cls_idx = jnp.clip(labels, 0, nc - 1)
    bs = jnp.take_along_axis(scores.transpose(0, 2, 1), cls_idx[:, :, None], 1)
    bs = jnp.where(valid, bs, 0.0)
    am = bs.astype(f32) ** 0.5 * ov.astype(f32) ** 6.0
    sel = tal.topk_select_mask(am, 10) & mask[..., None]
    pos = sel & valid

    np.testing.assert_allclose(np.asarray(ov_k), np.asarray(ov),
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(m_k), np.asarray(am),
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(pos_k), np.asarray(pos))
