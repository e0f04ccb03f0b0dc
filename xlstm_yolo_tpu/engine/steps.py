"""Pure jitted train / eval step functions.

The TPU-native replacement for the reference's hot loop
(ref:engine/trainer.py:346-420): one fused XLA program computes forward,
E2E loss, backward, clip, optimizer update and EMA — gradient
all-reduce over the mesh is inserted by XLA from the shardings (no DDP,
no GradScaler: bf16 activations + fp32 params need no loss scaling).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from xlstm_yolo_tpu.engine import optimizers as opt_lib
from xlstm_yolo_tpu.utils.loss import e2e_detect_loss, v8_detection_loss

f32 = jnp.float32


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    ema: opt_lib.EMAState

    @classmethod
    def create(cls, variables, tx):
        params = variables["params"]
        return cls(
            step=jnp.zeros([], jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            ema=opt_lib.ema_init(params),
        )


class FlatTrainState(struct.PyTreeNode):
    """TrainState with params / optimizer moments / EMA as ONE flat f32
    vector each (TPU-first): the optimizer + EMA become ~15 large fused
    elementwise ops over ~100 MB instead of ~8 tiny XLA fusions per each
    of the model's ~731 param leaves — per-leaf dispatch dominates the
    tree path's post-backward cost (scripts/exp_flat_opt.py). The pytree
    view is materialized only at ``model.apply`` entry via ``unravel``
    (a static field); AD transposes those slices back into a flat grad.

    Pure-DP only: tensor-parallel ('model' axis) shards individual
    leaves, which a single flat vector cannot carry — the trainer keeps
    the tree path when n_model > 1.
    """

    step: jax.Array
    flat_params: jax.Array
    batch_stats: Any
    opt_state: Any
    ema_flat: jax.Array
    ema_updates: jax.Array
    unravel: Any = struct.field(pytree_node=False)

    # duck-typed surface of TrainState (val / checkpointing / export)
    @property
    def params(self):
        return self.unravel(self.flat_params)

    @property
    def ema(self):
        return opt_lib.EMAState(self.unravel(self.ema_flat), self.ema_updates)

    @classmethod
    def create(cls, variables, tx):
        from jax.flatten_util import ravel_pytree

        flat, unravel = ravel_pytree(variables["params"])
        return cls(
            step=jnp.zeros([], jnp.int32),
            flat_params=flat,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(flat),
            ema_flat=flat,
            ema_updates=jnp.zeros([], jnp.int32),
            unravel=unravel,
        )

    def load_tree(self, tree):
        """Restore from the tree-form checkpoint layout (utils/checkpoint)."""
        from jax.flatten_util import ravel_pytree

        return self.replace(
            step=tree["step"],
            flat_params=ravel_pytree(tree["params"])[0],
            batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"],
            ema_flat=ravel_pytree(tree["ema_params"])[0],
            ema_updates=tree["ema_updates"],
        )


class HybridTrainState(struct.PyTreeNode):
    """FlatTrainState for tensor-parallel runs: replicated param leaves
    ride the flat f32 vector (fused optimizer+EMA elementwise program),
    'model'-axis-sharded leaves stay whole in ``sharded_params`` so their
    NamedShardings survive — the TP analog of the pure-DP flat path
    (optimizers.build_hybrid_optimizer).  ``rebuild``/``split`` are the
    static closures from optimizers.partition_params.
    """

    step: jax.Array
    flat_params: jax.Array
    sharded_params: Any  # tuple of sharded leaves
    batch_stats: Any
    opt_state: Any
    ema_flat: jax.Array
    ema_sharded: Any
    ema_updates: jax.Array
    rebuild: Any = struct.field(pytree_node=False)
    split: Any = struct.field(pytree_node=False)

    # duck-typed surface of TrainState (val / checkpointing / export)
    @property
    def params(self):
        return self.rebuild(self.flat_params, self.sharded_params)

    @property
    def ema(self):
        return opt_lib.EMAState(
            self.rebuild(self.ema_flat, self.ema_sharded), self.ema_updates)

    @classmethod
    def create(cls, variables, tx, sharded_tree):
        flat, shard, split, rebuild = opt_lib.partition_params(
            variables["params"], sharded_tree)
        return cls(
            step=jnp.zeros([], jnp.int32),
            flat_params=flat,
            sharded_params=shard,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init((flat, shard)),
            ema_flat=flat,
            ema_sharded=shard,
            ema_updates=jnp.zeros([], jnp.int32),
            rebuild=rebuild,
            split=split,
        )

    def load_tree(self, tree):
        """Restore from the tree-form checkpoint layout (utils/checkpoint)."""
        pf, psh = self.split(tree["params"])
        ef, esh = self.split(tree["ema_params"])
        return self.replace(
            step=tree["step"],
            flat_params=pf,
            sharded_params=psh,
            batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"],
            ema_flat=ef,
            ema_sharded=esh,
            ema_updates=tree["ema_updates"],
        )


def make_train_step(
    model_train,
    tx: optax.GradientTransformation,
    nc: int = 80,
    end2end: bool = True,
    ema_decay: float = 0.9999,
    accumulate: int = 1,
    task: str = "detect",
    kpt_shape: tuple[int, int] | None = None,
    imgsz_out: int | None = None,
    device_aug: dict | None = None,
) -> Callable:
    """Build train_step(state, batch, rng) -> (state, metrics).

    ``batch``: img (B, H, W, 3) float; cls (B, M) int32; bboxes (B, M, 4)
    xyxy image units; mask (B, M) bool.  ``accumulate`` > 1 scans over
    microbatches before the optimizer update (ref grad-accum semantics,
    trainer.py:304,372 — here a lax.scan over leading microbatch dim).

    ``device_aug``: optional {"hsv_h","hsv_s","hsv_v","fliplr"} — apply
    these augmentations ON DEVICE (fused into the normalize pass) from
    uint8 batches, with the host pipeline running them zeroed
    (data/device_augment.py; detect task only).
    """

    is_rtdetr = any(s["module"] == "RTDETRDecoder"
                    for s in getattr(model_train, "specs", ()))
    if device_aug and task != "detect":
        raise ValueError("device_aug supports the detect contract only "
                         "(segments/keypoints keep host-side flip)")

    def loss_fn(params, batch_stats, batch, rng):
        if device_aug:
            from xlstm_yolo_tpu.data.device_augment import apply_device_aug

            # fold_in constant 11: distinct from the RT-DETR 'dn' stream
            # (fold_in(rng, 7) below) so aug and denoising randomness
            # never correlate when both are active.
            batch = apply_device_aug(
                batch, jax.random.fold_in(rng, 11), device_aug)
        img = batch["img"]
        if img.dtype == jnp.uint8:
            # normalize on-device: the host ships 1/4 the bytes
            img = img.astype(f32) / 255.0
        ih = batch["img"].shape[1]
        if imgsz_out and imgsz_out != ih:
            # multi-scale bucket: resize the batch + scale the geometry
            # on device (ref:models/yolo/detect/train.py:60 multi_scale,
            # redesigned as a static shape-bucket set — one compiled
            # program per bucket instead of free per-batch sizes)
            sf = imgsz_out / ih
            B = img.shape[0]
            img = jax.image.resize(
                img, (B, imgsz_out, imgsz_out, img.shape[-1]), "bilinear")
            batch = dict(batch)
            batch["bboxes"] = batch["bboxes"] * sf
            if "kpts" in batch:
                k = jnp.asarray(batch["kpts"], f32)
                batch["kpts"] = jnp.concatenate([k[..., :2] * sf, k[..., 2:]], -1)
            if "rboxes" in batch:
                rb = batch["rboxes"].astype(f32)
                batch["rboxes"] = jnp.concatenate(
                    [rb[..., :4] * sf, rb[..., 4:]], -1)
            ih = imgsz_out
        apply_kw, rngs = {}, {"droppath": rng}
        if is_rtdetr:
            # padded gt triple for the CDN denoising group (normalized cxcywh)
            xyxy = batch["bboxes"].astype(f32) / ih
            cxy = (xyxy[..., :2] + xyxy[..., 2:]) / 2
            wh = jnp.maximum(xyxy[..., 2:] - xyxy[..., :2], 1e-6)
            apply_kw["targets"] = (
                batch["cls"].astype(jnp.int32),
                jnp.concatenate([cxy, wh], -1),
                batch["mask"].astype(bool),
            )
            rngs["dn"] = jax.random.fold_in(rng, 7)
        out, mutated = model_train.apply(
            {"params": params, "batch_stats": batch_stats},
            img,
            mutable=["batch_stats"],
            rngs=rngs,
            **apply_kw,
        )
        if task == "segment":
            from xlstm_yolo_tpu.utils.loss import v8_segmentation_loss

            feats = out["one2many"]
            strides = [ih / f.shape[1] for f in feats]
            gt_masks = batch["masks"].astype(f32)
            Hm, Wm = out["proto"].shape[1:3]
            if gt_masks.shape[-2:] != (Hm, Wm):
                gt_masks = jax.image.resize(
                    gt_masks, (*gt_masks.shape[:2], Hm, Wm), "nearest")
            total, items, _ = v8_segmentation_loss(
                out, batch["cls"], batch["bboxes"], batch["mask"], gt_masks,
                strides, img_size=ih, nc=nc,
            )
        elif task == "pose":
            from xlstm_yolo_tpu.utils.loss import v8_pose_loss

            feats = out["one2many"]
            strides = [ih / f.shape[1] for f in feats]
            total, items, _ = v8_pose_loss(
                out, batch["cls"], batch["bboxes"], batch["mask"],
                batch["kpts"].astype(f32), strides, nc=nc,
                kpt_shape=kpt_shape or (17, 3),
            )
        elif task == "obb":
            from xlstm_yolo_tpu.utils.loss import v8_obb_loss

            feats = out["one2many"]
            strides = [ih / f.shape[1] for f in feats]
            total, items = v8_obb_loss(
                out, batch["cls"], batch["rboxes"].astype(f32), batch["mask"],
                strides, nc=nc,
            )
        elif task == "classify":
            from xlstm_yolo_tpu.utils.loss import LossItems, v8_classification_loss

            total, l = v8_classification_loss(out, batch["cls"])
            items = LossItems(l, l, jnp.zeros_like(l))
        elif isinstance(out, dict) and "dec_bboxes" in out:
            # RT-DETR graph: Hungarian-matched DETR loss
            from xlstm_yolo_tpu.utils.detr_loss import rtdetr_detection_loss

            total, items = rtdetr_detection_loss(
                out, batch["cls"], batch["bboxes"], batch["mask"],
                img_size=ih, nc=nc,
            )
        elif end2end:
            feats = out["one2many"]
            strides = [ih / f.shape[1] for f in feats]
            total, items = e2e_detect_loss(
                out, batch["cls"], batch["bboxes"], batch["mask"], strides, nc=nc
            )
        else:
            strides = [ih / f.shape[1] for f in out]
            total, items = v8_detection_loss(
                out, batch["cls"], batch["bboxes"], batch["mask"], strides, nc=nc
            )
        return total, (items, mutated["batch_stats"])

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state, batch, rng):
        flat = isinstance(state, FlatTrainState)
        hybrid = isinstance(state, HybridTrainState)
        if flat:
            # differentiate wrt the flat vector: loss_fn sees the tree
            # view; AD transposes the unravel slices into a flat grad
            unravel = state.unravel
            gfn = jax.value_and_grad(
                lambda fp, bs, b, r: loss_fn(unravel(fp), bs, b, r),
                has_aux=True)
            p0 = state.flat_params
        elif hybrid:
            rebuild = state.rebuild
            gfn = jax.value_and_grad(
                lambda pr, bs, b, r: loss_fn(rebuild(*pr), bs, b, r),
                has_aux=True)
            p0 = (state.flat_params, state.sharded_params)
        else:
            gfn, p0 = grad_fn, state.params

        def single(bs, mb, r):
            (loss, (items, new_bs)), grads = gfn(p0, bs, mb, r)
            return loss, items, new_bs, grads

        if accumulate > 1:
            def micro(carry, xs):
                mb, mb_idx = xs
                g_acc, bs, l_acc = carry
                # independent stochastic-depth masks per microbatch
                loss, items, new_bs, grads = single(
                    bs, mb, jax.random.fold_in(rng, mb_idx)
                )
                g_acc = jax.tree.map(jnp.add, g_acc, grads)
                return (g_acc, new_bs, l_acc + loss), items

            g0 = jax.tree.map(jnp.zeros_like, p0)
            n_micro = jax.tree.leaves(batch)[0].shape[0]
            (grads, new_bs, loss), items = jax.lax.scan(
                micro,
                (g0, state.batch_stats, jnp.zeros([], f32)),
                (batch, jnp.arange(n_micro)),
            )
            items = jax.tree.map(lambda x: x[-1], items)
        else:
            loss, items, new_bs, grads = single(state.batch_stats, batch, rng)

        updates, new_opt = tx.update(grads, state.opt_state, p0)
        if flat:
            new_flat = state.flat_params + updates
            d = opt_lib.ema_decay_at(state.ema_updates + 1, decay=ema_decay)
            new_state = state.replace(
                step=state.step + 1,
                flat_params=new_flat,
                batch_stats=new_bs,
                opt_state=new_opt,
                ema_flat=state.ema_flat * d + (1 - d) * new_flat,
                ema_updates=state.ema_updates + 1,
            )
        elif hybrid:
            uf, us = updates
            new_flat = state.flat_params + uf
            new_shard = tuple(p + u for p, u in zip(state.sharded_params, us))
            d = opt_lib.ema_decay_at(state.ema_updates + 1, decay=ema_decay)
            new_state = state.replace(
                step=state.step + 1,
                flat_params=new_flat,
                sharded_params=new_shard,
                batch_stats=new_bs,
                opt_state=new_opt,
                ema_flat=state.ema_flat * d + (1 - d) * new_flat,
                ema_sharded=tuple(
                    e * d + (1 - d) * p
                    for e, p in zip(state.ema_sharded, new_shard)),
                ema_updates=state.ema_updates + 1,
            )
        else:
            new_params = optax.apply_updates(state.params, updates)
            new_ema = opt_lib.ema_update(state.ema, new_params, decay=ema_decay)
            new_state = state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
                ema=new_ema,
            )
        metrics = {
            "loss": loss,
            "box_loss": items.box,
            "cls_loss": items.cls,
            "dfl_loss": items.dfl,
        }
        return new_state, metrics

    return train_step


def make_eval_step(model_eval) -> Callable:
    """eval_step(params, batch_stats, img) -> (detections, aux)."""

    def eval_step(params, batch_stats, img):
        return model_eval.apply({"params": params, "batch_stats": batch_stats}, img)

    return eval_step
