"""Optimizers: AdEMAMix (optax transform), param-group builder, EMA.

- AdEMAMix re-derives ref:ultralytics/engine/ademamix.py:30-150 as a pure
  optax GradientTransformation (fast EMA + alpha-mixed slow EMA over an
  adam denominator, with linear alpha warmup and half-life beta3 warmup).
- build_optimizer reproduces the trainer's 3-group policy
  (ref:engine/trainer.py:768-840): weight-decay only on >=2D kernels,
  none on biases/norm scales; "auto" picks AdamW-style lr for small-iter
  fine-tunes (lr = 0.002 * 5 / (4 + nc)) like trainer.py:789-800.
- EMA: decay ramp d * (1 - exp(-updates / tau)) (ref:utils/torch_utils.py:515).
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

f32 = jnp.float32


class AdEMAMixState(NamedTuple):
    count: jax.Array
    m_fast: Any
    m_slow: Any
    nu: Any


def ademamix(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    b3: float = 0.9999,
    alpha: float = 8.0,
    beta3_warmup: Optional[int] = None,
    alpha_warmup: Optional[int] = None,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    mask=None,
) -> optax.GradientTransformation:
    """AdEMAMix: update = (m_fast/bc1 + alpha * m_slow) / (sqrt(nu/bc2) + eps).

    Weight decay is decoupled (added to the update like AdamW), applied
    through ``mask`` when given.
    """

    def beta3_t(step):
        if beta3_warmup is None:
            return jnp.asarray(b3, f32)
        # interpolate in half-life space: f(beta) = log(.5)/log(beta) - 1
        def f(beta):
            return jnp.log(0.5) / jnp.log(beta + 1e-8) - 1

        a = jnp.minimum(step / float(beta3_warmup), 1.0)
        t = (1 - a) * f(jnp.asarray(b1, f32)) + a * f(jnp.asarray(b3, f32))
        return jnp.power(0.5, 1.0 / (t + 1))

    def alpha_t(step):
        if alpha_warmup is None:
            return jnp.asarray(alpha, f32)
        a = jnp.minimum(step / float(alpha_warmup), 1.0)
        return a * alpha

    def init(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return AdEMAMixState(jnp.zeros([], jnp.int32), z, jax.tree.map(jnp.zeros_like, params), jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        step = state.count + 1
        b3t = beta3_t(step.astype(f32))
        at = alpha_t(step.astype(f32))
        bc1 = 1 - b1 ** step.astype(f32)
        bc2 = 1 - b2 ** step.astype(f32)

        m_fast = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.m_fast, grads)
        m_slow = jax.tree.map(lambda m, g: b3t * m + (1 - b3t) * g, state.m_slow, grads)
        nu = jax.tree.map(lambda n, g: b2 * n + (1 - b2) * g * g, state.nu, grads)

        def upd(mf, ms, n):
            denom = jnp.sqrt(n / bc2) + eps
            return (mf / bc1 + at * ms) / denom

        updates = jax.tree.map(upd, m_fast, m_slow, nu)
        if weight_decay:
            wd_mask = (
                mask(params) if callable(mask) else (mask if mask is not None else None)
            )
            if wd_mask is None:
                updates = jax.tree.map(lambda u, p: u + weight_decay * p, updates, params)
            else:
                # mask tree drives the map: under optax.multi_transform the
                # updates/params trees carry MaskedNode subtrees at
                # deselected leaves, which must pass through untouched
                updates = jax.tree.map(
                    lambda m, u, p: u + weight_decay * p if m else u,
                    wd_mask, updates, params)
        lr = learning_rate(step) if callable(learning_rate) else learning_rate
        updates = jax.tree.map(lambda u: -lr * u, updates)
        return updates, AdEMAMixState(step, m_fast, m_slow, nu)

    return optax.GradientTransformation(init, update)


def decay_mask_fn(params) -> Any:
    """True (decay) for >=2D kernels; False for biases/norm weights/gates.

    Parity with the reference's 3 param groups (trainer.py:801-816):
    g0 = weights w/ decay, g1 = norm weights no decay, g2 = biases no decay.
    """

    def decay(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in {"bias", "scale", "embed", "learnable_skip", "queries"}:
            return False
        if name == "weight" and jnp.ndim(leaf) <= 1:
            return False  # norm weights
        return jnp.ndim(leaf) >= 2

    return jax.tree_util.tree_map_with_path(decay, params)


def cosine_lr(lr0: float, lrf: float, epochs: int, steps_per_epoch: int, warmup_steps: int = 0,
              warmup_bias_lr: float = 0.1):
    """lr(t): linear warmup then cosine from lr0 to lr0*lrf (cfg cos_lr)."""
    total = max(epochs * steps_per_epoch, 1)

    def sched(step):
        s = jnp.asarray(step, f32)
        frac = jnp.clip(s / total, 0.0, 1.0)
        cos = lrf + (1 - lrf) * (1 + jnp.cos(jnp.pi * frac)) / 2
        lr = lr0 * cos
        if warmup_steps > 0:
            w = jnp.clip(s / warmup_steps, 0.0, 1.0)
            lr = lr * w
        return lr

    return sched


def linear_lr(lr0: float, lrf: float, epochs: int, steps_per_epoch: int, warmup_steps: int = 0):
    total = max(epochs * steps_per_epoch, 1)

    def sched(step):
        s = jnp.asarray(step, f32)
        frac = jnp.clip(s / total, 0.0, 1.0)
        lr = lr0 * ((1 - frac) * (1 - lrf) + lrf)
        if warmup_steps > 0:
            lr = lr * jnp.clip(s / warmup_steps, 0.0, 1.0)
        return lr

    return sched


def warmup_wrap(base_sched, warmup_steps: int, x0: float = 0.0):
    """Linear interp from ``x0`` to the base schedule over the warmup.

    Parity: ref:engine/trainer.py:369-378 — ``np.interp(ni, [0, nw],
    [x0, lr0 * lf(epoch)])``; the target tracks the decaying schedule.
    """
    base = base_sched if callable(base_sched) else (lambda s: jnp.asarray(base_sched, f32))

    def sched(step):
        s = jnp.asarray(step, f32)
        tgt = base(s)
        w = jnp.clip(s / max(warmup_steps, 1), 0.0, 1.0)
        return x0 * (1.0 - w) + tgt * w

    return sched


def bias_label_fn(params) -> Any:
    """'bias' for 1-D bias leaves (the reference's param group g2), else 'main'."""

    def lab(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return "bias" if name == "bias" and jnp.ndim(leaf) <= 1 else "main"

    return jax.tree_util.tree_map_with_path(lab, params)


def build_optimizer(
    params,
    name: str = "auto",
    lr: float = 0.01,
    momentum: float = 0.937,
    weight_decay: float = 5e-4,
    schedule=None,
    iterations: int = 10000,
    nc: int = 80,
    clip_norm: float = 10.0,
    warmup_steps: int = 0,
    warmup_momentum: float = 0.8,
    warmup_bias_lr: float = 0.1,
    bias_schedule=None,
) -> tuple[optax.GradientTransformation, float, str]:
    """Build the optax chain: clip -> optimizer(lr schedule, masked wd).

    Parity: BaseTrainer.build_optimizer (trainer.py:768-840), incl. the
    'auto' heuristic choosing AdamW (lr=0.002*5/(4+nc)) for short runs
    and SGD otherwise.  With ``warmup_steps`` > 0 the warmup semantics of
    ref:trainer.py:369-378 apply: the bias group's lr interpolates from
    ``warmup_bias_lr`` (others from 0) and SGD/RMSProp momentum from
    ``warmup_momentum`` to its final value.
    """
    if name == "auto":
        lr_fit = round(0.002 * 5 / (4 + nc), 6)
        name, lr, momentum = ("SGD", 0.01, 0.9) if iterations > 10000 else ("AdamW", lr_fit, 0.9)

    mask = decay_mask_fn(params)
    warm = warmup_steps > 0
    lr_main = schedule if schedule is not None else lr
    if warm:
        lr_main = warmup_wrap(lr_main, warmup_steps, 0.0)
        lr_bias = bias_schedule if bias_schedule is not None else warmup_wrap(
            schedule if schedule is not None else lr, warmup_steps, warmup_bias_lr
        )
        mom_s = warmup_wrap(momentum, warmup_steps, warmup_momentum)
    else:
        lr_bias, mom_s = lr_main, momentum

    def mk(lr_s, wd):
        if name == "SGD":
            return optax.chain(
                optax.add_decayed_weights(wd, mask=mask) if wd else optax.identity(),
                optax.inject_hyperparams(optax.sgd)(
                    learning_rate=lr_s, momentum=mom_s, nesterov=True
                ),
            )
        if name in {"Adam", "Adamax", "NAdam", "RAdam"}:
            return optax.adam(lr_s, b1=momentum, b2=0.999)
        if name == "AdamW":
            return optax.adamw(lr_s, b1=momentum, b2=0.999, weight_decay=wd, mask=mask if wd else None)
        if name == "RMSProp":
            return optax.inject_hyperparams(optax.rmsprop)(learning_rate=lr_s, momentum=mom_s)
        if name == "AdEMAMix":
            return ademamix(
                lr_s, b1=momentum, b2=0.999, b3=0.9999, alpha=8.0,
                beta3_warmup=iterations, alpha_warmup=iterations,
                weight_decay=wd, mask=mask if wd else None,
            )
        raise ValueError(f"unknown optimizer {name}")

    if warm:
        tx = optax.multi_transform(
            {"main": mk(lr_main, weight_decay), "bias": mk(lr_bias, 0.0)},
            bias_label_fn(params),
        )
    else:
        tx = mk(lr_main, weight_decay)

    tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx, lr, name


class FlatOptState(NamedTuple):
    count: jax.Array
    mu: Any   # momentum buffer / Adam m / AdEMAMix m_fast (flat) or ()
    nu: Any   # second moment (flat) or ()
    ms: Any   # AdEMAMix slow EMA (flat) or ()


def _flat_bool_masks(params) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(decay_mask, bias_mask) as flat bool vectors in ravel_pytree order.

    Works on concrete arrays or ShapeDtypeStructs (shape/path only).
    """
    import numpy as np

    leaves = jax.tree.leaves(params)
    wd_tree = jax.tree.leaves(decay_mask_fn(params))
    bias_tree = jax.tree.leaves(bias_label_fn(params))
    sizes = [int(np.prod(l.shape)) for l in leaves]
    wd = np.concatenate(
        [np.full(n, bool(m)) for n, m in zip(sizes, wd_tree)]) if sizes else np.zeros(0, bool)
    bias = np.concatenate(
        [np.full(n, lab == "bias") for n, lab in zip(sizes, bias_tree)]) if sizes else np.zeros(0, bool)
    return jnp.asarray(wd), jnp.asarray(bias)


def build_flat_optimizer(
    params,
    name: str = "auto",
    lr: float = 0.01,
    momentum: float = 0.937,
    weight_decay: float = 5e-4,
    schedule=None,
    iterations: int = 10000,
    nc: int = 80,
    clip_norm: float = 10.0,
    warmup_steps: int = 0,
    warmup_momentum: float = 0.8,
    warmup_bias_lr: float = 0.1,
    bias_schedule=None,
) -> tuple[optax.GradientTransformation, float, str]:
    """``build_optimizer`` with single-flat-vector math (TPU-first).

    Same semantics as the tree chain (clip -> masked wd -> optimizer with
    per-group lr warmup), but ``init``/``update`` take the **1-D raveled**
    param/grad vectors: one fused elementwise program over ~100 MB instead
    of ~8 small XLA fusions for each of the model's ~731 leaves
    (per-leaf dispatch dominates the tree path's optimizer+EMA cost —
    measured in scripts/exp_flat_opt.py). The group structure
    (ref:engine/trainer.py:768-840 g0/g1/g2) becomes two flat boolean
    masks baked at build time; per-group moment states are elementwise,
    so shared flat moments are bit-equivalent to optax.multi_transform's
    per-group states.

    Supported flat: SGD (nesterov + momentum warmup), Adam family, AdamW,
    AdEMAMix. RMSProp raises (caller falls back to the tree path).
    """
    if name == "auto":
        lr_fit = round(0.002 * 5 / (4 + nc), 6)
        name, lr, momentum = ("SGD", 0.01, 0.9) if iterations > 10000 else ("AdamW", lr_fit, 0.9)
    if name == "RMSProp":
        raise NotImplementedError("flat RMSProp: use build_optimizer")

    wd_mask, bias_mask = _flat_bool_masks(params)
    warm = warmup_steps > 0
    lr_main = schedule if schedule is not None else lr
    if warm:
        lr_main = warmup_wrap(lr_main, warmup_steps, 0.0)
        lr_bias = bias_schedule if bias_schedule is not None else warmup_wrap(
            schedule if schedule is not None else lr, warmup_steps, warmup_bias_lr
        )
        mom_s = warmup_wrap(momentum, warmup_steps, warmup_momentum)
    else:
        lr_bias, mom_s = lr_main, momentum

    def at_step(sched, s):
        return sched(s) if callable(sched) else jnp.asarray(sched, f32)

    adamix = name == "AdEMAMix"
    b2 = 0.999
    b3, alpha, eps = 0.9999, 8.0, 1e-8

    def beta3_t(step):
        def f(beta):
            return jnp.log(0.5) / jnp.log(beta + 1e-8) - 1
        a = jnp.minimum(step / float(max(iterations, 1)), 1.0)
        t = (1 - a) * f(jnp.asarray(momentum, f32)) + a * f(jnp.asarray(b3, f32))
        return jnp.power(0.5, 1.0 / (t + 1))

    def init(flat_params):
        z = jnp.zeros_like(flat_params)
        if name == "SGD":
            return FlatOptState(jnp.zeros([], jnp.int32), z, (), ())
        if adamix:
            return FlatOptState(jnp.zeros([], jnp.int32), z, z, z)
        return FlatOptState(jnp.zeros([], jnp.int32), z, z, ())  # Adam family

    def update(g, state: FlatOptState, p):
        """(flat grads, state, flat params) -> (flat update, state)."""
        t = state.count.astype(f32)  # 0-based, optax schedule convention
        # clip_by_global_norm (optax semantics: scale only when over)
        gnorm = jnp.sqrt(jnp.sum(g.astype(f32) ** 2))
        g = jnp.where(gnorm < clip_norm, g, g / gnorm * clip_norm)
        lr_el = jnp.where(bias_mask, at_step(lr_bias, t), at_step(lr_main, t)) if warm \
            else at_step(lr_main, t)
        wd_el = jnp.where(wd_mask, weight_decay, 0.0) if weight_decay else 0.0
        if warm and weight_decay:
            wd_el = jnp.where(bias_mask, 0.0, wd_el)  # bias group trains wd-free

        if name == "SGD":
            # chain parity: add_decayed_weights BEFORE the momentum buffer
            gw = g + wd_el * p if weight_decay else g
            m = at_step(mom_s, t)
            trace = gw + m * state.mu
            upd = -(lr_el * (gw + m * trace))  # nesterov
            return upd, FlatOptState(state.count + 1, trace, (), ())

        t1 = t + 1.0
        if adamix:
            # parity with ademamix() above: schedules/bc at step = count+1
            b3t = beta3_t(t1)
            at = jnp.minimum(t1 / float(max(iterations, 1)), 1.0) * alpha
            mf = momentum * state.mu + (1 - momentum) * g
            ms = b3t * state.ms + (1 - b3t) * g
            nu = b2 * state.nu + (1 - b2) * g * g
            upd = (mf / (1 - momentum ** t1) + at * ms) / (
                jnp.sqrt(nu / (1 - b2 ** t1)) + eps)
            if weight_decay:
                upd = upd + wd_el * p
            lr1 = jnp.where(bias_mask, at_step(lr_bias, t1), at_step(lr_main, t1)) if warm \
                else at_step(lr_main, t1)
            return -(lr1 * upd), FlatOptState(state.count + 1, mf, nu, ms)

        # Adam / AdamW (optax.scale_by_adam: bias correction at count+1,
        # lr schedule at count; AdamW adds decoupled wd inside the lr scale)
        m = momentum * state.mu + (1 - momentum) * g
        nu = b2 * state.nu + (1 - b2) * g * g
        upd = (m / (1 - momentum ** t1)) / (jnp.sqrt(nu / (1 - b2 ** t1)) + 1e-8)
        if name == "AdamW" and weight_decay:
            upd = upd + wd_el * p
        return -(lr_el * upd), FlatOptState(state.count + 1, m, nu, ())

    return optax.GradientTransformation(init, update), lr, name


class EMAState(NamedTuple):
    params: Any
    updates: jax.Array


def ema_init(params) -> EMAState:
    return EMAState(jax.tree.map(lambda x: x, params), jnp.zeros([], jnp.int32))


def ema_decay_at(updates, decay: float = 0.9999, tau: float = 2000.0):
    """ModelEMA decay ramp: d = decay * (1 - exp(-updates/tau))
    (ref:utils/torch_utils.py:515)."""
    return decay * (1 - jnp.exp(-updates.astype(f32) / tau))


def ema_update(state: EMAState, params, decay: float = 0.9999, tau: float = 2000.0) -> EMAState:
    upd = state.updates + 1
    d = ema_decay_at(upd, decay, tau)
    new = jax.tree.map(lambda e, p: e * d + (1 - d) * p, state.params, params)
    return EMAState(new, upd)
