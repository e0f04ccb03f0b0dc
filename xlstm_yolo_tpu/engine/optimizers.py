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
            def add_wd(u, p, m=True):
                return u + weight_decay * p if m else u
            if wd_mask is None:
                updates = jax.tree.map(lambda u, p: u + weight_decay * p, updates, params)
            else:
                updates = jax.tree.map(add_wd, updates, params, wd_mask)
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


class EMAState(NamedTuple):
    params: Any
    updates: jax.Array


def ema_init(params) -> EMAState:
    return EMAState(jax.tree.map(lambda x: x, params), jnp.zeros([], jnp.int32))


def ema_update(state: EMAState, params, decay: float = 0.9999, tau: float = 2000.0) -> EMAState:
    """ModelEMA decay ramp: d = decay * (1 - exp(-updates/tau))."""
    upd = state.updates + 1
    d = decay * (1 - jnp.exp(-upd.astype(f32) / tau))
    new = jax.tree.map(lambda e, p: e * d + (1 - d) * p, state.params, params)
    return EMAState(new, upd)
