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


# Adam-family names whose normalized updates forbid the 0.1 bias warmup
# lr (parity: ref:engine/trainer.py:798).
_ADAM_FAMILY = {"Adam", "AdamW", "Adamax", "NAdam", "RAdam", "AdEMAMix"}


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
    if name in _ADAM_FAMILY:
        # Adam-normalized updates make a 0.1 bias warmup lr catastrophic
        # (gate biases saturate in ~30 steps and the net collapses to the
        # label prior — found by the classify convergence artifact).
        # Parity: ref:engine/trainer.py:798 "warmup_bias_lr = 0.0; no
        # higher than 0.01 for Adam".
        warmup_bias_lr = 0.0

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
    if name in _ADAM_FAMILY:
        warmup_bias_lr = 0.0  # ref:engine/trainer.py:798

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
    core = _opt_core(name, momentum, iterations, weight_decay)

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
        t1 = t + 1.0
        lr_t = jnp.where(bias_mask, at_step(lr_bias, t), at_step(lr_main, t)) if warm \
            else at_step(lr_main, t)
        lr_t1 = jnp.where(bias_mask, at_step(lr_bias, t1), at_step(lr_main, t1)) if warm \
            else at_step(lr_main, t1)
        wd_el = jnp.where(wd_mask, weight_decay, 0.0) if weight_decay else 0.0
        if warm and weight_decay:
            wd_el = jnp.where(bias_mask, 0.0, wd_el)  # bias group trains wd-free

        upd, mu, nu, ms = core(
            g, p, state.mu, state.nu, state.ms, t, lr_t, lr_t1, wd_el,
            at_step(mom_s, t),
        )
        return upd, FlatOptState(state.count + 1, mu, nu, ms)

    return optax.GradientTransformation(init, update), lr, name


def _opt_core(name: str, momentum: float, iterations: int, weight_decay: float):
    """Elementwise optimizer math shared by the flat and hybrid builders.

    ``core(g, p, mu, nu, ms, t, lr_t, lr_t1, wd_el, mom_t)`` ->
    ``(update, mu', nu', ms')`` where ``lr_t``/``wd_el`` may be scalars
    (one tree leaf) or elementwise masks (the flat vector).  Semantics
    are locked against the optax tree chain by tests/test_flat_opt.py.
    """
    adamix = name == "AdEMAMix"
    b2, b3, alpha, eps = 0.999, 0.9999, 8.0, 1e-8

    def beta3_t(step):
        def f(beta):
            return jnp.log(0.5) / jnp.log(beta + 1e-8) - 1
        a = jnp.minimum(step / float(max(iterations, 1)), 1.0)
        t = (1 - a) * f(jnp.asarray(momentum, f32)) + a * f(jnp.asarray(b3, f32))
        return jnp.power(0.5, 1.0 / (t + 1))

    def core(g, p, mu, nu, ms, t, lr_t, lr_t1, wd_el, mom_t):
        if name == "SGD":
            # chain parity: add_decayed_weights BEFORE the momentum buffer
            gw = g + wd_el * p if weight_decay else g
            trace = gw + mom_t * mu
            return -(lr_t * (gw + mom_t * trace)), trace, (), ()  # nesterov

        t1 = t + 1.0
        if adamix:
            # parity with ademamix() above: schedules/bc at step = count+1
            b3t = beta3_t(t1)
            at = jnp.minimum(t1 / float(max(iterations, 1)), 1.0) * alpha
            mf = momentum * mu + (1 - momentum) * g
            msl = b3t * ms + (1 - b3t) * g
            nu2 = b2 * nu + (1 - b2) * g * g
            upd = (mf / (1 - momentum ** t1) + at * msl) / (
                jnp.sqrt(nu2 / (1 - b2 ** t1)) + eps)
            if weight_decay:
                upd = upd + wd_el * p
            return -(lr_t1 * upd), mf, nu2, msl

        # Adam / AdamW (optax.scale_by_adam: bias correction at count+1,
        # lr schedule at count; AdamW adds decoupled wd inside the lr scale)
        m = momentum * mu + (1 - momentum) * g
        nu2 = b2 * nu + (1 - b2) * g * g
        upd = (m / (1 - momentum ** t1)) / (jnp.sqrt(nu2 / (1 - b2 ** t1)) + 1e-8)
        if name == "AdamW" and weight_decay:
            upd = upd + wd_el * p
        return -(lr_t * upd), m, nu2, ()

    return core


class HybridOptState(NamedTuple):
    """Flat-block moments + per-sharded-leaf moment tuples."""

    count: jax.Array
    mu: Any
    nu: Any
    ms: Any
    s_mu: Any
    s_nu: Any
    s_ms: Any


def partition_params(params, sharded_tree):
    """Split ``params`` by ``sharded_tree`` (bool pytree, True = leaf is
    'model'-axis sharded) -> (flat_f32_vector_of_replicated_leaves,
    tuple_of_sharded_leaves, split_fn, rebuild_fn).

    The flat vector concatenates replicated leaves in tree-flatten order
    (ravel_pytree convention); sharded leaves stay whole so their
    NamedShardings survive the optimizer untouched.
    """
    import numpy as np

    leaves, treedef = jax.tree_util.tree_flatten(params)
    smask = tuple(bool(s) for s in jax.tree.leaves(sharded_tree))
    assert len(smask) == len(leaves), "sharded mask does not align with params"
    shapes = [l.shape for l in leaves]
    dtypes = [l.dtype for l in leaves]
    sizes = [int(np.prod(s)) for s, m in zip(shapes, smask) if not m]
    offs = np.concatenate([[0], np.cumsum(sizes)]).astype(int)

    def split(tree):
        lv = jax.tree_util.tree_flatten(tree)[0]
        repl = [jnp.ravel(l).astype(f32) for l, m in zip(lv, smask) if not m]
        flat = jnp.concatenate(repl) if repl else jnp.zeros((0,), f32)
        return flat, tuple(l for l, m in zip(lv, smask) if m)

    def rebuild(flat, shard):
        out, it, k = [], iter(shard), 0
        for i, m in enumerate(smask):
            if m:
                out.append(next(it))
            else:
                out.append(
                    flat[offs[k]:offs[k + 1]].reshape(shapes[i]).astype(dtypes[i]))
                k += 1
        return jax.tree_util.tree_unflatten(treedef, out)

    flat0, shard0 = split(params)
    return flat0, shard0, split, rebuild


def build_hybrid_optimizer(
    params,
    sharded_tree,
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
    """``build_flat_optimizer`` for a tensor-parallel param tree.

    Replicated leaves ride ONE flat f32 vector (the fused-elementwise win
    of the flat path); 'model'-axis-sharded leaves keep their own moment
    buffers, which inherit the leaf's NamedSharding so the optimizer
    never gathers a sharded kernel.  Grads/params/updates travel as the
    pair ``(flat_vector, tuple_of_sharded_leaves)``; global-norm clipping
    sums squares across BOTH parts so the math matches the tree chain's
    clip_by_global_norm exactly.  Same optimizer support as the flat
    builder (RMSProp raises; caller falls back to the tree path).
    """
    if name == "auto":
        lr_fit = round(0.002 * 5 / (4 + nc), 6)
        name, lr, momentum = ("SGD", 0.01, 0.9) if iterations > 10000 else ("AdamW", lr_fit, 0.9)
    if name == "RMSProp":
        raise NotImplementedError("hybrid RMSProp: use build_optimizer")
    if name in _ADAM_FAMILY:
        warmup_bias_lr = 0.0  # ref:engine/trainer.py:798

    import numpy as np

    leaves = jax.tree.leaves(params)
    smask = [bool(s) for s in jax.tree.leaves(sharded_tree)]
    wd_leaf = [bool(w) for w in jax.tree.leaves(decay_mask_fn(params))]
    bias_leaf = [lab == "bias" for lab in jax.tree.leaves(bias_label_fn(params))]
    repl = [(int(np.prod(l.shape)), w, b)
            for l, m, w, b in zip(leaves, smask, wd_leaf, bias_leaf) if not m]
    wd_mask = jnp.asarray(
        np.concatenate([np.full(n, w) for n, w, _ in repl])
        if repl else np.zeros(0, bool))
    bias_mask = jnp.asarray(
        np.concatenate([np.full(n, b) for n, _, b in repl])
        if repl else np.zeros(0, bool))
    s_wd = tuple(w for m, w in zip(smask, wd_leaf) if m)
    s_bias = tuple(b for m, b in zip(smask, bias_leaf) if m)

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
    core = _opt_core(name, momentum, iterations, weight_decay)

    def init(p2):
        flat, shard = p2
        z = jnp.zeros_like(flat)
        zs = tuple(jnp.zeros_like(x) for x in shard)
        e = tuple(() for _ in shard)
        if name == "SGD":
            return HybridOptState(jnp.zeros([], jnp.int32), z, (), (), zs, e, e)
        if adamix:
            return HybridOptState(jnp.zeros([], jnp.int32), z, z, z, zs, zs, zs)
        return HybridOptState(jnp.zeros([], jnp.int32), z, z, (), zs, zs, e)

    def update(g2, state: HybridOptState, p2):
        gf, gs = g2
        pf, ps = p2
        t = state.count.astype(f32)
        # joint clip_by_global_norm over flat + sharded parts (the sum of
        # per-shard partial squares is replicated by XLA's psum)
        sq = jnp.sum(gf.astype(f32) ** 2) + sum(
            jnp.sum(x.astype(f32) ** 2) for x in gs)
        gnorm = jnp.sqrt(sq)
        cs = jnp.where(gnorm < clip_norm, 1.0, clip_norm / gnorm)
        gf = gf * cs
        gs = tuple(x * cs for x in gs)

        t1 = t + 1.0
        lm_t, lm_t1 = at_step(lr_main, t), at_step(lr_main, t1)
        lb_t = at_step(lr_bias, t) if warm else lm_t
        lb_t1 = at_step(lr_bias, t1) if warm else lm_t1
        mom_t = at_step(mom_s, t)

        lr_t = jnp.where(bias_mask, lb_t, lm_t) if warm else lm_t
        lr_t1 = jnp.where(bias_mask, lb_t1, lm_t1) if warm else lm_t1
        wd_el = jnp.where(wd_mask, weight_decay, 0.0) if weight_decay else 0.0
        uf, mu, nu, ms = core(gf, pf, state.mu, state.nu, state.ms, t,
                              lr_t, lr_t1, wd_el, mom_t)

        us, smu, snu, sms = [], [], [], []
        for i, gx in enumerate(gs):
            lt = lb_t if (warm and s_bias[i]) else lm_t
            lt1 = lb_t1 if (warm and s_bias[i]) else lm_t1
            wd_i = weight_decay if s_wd[i] else 0.0
            u, m2, n2, s2 = core(gx, ps[i], state.s_mu[i], state.s_nu[i],
                                 state.s_ms[i], t, lt, lt1, wd_i, mom_t)
            us.append(u)
            smu.append(m2)
            snu.append(n2)
            sms.append(s2)
        new = HybridOptState(state.count + 1, mu, nu, ms,
                             tuple(smu), tuple(snu), tuple(sms))
        return (uf, tuple(us)), new

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
