"""Experimental per-patch MLP detection heads.

Parity target: ref:ultralytics/nn/modules/vision_lstm/YOLO-Head.py — a
scratchpad of dense detection heads over ViL patch embeddings (YOLO-grid
style: each patch predicts ``num_boxes`` boxes of [x, y, w, h, conf] +
class scores).  The reference file is dormant: its dashed filename makes
it unimportable as a module, most classes are defined 2-3 times (the
LAST definition wins — that is what we implement), and the final
``ResidualMLPHead``/``GatedMLPHead`` forwards reference an undefined
``num_classes`` (NameError; the intended ``self.num_classes`` is
implemented here, which the golden test reproduces by injecting the
name).  Module names mirror the torch Sequential indices (``mlp_0``,
``mlp_3`` ...) so utils/torch_convert maps state_dicts 1:1.

All heads are single fused matmul chains over (B, S, D) — MXU-shaped by
construction; dropout is fixed-shape Bernoulli masking under training.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from xlstm_yolo_tpu.nn.layers import small_init, wang_init

__all__ = [
    "YOLOMLPHead",
    "DeepMLPHead",
    "SeparatedMLPHead",
    "ResidualMLPHead",
    "GatedMLPHead",
    "DETRMLPHead",
    "DINOMLPHead",
]


def _init(init_weights: str, dim: int, num_blocks: int | None):
    """ref YOLO-Head.py:864-872: small_init or wang_init by flag.

    The reference passes each Linear's own fan-in (``weight.size(1)``);
    we mirror by returning a factory the caller feeds the fan-in to.
    """
    if init_weights == "original":
        return lambda fan_in: small_init(fan_in)
    if init_weights == "original-fixed":
        if num_blocks is None:
            raise ValueError("num_blocks required for 'original-fixed'")
        return lambda fan_in: wang_init(fan_in, num_blocks)
    raise NotImplementedError(f"init_weights {init_weights!r}")


class YOLOMLPHead(nn.Module):
    """2-layer ReLU MLP head (ref:YOLO-Head.py:5-84 — single definition).

    (B, S, D) -> (B, S, num_boxes, 5 + num_classes).  NOTE: this first
    class inits with the MODULE dim for both layers (ref::68-72), unlike
    the later heads which use each layer's own fan-in.
    """

    dim: int
    num_classes: int
    num_boxes: int = 2
    hidden_dim: int = 512
    init_weights: str = "original"
    num_blocks: int | None = None
    training: bool = False  # no dropout in this head; kept for API uniformity

    @nn.compact
    def __call__(self, x):
        B, S, _ = x.shape
        ki = _init(self.init_weights, self.dim, self.num_blocks)
        h = nn.relu(nn.Dense(self.hidden_dim, kernel_init=ki(self.dim),
                             name="mlp_0")(x))
        out = nn.Dense(self.num_boxes * (5 + self.num_classes),
                       kernel_init=ki(self.dim), name="mlp_2")(h)
        return out.reshape(B, S, self.num_boxes, 5 + self.num_classes)


class DeepMLPHead(nn.Module):
    """Deep GELU/dropout MLP head (ref:YOLO-Head.py:822-872, final def)."""

    dim: int
    num_classes: int
    num_boxes: int = 2
    hidden_dim: int = 512
    num_hidden_layers: int = 2
    dropout: float = 0.1
    init_weights: str = "original"
    num_blocks: int | None = None
    training: bool = False

    @nn.compact
    def __call__(self, x):
        B, S, _ = x.shape
        ki = _init(self.init_weights, self.dim, self.num_blocks)
        drop = nn.Dropout(self.dropout, deterministic=not self.training)
        h = drop(nn.gelu(nn.Dense(self.hidden_dim, kernel_init=ki(self.dim),
                                  name="mlp_0")(x), approximate=False))
        for i in range(self.num_hidden_layers):
            h = drop(nn.gelu(nn.Dense(
                self.hidden_dim, kernel_init=ki(self.hidden_dim),
                name=f"mlp_{3 + 3 * i}")(h), approximate=False))
        out = nn.Dense(self.num_boxes * (5 + self.num_classes),
                       kernel_init=ki(self.hidden_dim),
                       name=f"mlp_{3 + 3 * self.num_hidden_layers}")(h)
        return out.reshape(B, S, self.num_boxes, 5 + self.num_classes)


class SeparatedMLPHead(nn.Module):
    """Separate box MLP (3-layer) + linear cls head (ref:YOLO-Head.py:873-924)."""

    dim: int
    num_classes: int
    num_boxes: int = 2
    hidden_dim: int = 512
    dropout: float = 0.1
    init_weights: str = "original"
    num_blocks: int | None = None
    training: bool = False

    @nn.compact
    def __call__(self, x):
        B, S, _ = x.shape
        ki = _init(self.init_weights, self.dim, self.num_blocks)
        drop = nn.Dropout(self.dropout, deterministic=not self.training)
        h = drop(nn.gelu(nn.Dense(self.hidden_dim, kernel_init=ki(self.dim),
                                  name="box_mlp_0")(x), approximate=False))
        h = drop(nn.gelu(nn.Dense(self.hidden_dim,
                                  kernel_init=ki(self.hidden_dim),
                                  name="box_mlp_3")(h), approximate=False))
        box = nn.Dense(self.num_boxes * 5, kernel_init=ki(self.hidden_dim),
                       name="box_mlp_6")(h)
        cls = nn.Dense(self.num_boxes * self.num_classes,
                       kernel_init=ki(self.dim), name="cls_mlp")(x)
        box = box.reshape(B, S, self.num_boxes, 5)
        cls = cls.reshape(B, S, self.num_boxes, self.num_classes)
        return jnp.concatenate([box, cls], axis=-1)


class _ResidualBlock(nn.Module):
    """Pre-norm residual MLP block (ref:YOLO-Head.py:805-820, final def)."""

    dim: int
    dropout: float = 0.1
    kernel_init: object = nn.initializers.lecun_normal()
    training: bool = False

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(name="norm")(x)
        h = nn.gelu(nn.Dense(self.dim, kernel_init=self.kernel_init,
                             name="linear")(h), approximate=False)
        h = nn.Dropout(self.dropout, deterministic=not self.training)(h)
        return x + h


class ResidualMLPHead(nn.Module):
    """Residual-block MLP head (ref:YOLO-Head.py:925-968, final def —
    whose forward's bare ``num_classes`` is implemented as the intended
    ``self.num_classes``)."""

    dim: int
    num_classes: int
    num_boxes: int = 2
    hidden_dim: int = 512
    num_residual_blocks: int = 2
    dropout: float = 0.1
    init_weights: str = "original"
    num_blocks: int | None = None
    training: bool = False

    @nn.compact
    def __call__(self, x):
        B, S, _ = x.shape
        ki = _init(self.init_weights, self.dim, self.num_blocks)
        drop = nn.Dropout(self.dropout, deterministic=not self.training)
        h = drop(nn.gelu(nn.Dense(self.hidden_dim, kernel_init=ki(self.dim),
                                  name="mlp_0")(x), approximate=False))
        for i in range(self.num_residual_blocks):
            h = _ResidualBlock(
                self.hidden_dim, self.dropout, kernel_init=ki(self.hidden_dim),
                training=self.training, name=f"mlp_{3 + i}")(h)
        out = nn.Dense(self.num_boxes * (5 + self.num_classes),
                       kernel_init=ki(self.hidden_dim),
                       name=f"mlp_{3 + self.num_residual_blocks}")(h)
        return out.reshape(B, S, self.num_boxes, 5 + self.num_classes)


class GatedMLPHead(nn.Module):
    """'Gated' MLP head (ref:YOLO-Head.py:969-1017, final def).

    The reference's Sequential applies Sigmoid as a plain elementwise
    activation (not a multiplicative gate); mirrored as written.  Its
    forward's bare ``num_classes`` is implemented as ``self.num_classes``.
    """

    dim: int
    num_classes: int
    num_boxes: int = 2
    hidden_dim: int = 512
    num_hidden_layers: int = 2
    dropout: float = 0.1
    init_weights: str = "original"
    num_blocks: int | None = None
    training: bool = False

    @nn.compact
    def __call__(self, x):
        B, S, _ = x.shape
        ki = _init(self.init_weights, self.dim, self.num_blocks)
        drop = nn.Dropout(self.dropout, deterministic=not self.training)
        h = drop(nn.gelu(nn.Dense(self.hidden_dim, kernel_init=ki(self.dim),
                                  name="mlp_0")(x), approximate=False))
        for i in range(self.num_hidden_layers):
            base = 3 + 6 * i
            h = drop(nn.gelu(nn.Dense(
                2 * self.hidden_dim, kernel_init=ki(self.hidden_dim),
                name=f"mlp_{base}")(h), approximate=False))
            h = drop(nn.sigmoid(nn.Dense(
                self.hidden_dim, kernel_init=ki(2 * self.hidden_dim),
                name=f"mlp_{base + 3}")(h)))
        out = nn.Dense(self.num_boxes * (5 + self.num_classes),
                       kernel_init=ki(self.hidden_dim),
                       name=f"mlp_{3 + 6 * self.num_hidden_layers}")(h)
        return out.reshape(B, S, self.num_boxes, 5 + self.num_classes)


class DETRMLPHead(SeparatedMLPHead):
    """DETR-style head: 3-layer box MLP + linear cls (ref:YOLO-Head.py:352-419).

    Structurally identical to the final SeparatedMLPHead (same Sequential
    indices and cls linear), so it shares the implementation and the
    torch name mapping."""


class DINOMLPHead(DETRMLPHead):
    """DINO variant — mirrors DETRMLPHead exactly (ref:YOLO-Head.py:421-434)."""
