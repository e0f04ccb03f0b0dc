"""SAM (Segment Anything) modules in flax, NHWC.

TPU-native re-design of ref:ultralytics/models/sam/modules/{encoders,
decoders,transformer,blocks,utils}.py (the SAM ViT-B/L/H family; SAM2 /
MobileSAM variants are out of scope):

- ImageEncoderViT: 16x16 patch embed (space-to-depth GEMM), absolute
  position embedding, windowed attention blocks with decomposed relative
  positions (MViTv2 form), channels-last "LayerNorm2d" neck;
- PromptEncoder: random-Fourier positional encoding, point/box/mask
  embeddings — padding points carry label -1 and are handled with
  ``where`` masks (fixed shapes under jit, no boolean indexing);
- TwoWayTransformer + MaskDecoder: token<->image cross attention,
  hypernetwork mask heads, IoU quality head.

All array layouts are channels-last; torch NCHW convs map to NHWC convs
with HWIO kernels (utils/torch_convert conventions).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

f32 = jnp.float32


# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------


class LayerNorm2d(nn.Module):
    """Channelwise LayerNorm over NHWC (ref:blocks.py LayerNorm2d)."""

    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        xf = x.astype(f32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        y = (xf - mu) / jnp.sqrt(var + self.eps)
        w = self.param("weight", nn.initializers.ones, (self.dim,), f32)
        b = self.param("bias", nn.initializers.zeros, (self.dim,), f32)
        return (y * w + b).astype(x.dtype)


class MLPBlock(nn.Module):
    """Linear -> act -> Linear (ref:transformer.py MLPBlock)."""

    mlp_dim: int
    out_dim: int
    act: str = "gelu"

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.mlp_dim, name="lin1")(x)
        y = nn.gelu(y, approximate=False) if self.act == "gelu" else nn.relu(y)
        return nn.Dense(self.out_dim, name="lin2")(y)


def window_partition(x, ws: int):
    """(B, H, W, C) -> (B*nW, ws, ws, C) with bottom/right zero pad
    (ref:utils.py:126-155)."""
    B, H, W, C = x.shape
    ph, pw = (-H) % ws, (-W) % ws
    if ph or pw:
        x = jnp.pad(x, [(0, 0), (0, ph), (0, pw), (0, 0)])
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    win = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
    return win, (Hp, Wp)


def window_unpartition(win, ws: int, pad_hw, hw):
    """Inverse of :func:`window_partition` (ref:utils.py:158-193)."""
    Hp, Wp = pad_hw
    H, W = hw
    B = win.shape[0] // (Hp * Wp // ws // ws)
    x = win.reshape(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


def _rel_pos_table(q_size: int, k_size: int, rel_pos):
    """(2*max-1, C) table -> (q, k, C) lookup (ref:utils.py:196-236;
    sizes always match here, so no interpolation branch)."""
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


class SamAttention(nn.Module):
    """ViT self-attention with decomposed relative positions
    (ref:blocks.py:977-1073 REAttention)."""

    dim: int
    num_heads: int
    use_rel_pos: bool = True
    input_size: tuple = (14, 14)

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        B, H, W, C = x.shape
        nh = self.num_heads
        dh = C // nh
        qkv = nn.Dense(3 * C, name="qkv")(x).reshape(B, H * W, 3, nh, dh)
        q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3).reshape(B * nh, H * W, dh)
                   for i in range(3)]
        attn = (q * (dh ** -0.5)) @ k.transpose(0, 2, 1)  # (B*nh, HW, HW)
        if self.use_rel_pos:
            rp_h = self.param("rel_pos_h", nn.initializers.zeros,
                              (2 * self.input_size[0] - 1, dh), f32)
            rp_w = self.param("rel_pos_w", nn.initializers.zeros,
                              (2 * self.input_size[1] - 1, dh), f32)
            Rh = _rel_pos_table(H, H, rp_h)
            Rw = _rel_pos_table(W, W, rp_w)
            rq = q.reshape(B * nh, H, W, dh)
            rel_h = jnp.einsum("bhwc,hkc->bhwk", rq, Rh.astype(rq.dtype))
            rel_w = jnp.einsum("bhwc,wkc->bhwk", rq, Rw.astype(rq.dtype))
            attn = (attn.reshape(B * nh, H, W, H, W)
                    + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
                    ).reshape(B * nh, H * W, H * W)
        attn = jax.nn.softmax(attn.astype(f32), -1).astype(x.dtype)
        y = (attn @ v).reshape(B, nh, H, W, dh).transpose(0, 2, 3, 1, 4)
        return nn.Dense(C, name="proj")(y.reshape(B, H, W, C))


class SamVitBlock(nn.Module):
    """Windowed / global ViT block (ref:blocks.py:877-975)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    window_size: int = 0
    input_size: tuple = (64, 64)

    @nn.compact
    def __call__(self, x):
        sc = x
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x).astype(x.dtype)
        if self.window_size > 0:
            H, W = y.shape[1], y.shape[2]
            y, pad_hw = window_partition(y, self.window_size)
        size = ((self.window_size,) * 2 if self.window_size > 0
                else self.input_size)
        y = SamAttention(dim=self.dim, num_heads=self.num_heads,
                         input_size=size, name="attn")(y)
        if self.window_size > 0:
            y = window_unpartition(y, self.window_size, pad_hw, (H, W))
        x = sc + y
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x).astype(x.dtype)
        return x + MLPBlock(int(self.dim * self.mlp_ratio), self.dim,
                            name="mlp")(y)


class ImageEncoderViT(nn.Module):
    """SAM image encoder (ref:encoders.py:23-163), ViT-B defaults."""

    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Sequence[int] = (2, 5, 8, 11)

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3) normalized
        B, H, W, _ = x.shape
        p = self.patch_size
        # space-to-depth patchify + GEMM (conv-shaped params, see
        # nn/layers.VitPatchEmbed rationale: C_in=3 convs run ~1% MXU)
        xp = x.reshape(B, H // p, p, W // p, p, 3)
        xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // p, W // p, p * p * 3)
        kernel = self.param("patch_embed_kernel",
                            nn.initializers.lecun_normal(),
                            (p, p, 3, self.embed_dim), f32)
        bias = self.param("patch_embed_bias", nn.initializers.zeros,
                          (self.embed_dim,), f32)
        y = xp @ kernel.reshape(p * p * 3, self.embed_dim).astype(xp.dtype) + bias

        gh = self.img_size // p
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, gh, gh, self.embed_dim), f32)
        if y.shape[1] != gh:  # non-1024 inputs: bilinear resize like F.interpolate
            pos = jax.image.resize(pos, (1, y.shape[1], y.shape[2], self.embed_dim),
                                   "bilinear")
        y = y + pos.astype(y.dtype)

        size = (y.shape[1], y.shape[2])
        for i in range(self.depth):
            y = SamVitBlock(
                dim=self.embed_dim, num_heads=self.num_heads,
                window_size=0 if i in tuple(self.global_attn_indexes)
                else self.window_size,
                input_size=size, name=f"blocks_{i}",
            )(y)

        y = nn.Conv(self.out_chans, (1, 1), use_bias=False, name="neck_conv1")(y)
        y = LayerNorm2d(self.out_chans, name="neck_ln1")(y)
        y = nn.Conv(self.out_chans, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="neck_conv2")(y)
        return LayerNorm2d(self.out_chans, name="neck_ln2")(y)


# ---------------------------------------------------------------------------
# prompt encoder
# ---------------------------------------------------------------------------


class PositionEmbeddingRandom(nn.Module):
    """Random-Fourier positional encoding (ref:blocks.py:813-875)."""

    num_pos_feats: int = 128

    @nn.compact
    def __call__(self, coords01):  # (..., 2) in [0, 1]
        g = self.param("positional_encoding_gaussian_matrix",
                       nn.initializers.normal(1.0), (2, self.num_pos_feats), f32)
        c = (2 * coords01.astype(f32) - 1) @ g * (2 * math.pi)
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], -1)

    def grid(self, h: int, w: int):
        ys = (jnp.arange(h, dtype=f32) + 0.5) / h
        xs = (jnp.arange(w, dtype=f32) + 0.5) / w
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        return self(jnp.stack([gx, gy], -1))  # (h, w, 2*feats)


class PromptEncoder(nn.Module):
    """Point/box/mask prompt embeddings (ref:encoders.py:165-377).

    Points use labels: 1 fg, 0 bg, -1 padding (zeroed + not_a_point),
    2/3 box corners. Fixed shapes: callers pad to a static N.
    """

    embed_dim: int = 256
    image_embedding_size: tuple = (64, 64)
    input_image_size: tuple = (1024, 1024)
    mask_in_chans: int = 16

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2)
        self.point_embeddings = [
            self.param(f"point_embed_{i}", nn.initializers.normal(1.0),
                       (self.embed_dim,), f32) for i in range(4)
        ]
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0),
            (self.embed_dim,), f32)
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (self.embed_dim,), f32)
        c = self.mask_in_chans
        self.mask_conv1 = nn.Conv(c // 4, (2, 2), strides=(2, 2), name="mask_conv1")
        self.mask_ln1 = LayerNorm2d(c // 4, name="mask_ln1")
        self.mask_conv2 = nn.Conv(c, (2, 2), strides=(2, 2), name="mask_conv2")
        self.mask_ln2 = LayerNorm2d(c, name="mask_ln2")
        self.mask_conv3 = nn.Conv(self.embed_dim, (1, 1), name="mask_conv3")

    def get_dense_pe(self):
        h, w = self.image_embedding_size
        return self.pe_layer.grid(h, w)[None]  # (1, h, w, C)

    def _embed_points(self, points, labels):
        pts = (points.astype(f32) + 0.5) / jnp.asarray(
            [self.input_image_size[1], self.input_image_size[0]], f32)
        pe = self.pe_layer(pts)  # (B, N, C)
        lab = labels[..., None]
        pe = jnp.where(lab == -1, 0.0, pe)
        add = jnp.zeros_like(pe)
        for val, emb in [(-1, self.not_a_point_embed),
                         (0, self.point_embeddings[0]),
                         (1, self.point_embeddings[1]),
                         (2, self.point_embeddings[2]),
                         (3, self.point_embeddings[3])]:
            add = add + jnp.where(lab == val, emb[None, None], 0.0)
        return pe + add

    def _embed_masks(self, masks):  # (B, H4, W4, 1)
        y = nn.gelu(self.mask_ln1(self.mask_conv1(masks)), approximate=False)
        y = nn.gelu(self.mask_ln2(self.mask_conv2(y)), approximate=False)
        return self.mask_conv3(y)

    def __call__(self, points=None, boxes=None, masks=None):
        parts = []
        if points is not None:
            coords, labels = points
            if boxes is None:  # reference pads a single not-a-point
                coords = jnp.concatenate(
                    [coords, jnp.zeros((coords.shape[0], 1, 2), coords.dtype)], 1)
                labels = jnp.concatenate(
                    [labels, -jnp.ones((labels.shape[0], 1), labels.dtype)], 1)
            parts.append(self._embed_points(coords, labels))
        if boxes is not None:
            corners = (boxes.astype(f32) + 0.5).reshape(boxes.shape[0], -1, 2, 2)
            pts = corners / jnp.asarray(
                [self.input_image_size[1], self.input_image_size[0]], f32)
            ce = self.pe_layer(pts)
            ce = ce.at[:, :, 0].add(self.point_embeddings[2][None, None])
            ce = ce.at[:, :, 1].add(self.point_embeddings[3][None, None])
            parts.append(ce.reshape(boxes.shape[0], -1, self.embed_dim))
        sparse = (jnp.concatenate(parts, 1) if parts
                  else jnp.zeros((1, 0, self.embed_dim), f32))
        if masks is not None:
            dense = self._embed_masks(masks)
        else:
            h, w = self.image_embedding_size
            dense = jnp.broadcast_to(
                self.no_mask_embed[None, None, None],
                (sparse.shape[0], h, w, self.embed_dim))
        return sparse, dense


# ---------------------------------------------------------------------------
# two-way transformer + mask decoder
# ---------------------------------------------------------------------------


class DownsampledAttention(nn.Module):
    """q/k/v projected to embedding_dim/downsample_rate (ref:transformer.py:265)."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        d = self.embedding_dim // self.downsample_rate
        nh = self.num_heads
        dh = d // nh

        def heads(x):
            B, N, _ = x.shape
            return x.reshape(B, N, nh, dh).transpose(0, 2, 1, 3)

        qh = heads(nn.Dense(d, name="q_proj")(q))
        kh = heads(nn.Dense(d, name="k_proj")(k))
        vh = heads(nn.Dense(d, name="v_proj")(v))
        attn = jax.nn.softmax(
            (qh @ kh.transpose(0, 1, 3, 2)).astype(f32) / math.sqrt(dh), -1
        ).astype(q.dtype)
        y = (attn @ vh).transpose(0, 2, 1, 3).reshape(q.shape[0], q.shape[1], d)
        return nn.Dense(self.embedding_dim, name="out_proj")(y)


class TwoWayAttentionBlock(nn.Module):
    """Sparse<->dense two-way block (ref:transformer.py:152-263)."""

    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    skip_first_layer_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = DownsampledAttention(
                self.embedding_dim, self.num_heads, name="self_attn"
            )(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + DownsampledAttention(
                self.embedding_dim, self.num_heads, name="self_attn")(q, q, queries)
        queries = nn.LayerNorm(name="norm1")(queries).astype(queries.dtype)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DownsampledAttention(
            self.embedding_dim, self.num_heads, downsample_rate=2,
            name="cross_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(name="norm2")(queries).astype(queries.dtype)

        queries = queries + MLPBlock(self.mlp_dim, self.embedding_dim,
                                     act="relu", name="mlp")(queries)
        queries = nn.LayerNorm(name="norm3")(queries).astype(queries.dtype)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DownsampledAttention(
            self.embedding_dim, self.num_heads, downsample_rate=2,
            name="cross_attn_image_to_token")(k, q, queries)
        keys = nn.LayerNorm(name="norm4")(keys).astype(keys.dtype)
        return queries, keys


class TwoWayTransformer(nn.Module):
    """(ref:transformer.py:12-150)."""

    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        # NHWC grid -> (B, HW, C)
        B, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(B, h * w, c)
        key_pe = image_pe.reshape(image_pe.shape[0], h * w, c)
        queries = point_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.embedding_dim, self.num_heads, self.mlp_dim,
                skip_first_layer_pe=(i == 0), name=f"layers_{i}",
            )(queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + DownsampledAttention(
            self.embedding_dim, self.num_heads, downsample_rate=2,
            name="final_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(name="norm_final_attn")(queries).astype(queries.dtype)
        return queries, keys


class SamMLP(nn.Module):
    """Plain MLP head (ref:blocks.py MLP)."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 3
    sigmoid_output: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            x = nn.Dense(self.output_dim if last else self.hidden_dim,
                         name=f"layers_{i}")(x)
            if not last:
                x = nn.relu(x)
        return jax.nn.sigmoid(x) if self.sigmoid_output else x


class MaskDecoder(nn.Module):
    """Mask + IoU decoder (ref:decoders.py:11-174)."""

    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    tf_depth: int = 2
    tf_heads: int = 8
    tf_mlp_dim: int = 2048

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt, dense_prompt,
                 multimask_output: bool = True):
        td = self.transformer_dim
        nmt = self.num_multimask_outputs + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (td,), f32)
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (nmt, td), f32)
        B = sparse_prompt.shape[0]
        out_tokens = jnp.broadcast_to(
            jnp.concatenate([iou_token[None], mask_tokens], 0)[None],
            (B, 1 + nmt, td))
        tokens = jnp.concatenate([out_tokens.astype(sparse_prompt.dtype),
                                  sparse_prompt], 1)

        src = image_embeddings + dense_prompt  # (B, h, w, C)
        hs, keys = TwoWayTransformer(
            depth=self.tf_depth, embedding_dim=td, num_heads=self.tf_heads,
            mlp_dim=self.tf_mlp_dim, name="transformer",
        )(src, image_pe, tokens)
        iou_out = hs[:, 0]
        mask_out = hs[:, 1:1 + nmt]

        h, w = src.shape[1], src.shape[2]
        y = keys.reshape(B, h, w, td)
        y = nn.ConvTranspose(td // 4, (2, 2), strides=(2, 2),
                             padding=[(1, 1), (1, 1)], name="upscale_conv1")(y)
        y = nn.gelu(LayerNorm2d(td // 4, name="upscale_ln")(y), approximate=False)
        y = nn.ConvTranspose(td // 8, (2, 2), strides=(2, 2),
                             padding=[(1, 1), (1, 1)], name="upscale_conv2")(y)
        y = nn.gelu(y, approximate=False)  # (B, 4h, 4w, td/8)

        hyper = jnp.stack([
            SamMLP(td, td // 8, 3, name=f"output_hypernetworks_mlps_{i}")(
                mask_out[:, i])
            for i in range(nmt)
        ], 1)  # (B, nmt, td/8)
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper, y)
        iou_pred = SamMLP(self.iou_head_hidden_dim, nmt, self.iou_head_depth,
                          name="iou_prediction_head")(iou_out)

        sl = slice(1, None) if multimask_output else slice(0, 1)
        return masks[:, sl], iou_pred[:, sl]


class SAMModel(nn.Module):
    """End-to-end SAM: encoder + prompts -> masks (ref:modules/sam.py).

    ``__call__`` takes a normalized, padded (B, S, S, 3) image and fixed-
    shape prompts; returns (low-res masks (B, k, S/4, S/4), iou (B, k)).
    """

    img_size: int = 1024
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    global_attn_indexes: Sequence[int] = (2, 5, 8, 11)
    prompt_embed_dim: int = 256
    encoder_type: str = "vit"  # "vit" | "tiny" (MobileSAM TinyViT)

    def setup(self):
        gs = self.img_size // 16
        if self.encoder_type == "tiny":
            from xlstm_yolo_tpu.models.sam.tiny_encoder import TinyViT

            self.image_encoder = TinyViT(
                img_size=self.img_size, neck_dim=self.prompt_embed_dim)
        else:
            self.image_encoder = ImageEncoderViT(
                img_size=self.img_size, embed_dim=self.embed_dim,
                depth=self.depth, num_heads=self.num_heads,
                out_chans=self.prompt_embed_dim,
                global_attn_indexes=self.global_attn_indexes)
        self.prompt_encoder = PromptEncoder(
            embed_dim=self.prompt_embed_dim, image_embedding_size=(gs, gs),
            input_image_size=(self.img_size, self.img_size))
        self.mask_decoder = MaskDecoder(transformer_dim=self.prompt_embed_dim)

    def __call__(self, image, points=None, boxes=None, masks=None,
                 multimask_output: bool = True):
        emb = self.image_encoder(image)
        sparse, dense = self.prompt_encoder(points=points, boxes=boxes,
                                            masks=masks)
        pe = self.prompt_encoder.get_dense_pe()
        return self.mask_decoder(emb, pe, sparse.astype(emb.dtype),
                                 dense.astype(emb.dtype), multimask_output)

    # split entry points for the interactive predictor: encode once,
    # decode many prompts against the cached embedding
    def encode_image(self, image):
        return self.image_encoder(image)

    def decode_prompts(self, emb, points=None, boxes=None, masks=None,
                       multimask_output: bool = True):
        sparse, dense = self.prompt_encoder(points=points, boxes=boxes,
                                            masks=masks)
        pe = self.prompt_encoder.get_dense_pe()
        return self.mask_decoder(emb, pe, sparse.astype(emb.dtype),
                                 dense.astype(emb.dtype), multimask_output)
