"""Torch SAM checkpoint -> flax params conversion.

Maps the reference state-dict layout (ref:ultralytics/models/sam/build.py
_build_sam; facebookresearch SAM checkpoints use the same names) onto
:mod:`xlstm_yolo_tpu.models.sam.modules`.  Works with any config —
including tiny random-weight instances, which is how the golden tests
establish numerical parity without pretrained downloads.
"""

from __future__ import annotations

import numpy as np

__all__ = ["convert_sam_state_dict"]


def _lin(sd, name):
    return {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _lin_nobias(sd, name):
    return {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T)}


def _conv(sd, name, bias=True):
    out = {"kernel": np.ascontiguousarray(
        np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0)))}
    if bias:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _convT(sd, name):
    # torch ConvTranspose2d weight (in, out, kh, kw) -> flax (kh, kw, in, out),
    # spatially flipped (torch correlates the transposed kernel)
    w = np.transpose(sd[f"{name}.weight"], (2, 3, 0, 1))[::-1, ::-1]
    return {"kernel": np.ascontiguousarray(w),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _ln(sd, name):
    return {"scale": np.asarray(sd[f"{name}.weight"]),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _ln2d(sd, name):
    return {"weight": np.asarray(sd[f"{name}.weight"]),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _attn_ds(sd, name):
    return {p: _lin(sd, f"{name}.{p}") for p in
            ("q_proj", "k_proj", "v_proj", "out_proj")}


def _mlp_block(sd, name):
    return {"lin1": _lin(sd, f"{name}.lin1"), "lin2": _lin(sd, f"{name}.lin2")}


def _sam_mlp(sd, name, n):
    return {f"layers_{j}": _lin(sd, f"{name}.layers.{j}") for j in range(n)}


def convert_image_encoder(sd, depth: int) -> dict:
    p = {
        "patch_embed_kernel": np.ascontiguousarray(
            np.transpose(sd["patch_embed.proj.weight"], (2, 3, 1, 0))),
        "patch_embed_bias": np.asarray(sd["patch_embed.proj.bias"]),
        "pos_embed": np.asarray(sd["pos_embed"]),
        "neck_conv1": _conv(sd, "neck.0", bias=False),
        "neck_ln1": _ln2d(sd, "neck.1"),
        "neck_conv2": _conv(sd, "neck.2", bias=False),
        "neck_ln2": _ln2d(sd, "neck.3"),
    }
    for i in range(depth):
        b = f"blocks.{i}"
        p[f"blocks_{i}"] = {
            "norm1": _ln(sd, f"{b}.norm1"),
            "norm2": _ln(sd, f"{b}.norm2"),
            "attn": {
                "qkv": _lin(sd, f"{b}.attn.qkv"),
                "proj": _lin(sd, f"{b}.attn.proj"),
                "rel_pos_h": np.asarray(sd[f"{b}.attn.rel_pos_h"]),
                "rel_pos_w": np.asarray(sd[f"{b}.attn.rel_pos_w"]),
            },
            "mlp": _mlp_block(sd, f"{b}.mlp"),
        }
    return p


def convert_prompt_encoder(sd) -> dict:
    p = {
        "pe_layer": {"positional_encoding_gaussian_matrix": np.asarray(
            sd["pe_layer.positional_encoding_gaussian_matrix"])},
        "not_a_point_embed": np.asarray(sd["not_a_point_embed.weight"])[0],
        "no_mask_embed": np.asarray(sd["no_mask_embed.weight"])[0],
        "mask_conv1": _conv(sd, "mask_downscaling.0"),
        "mask_ln1": _ln2d(sd, "mask_downscaling.1"),
        "mask_conv2": _conv(sd, "mask_downscaling.3"),
        "mask_ln2": _ln2d(sd, "mask_downscaling.4"),
        "mask_conv3": _conv(sd, "mask_downscaling.6"),
    }
    for i in range(4):
        p[f"point_embed_{i}"] = np.asarray(sd[f"point_embeddings.{i}.weight"])[0]
    return p


def convert_two_way_transformer(sd, prefix: str, depth: int = 2,
                                sam2: bool = False) -> dict:
    # SAM2TwoWayAttentionBlock swaps MLPBlock(lin1/lin2) for a 2-layer
    # MLP named layers.0/1 (ref:blocks.py:264-325) — same relu math,
    # different state-dict names
    mlp = ((lambda b: {"lin1": _lin(sd, f"{b}.mlp.layers.0"),
                       "lin2": _lin(sd, f"{b}.mlp.layers.1")})
           if sam2 else (lambda b: _mlp_block(sd, f"{b}.mlp")))
    p = {}
    for i in range(depth):
        b = f"{prefix}layers.{i}"
        p[f"layers_{i}"] = {
            "self_attn": _attn_ds(sd, f"{b}.self_attn"),
            "cross_attn_token_to_image": _attn_ds(sd, f"{b}.cross_attn_token_to_image"),
            "cross_attn_image_to_token": _attn_ds(sd, f"{b}.cross_attn_image_to_token"),
            "mlp": mlp(b),
            "norm1": _ln(sd, f"{b}.norm1"),
            "norm2": _ln(sd, f"{b}.norm2"),
            "norm3": _ln(sd, f"{b}.norm3"),
            "norm4": _ln(sd, f"{b}.norm4"),
        }
    p["final_attn_token_to_image"] = _attn_ds(sd, f"{prefix}final_attn_token_to_image")
    p["norm_final_attn"] = _ln(sd, f"{prefix}norm_final_attn")
    return p


def convert_mask_decoder(sd, num_mask_tokens: int = 4, tf_depth: int = 2,
                         sam2: bool = False) -> dict:
    p = {
        "iou_token": np.asarray(sd["iou_token.weight"])[0],
        "mask_tokens": np.asarray(sd["mask_tokens.weight"]),
        "transformer": convert_two_way_transformer(sd, "transformer.",
                                                   tf_depth, sam2=sam2),
        "upscale_conv1": _convT(sd, "output_upscaling.0"),
        "upscale_ln": _ln2d(sd, "output_upscaling.1"),
        "upscale_conv2": _convT(sd, "output_upscaling.3"),
        "iou_prediction_head": _sam_mlp(sd, "iou_prediction_head", 3),
    }
    for i in range(num_mask_tokens):
        p[f"output_hypernetworks_mlps_{i}"] = _sam_mlp(
            sd, f"output_hypernetworks_mlps.{i}", 3)
    return p


def convert_sam_state_dict(state_dict, depth: int = 12) -> dict:
    """Full SAMModel params from a torch SAM state dict (numpy tensors)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def sub(prefix):
        return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    return {
        "image_encoder": convert_image_encoder(sub("image_encoder."), depth),
        "prompt_encoder": convert_prompt_encoder(sub("prompt_encoder.")),
        "mask_decoder": convert_mask_decoder(sub("mask_decoder.")),
    }


# ---------------------------------------------------------------------------
# MobileSAM TinyViT encoder (ref:models/sam/modules/tiny_encoder.py)
# ---------------------------------------------------------------------------


def _convbn(sd, name):
    """torch Conv2d_BN -> flax ConvBN ({params}, {batch_stats})."""
    g = int(sd.get(f"{name}.c.groups", 1)) if f"{name}.c.groups" in sd else 1
    w = np.asarray(sd[f"{name}.c.weight"])  # (O, I/g, kh, kw)
    params = {
        "c": {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))},
        "bn": {"scale": np.asarray(sd[f"{name}.bn.weight"]),
               "bias": np.asarray(sd[f"{name}.bn.bias"])},
    }
    stats = {"bn": {"mean": np.asarray(sd[f"{name}.bn.running_mean"]),
                    "var": np.asarray(sd[f"{name}.bn.running_var"])}}
    return params, stats


def convert_tiny_vit(sd, depths=(2, 2, 6, 2)) -> tuple[dict, dict]:
    """TinyViT encoder subtree -> (params, batch_stats) for
    :class:`xlstm_yolo_tpu.models.sam.tiny_encoder.TinyViT`."""
    P, S = {}, {}

    def put_convbn(flax_mod, flax_sub, torch_name):
        p, s = _convbn(sd, torch_name)
        P.setdefault(flax_mod, {})[flax_sub] = p
        S.setdefault(flax_mod, {})[flax_sub] = s

    put_convbn("patch_embed", "conv1", "patch_embed.seq.0")
    put_convbn("patch_embed", "conv2", "patch_embed.seq.2")
    for j in range(depths[0]):
        for c in ("conv1", "conv2", "conv3"):
            put_convbn(f"layer0_block{j}", c, f"layers.0.blocks.{j}.{c}")
    for c in ("conv1", "conv2", "conv3"):
        put_convbn("layer0_downsample", c, f"layers.0.downsample.{c}")
    for i in (1, 2, 3):
        for j in range(depths[i]):
            b = f"layers.{i}.blocks.{j}"
            m = f"layer{i}_block{j}"
            P[m] = {
                "attn": {
                    "norm": _ln(sd, f"{b}.attn.norm"),
                    "qkv": _lin(sd, f"{b}.attn.qkv"),
                    "proj": _lin(sd, f"{b}.attn.proj"),
                    "attention_biases": np.asarray(sd[f"{b}.attn.attention_biases"]),
                },
                "mlp_norm": _ln(sd, f"{b}.mlp.norm"),
                "mlp_fc1": _lin(sd, f"{b}.mlp.fc1"),
                "mlp_fc2": _lin(sd, f"{b}.mlp.fc2"),
            }
            S[m] = {}
            put_convbn(m, "local_conv", f"{b}.local_conv")
        if i < 3:
            for c in ("conv1", "conv2", "conv3"):
                put_convbn(f"layer{i}_downsample", c, f"layers.{i}.downsample.{c}")
    P["neck_conv1"] = _conv(sd, "neck.0", bias=False)
    P["neck_ln1"] = _ln2d(sd, "neck.1")
    P["neck_conv2"] = _conv(sd, "neck.2", bias=False)
    P["neck_ln2"] = _ln2d(sd, "neck.3")
    return P, S


def convert_mobile_sam_state_dict(state_dict, depths=(2, 2, 6, 2)) -> dict:
    """MobileSAM .pt -> {'params': ..., 'batch_stats': ...} for SAMModel
    with the TinyViT encoder (encoder_type='tiny')."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def sub(prefix):
        return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    enc_p, enc_s = convert_tiny_vit(sub("image_encoder."), depths)
    return {
        "params": {
            "image_encoder": enc_p,
            "prompt_encoder": convert_prompt_encoder(sub("prompt_encoder.")),
            "mask_decoder": convert_mask_decoder(sub("mask_decoder.")),
        },
        "batch_stats": {"image_encoder": enc_s},
    }


# ---------------------------------------------------------------------------
# SAM2 image encoder: Hiera trunk + FPN neck (ref:encoders.py:446-804)
# ---------------------------------------------------------------------------


def convert_sam2_image_encoder(sd, stages=(1, 2, 7, 2)) -> dict:
    """image_encoder.* subtree of a SAM2 checkpoint -> flax params for
    :class:`xlstm_yolo_tpu.models.sam.sam2_encoder.SAM2ImageEncoder`."""
    depth = sum(stages)
    trunk = {
        "patch_embed": _conv(sd, "trunk.patch_embed.proj"),
        # torch NCHW pos embeds -> NHWC
        "pos_embed": np.ascontiguousarray(
            np.transpose(sd["trunk.pos_embed"], (0, 2, 3, 1))),
        "pos_embed_window": np.ascontiguousarray(
            np.transpose(sd["trunk.pos_embed_window"], (0, 2, 3, 1))),
    }
    for i in range(depth):
        b = f"trunk.blocks.{i}"
        blk = {
            "norm1": _ln(sd, f"{b}.norm1"),
            "norm2": _ln(sd, f"{b}.norm2"),
            "attn": {"qkv": _lin(sd, f"{b}.attn.qkv"),
                     "proj": _lin(sd, f"{b}.attn.proj")},
            "mlp_fc1": _lin(sd, f"{b}.mlp.layers.0"),
            "mlp_fc2": _lin(sd, f"{b}.mlp.layers.1"),
        }
        if f"{b}.proj.weight" in sd:
            blk["proj"] = _lin(sd, f"{b}.proj")
        trunk[f"block{i}"] = blk
    neck = {}
    j = 0
    while f"neck.convs.{j}.conv.weight" in sd:
        neck[f"conv{j}"] = _conv(sd, f"neck.convs.{j}.conv")
        j += 1
    return {"trunk": trunk, "neck": neck}


def convert_memory_attention(sd, num_layers: int = 4) -> dict:
    """Torch MemoryAttention state-dict -> flax params
    (ref:ultralytics/models/sam/modules/memory_attention.py:140-237)."""
    p = {"norm": _ln(sd, "norm")}
    for i in range(num_layers):
        t = f"layers.{i}"
        p[f"layers_{i}"] = {
            "self_attn": _attn_ds(sd, f"{t}.self_attn"),
            "cross_attn_image": _attn_ds(sd, f"{t}.cross_attn_image"),
            "linear1": _lin(sd, f"{t}.linear1"),
            "linear2": _lin(sd, f"{t}.linear2"),
            "norm1": _ln(sd, f"{t}.norm1"),
            "norm2": _ln(sd, f"{t}.norm2"),
            "norm3": _ln(sd, f"{t}.norm3"),
        }
    return p


def convert_memory_encoder(sd) -> dict:
    """Torch MemoryEncoder state-dict -> flax params
    (ref:ultralytics/models/sam/modules/encoders.py:378-445)."""
    md = {}
    for i in (0, 3, 6, 9):
        md[f"encoder_{i}"] = _conv(sd, f"mask_downsampler.encoder.{i}")
        md[f"encoder_{i + 1}"] = _ln(sd, f"mask_downsampler.encoder.{i + 1}")
    md["encoder_12"] = _conv(sd, "mask_downsampler.encoder.12")
    fus = {}
    for i in range(2):
        t = f"fuser.layers.{i}"
        fus[f"layers_{i}"] = {
            "dwconv": _conv(sd, f"{t}.dwconv"),
            "norm": _ln(sd, f"{t}.norm"),
            "pwconv1": _lin(sd, f"{t}.pwconv1"),
            "pwconv2": _lin(sd, f"{t}.pwconv2"),
            "gamma": np.asarray(sd[f"{t}.gamma"]),
        }
    p = {"mask_downsampler": md, "pix_feat_proj": _conv(sd, "pix_feat_proj"),
         "fuser": fus}
    if "out_proj.weight" in sd:
        p["out_proj"] = _conv(sd, "out_proj")
    return p


def convert_sam2_mask_decoder(sd, tf_depth: int = 2) -> dict:
    """Torch SAM2MaskDecoder state-dict -> flax SAM2MaskDecoder params
    (ref:ultralytics/models/sam/modules/decoders.py:176-312).  conv_s0/s1
    are intentionally NOT mapped here — they live on SAM2Base in the flax
    layout (applied once per frame, ref:sam.py:594-602)."""
    p = convert_mask_decoder(sd, num_mask_tokens=4, tf_depth=tf_depth,
                             sam2=True)
    p["obj_score_token"] = np.asarray(sd["obj_score_token.weight"])[0]
    p["pred_obj_score_head"] = _sam_mlp(sd, "pred_obj_score_head", 3)
    return p
