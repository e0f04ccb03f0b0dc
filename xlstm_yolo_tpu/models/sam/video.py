"""SAM2 video path: SAM2MaskDecoder, SAM2Base heads, SAM2VideoPredictor.

TPU-native re-design of the reference video-object-segmentation stack:
- SAM2MaskDecoder: ref:ultralytics/models/sam/modules/decoders.py:176-517
- SAM2Model memory plumbing (_forward_sam_heads, _prepare_memory_
  conditioned_features, _encode_new_memory, track_step):
  ref:ultralytics/models/sam/modules/sam.py:105-970
- SAM2VideoPredictor: ref:ultralytics/models/sam/predict.py (video half)

Design differences (TPU-first, on purpose):
- NHWC images, batch-first (B, T, C) sequences;
- the per-frame compute (SAM heads, memory attention, memory encoding)
  is pure jitted functions over FIXED shapes — the memory bank reaches a
  steady state (num_maskmem spatial memories + a fixed object-pointer
  window) after the warm-up frames, so propagation runs one compiled
  program per steady-state shape instead of torch's dynamic lists;
- objects are tracked BATCHED: the predictor carries (num_obj, ...)
  arrays, where the reference loops a python dict per object id.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from xlstm_yolo_tpu.models.sam.memory import (
    MemoryAttention, MemoryEncoder, get_1d_sine_pe,
)
from xlstm_yolo_tpu.models.sam.modules import (
    LayerNorm2d, PromptEncoder, SamMLP, TwoWayTransformer,
)

f32 = jnp.float32
NO_OBJ_SCORE = -1024.0  # ref:sam.py:24


class SAM2MaskDecoder(nn.Module):
    """SAM2 mask decoder: obj-score token, high-res skip features,
    dynamic multimask-via-stability (ref:decoders.py:176-517)."""

    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    use_high_res_features: bool = True
    iou_prediction_use_sigmoid: bool = True
    dynamic_multimask_via_stability: bool = True
    dynamic_multimask_stability_delta: float = 0.05
    dynamic_multimask_stability_thresh: float = 0.98
    pred_obj_scores: bool = True
    pred_obj_scores_mlp: bool = True
    use_multimask_token_for_obj_ptr: bool = True
    tf_depth: int = 2
    tf_heads: int = 8
    tf_mlp_dim: int = 2048

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt,
                 dense_prompt, multimask_output: bool,
                 high_res_features=None):
        """image_embeddings/image_pe/dense_prompt: (B, h, w, C) NHWC;
        sparse_prompt (B, N, C).  Returns (masks (B, k, 4h, 4w),
        iou (B, k), sam_tokens_out (B, k', C), obj_score_logits (B, 1))."""
        td = self.transformer_dim
        nmt = self.num_multimask_outputs + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (td,), f32)
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (nmt, td), f32)
        toks = [iou_token[None], mask_tokens]
        s = 0
        if self.pred_obj_scores:
            obj_tok = self.param("obj_score_token",
                                 nn.initializers.normal(1.0), (td,), f32)
            toks = [obj_tok[None]] + toks
            s = 1
        B = sparse_prompt.shape[0]
        out_tokens = jnp.broadcast_to(
            jnp.concatenate(toks, 0)[None], (B, s + 1 + nmt, td))
        tokens = jnp.concatenate(
            [out_tokens.astype(sparse_prompt.dtype), sparse_prompt], 1)

        src = image_embeddings + dense_prompt
        hs, keys = TwoWayTransformer(
            depth=self.tf_depth, embedding_dim=td, num_heads=self.tf_heads,
            mlp_dim=self.tf_mlp_dim, name="transformer",
        )(src, image_pe, tokens)
        iou_out = hs[:, s]
        mask_out = hs[:, s + 1: s + 1 + nmt]

        h, w = src.shape[1], src.shape[2]
        y = keys.reshape(B, h, w, td)
        dc1 = nn.ConvTranspose(td // 4, (2, 2), strides=(2, 2),
                               padding=[(1, 1), (1, 1)], name="upscale_conv1")
        ln1 = LayerNorm2d(td // 4, name="upscale_ln")
        dc2 = nn.ConvTranspose(td // 8, (2, 2), strides=(2, 2),
                               padding=[(1, 1), (1, 1)], name="upscale_conv2")
        if self.use_high_res_features:
            feat_s0, feat_s1 = high_res_features  # NHWC, pre-projected
            y = nn.gelu(ln1(dc1(y) + feat_s1), approximate=False)
            y = nn.gelu(dc2(y) + feat_s0, approximate=False)
        else:
            y = nn.gelu(ln1(dc1(y)), approximate=False)
            y = nn.gelu(dc2(y), approximate=False)

        hyper = jnp.stack([
            SamMLP(td, td // 8, 3, name=f"output_hypernetworks_mlps_{i}")(
                mask_out[:, i]) for i in range(nmt)
        ], 1)
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper, y)
        iou_pred = SamMLP(self.iou_head_hidden_dim, nmt, self.iou_head_depth,
                          sigmoid_output=self.iou_prediction_use_sigmoid,
                          name="iou_prediction_head")(iou_out)
        if self.pred_obj_scores:
            if self.pred_obj_scores_mlp:
                obj_logits = SamMLP(td, 1, 3, name="pred_obj_score_head")(
                    hs[:, 0])
            else:
                obj_logits = nn.Dense(1, name="pred_obj_score_head")(hs[:, 0])
        else:
            obj_logits = 10.0 * jnp.ones((B, 1), f32)

        if multimask_output:
            out_masks = masks[:, 1:]
            out_iou = iou_pred[:, 1:]
        elif self.dynamic_multimask_via_stability:
            out_masks, out_iou = self._dynamic_multimask(masks, iou_pred)
        else:
            out_masks = masks[:, 0:1]
            out_iou = iou_pred[:, 0:1]

        if multimask_output and self.use_multimask_token_for_obj_ptr:
            sam_tokens_out = mask_out[:, 1:]
        else:
            sam_tokens_out = mask_out[:, 0:1]
        return out_masks, out_iou, sam_tokens_out, obj_logits

    def _dynamic_multimask(self, all_masks, all_iou):
        """Fall back to the best multimask when token-0 is unstable
        (ref:decoders.py:456-517); fixed shapes via where/take."""
        d = self.dynamic_multimask_stability_delta
        multi_m, multi_iou = all_masks[:, 1:], all_iou[:, 1:]
        best = jnp.argmax(multi_iou, axis=-1)
        best_m = jnp.take_along_axis(
            multi_m, best[:, None, None, None], axis=1)
        best_iou = jnp.take_along_axis(multi_iou, best[:, None], axis=1)
        single_m, single_iou = all_masks[:, 0:1], all_iou[:, 0:1]
        flat = single_m.reshape(single_m.shape[0], -1)
        area_i = jnp.sum(flat > d, axis=-1).astype(f32)
        area_u = jnp.sum(flat > -d, axis=-1).astype(f32)
        stab = jnp.where(area_u > 0, area_i / jnp.maximum(area_u, 1.0), 1.0)
        is_stable = (stab >= self.dynamic_multimask_stability_thresh)
        out_m = jnp.where(is_stable[:, None, None, None], single_m, best_m)
        out_iou = jnp.where(is_stable[:, None], single_iou, best_iou)
        return out_m, out_iou


class SAM2Base(nn.Module):
    """SAM2 heads + memory modules as one flax module (image encoder is
    composed externally so encoders stay swappable).

    Parity: the SAM2Model defaults of `_build_sam2`
    (ref:ultralytics/models/sam/build.py:246-301): num_maskmem=7,
    sigmoid scale/bias 20/-10, directly_add_no_mem_embed, high-res
    features, obj-ptrs in encoder (max 16), fixed_no_obj_ptr,
    multimask-for-tracking with mask-token obj-ptrs.
    """

    image_size: int = 1024
    backbone_stride: int = 16
    hidden_dim: int = 256
    mem_dim: int = 64
    num_maskmem: int = 7
    max_obj_ptrs_in_encoder: int = 16
    sigmoid_scale_for_mem_enc: float = 20.0
    sigmoid_bias_for_mem_enc: float = -10.0
    sam2_1: bool = False  # no_obj_embed_spatial + signed/proj tpos

    def setup(self):
        gs = self.image_size // self.backbone_stride
        self.sam_prompt_encoder = PromptEncoder(
            embed_dim=self.hidden_dim, image_embedding_size=(gs, gs),
            input_image_size=(self.image_size, self.image_size),
            mask_in_chans=16)
        self.sam_mask_decoder = SAM2MaskDecoder(
            transformer_dim=self.hidden_dim)
        self.memory_attention = MemoryAttention(
            d_model=self.hidden_dim, num_layers=4, mem_dim=self.mem_dim)
        self.memory_encoder = MemoryEncoder(
            out_dim=self.mem_dim, in_dim=self.hidden_dim)
        init = nn.initializers.truncated_normal(0.02, lower=-2.0, upper=2.0)
        self.maskmem_tpos_enc = self.param(
            "maskmem_tpos_enc", init, (self.num_maskmem, 1, self.mem_dim), f32)
        self.no_mem_embed = self.param(
            "no_mem_embed", init, (1, 1, self.hidden_dim), f32)
        self.no_mem_pos_enc = self.param(
            "no_mem_pos_enc", init, (1, 1, self.hidden_dim), f32)
        self.no_obj_ptr = self.param(
            "no_obj_ptr", init, (1, self.hidden_dim), f32)
        self.obj_ptr_proj = SamMLP(self.hidden_dim, self.hidden_dim, 3,
                                   name="obj_ptr_proj")
        if self.sam2_1:
            self.obj_ptr_tpos_proj = nn.Dense(self.mem_dim,
                                              name="obj_ptr_tpos_proj")
            self.no_obj_embed_spatial = self.param(
                "no_obj_embed_spatial", init, (1, self.mem_dim), f32)
        # stride-4 mask downsample for mask-prompt object pointers
        self.mask_downsample = nn.Conv(1, (4, 4), strides=(4, 4),
                                       name="mask_downsample")
        # high-res skip projections — live on the torch decoder
        # (sam_mask_decoder.conv_s0/s1) but are applied once per frame in
        # forward_image (ref:sam.py:594-602), so they sit here beside the
        # other per-frame ops; the converter maps the names across.
        self.conv_s0 = nn.Conv(self.hidden_dim // 8, (1, 1), name="conv_s0")
        self.conv_s1 = nn.Conv(self.hidden_dim // 4, (1, 1), name="conv_s1")

    def __call__(self, backbone_features, high_feats):
        """Init-only path: touches every submodule once so a single
        ``init`` materializes the full parameter tree."""
        s0, s1 = self.project_high_res(high_feats)
        outs = self.forward_sam_heads(
            backbone_features, high_res_features=(s0, s1),
            multimask_output=True)
        B, gh, gw, C = backbone_features.shape
        feat = backbone_features.reshape(B, gh * gw, C)
        _ = self.condition_features(feat, feat, None, None, no_memory=True)
        mem, pos = self.encode_memory(
            backbone_features, outs[4].transpose(0, 2, 3, 1), outs[6])
        memt = mem.reshape(B, gh * gw, self.mem_dim)
        post = pos.reshape(B, gh * gw, self.mem_dim) + self.tpos_spatial(1)
        _ = self.condition_features(feat, feat, memt, post)
        ptr_t, ptr_p = self.obj_ptr_tokens(outs[5][:, None], np.zeros((1,)))
        _ = self.use_mask_as_output(
            backbone_features, (s0, s1),
            jnp.zeros((B, gh * 16, gw * 16, 1), f32))
        return outs[3]

    def project_high_res(self, high_feats):
        """Apply conv_s0/s1 to the two high-res FPN levels once per frame
        (ref:sam.py:594-602 forward_image)."""
        return self.conv_s0(high_feats[0]), self.conv_s1(high_feats[1])

    # ---- SAM heads (ref:sam.py:392-545) ----

    def forward_sam_heads(self, backbone_features, point_coords=None,
                          point_labels=None, mask_inputs=None,
                          high_res_features=None,
                          multimask_output: bool = False):
        """backbone_features (B, h, w, C) NHWC.  point_coords (B, P, 2)
        absolute pixels / point_labels (B, P) with -1 padding."""
        B, gh, gw, C = backbone_features.shape
        if point_coords is None:
            point_coords = jnp.zeros((B, 1, 2), f32)
            point_labels = -jnp.ones((B, 1), jnp.int32)
        if mask_inputs is not None:
            ms = self.sam_prompt_encoder.image_embedding_size[0] * 4
            if mask_inputs.shape[1] != ms:
                mask_inputs = jax.image.resize(
                    mask_inputs.astype(f32),
                    (B, ms, ms, 1), method="bilinear")
        sparse, dense = self.sam_prompt_encoder(
            points=(point_coords, point_labels), masks=mask_inputs)
        pe = self.sam_prompt_encoder.get_dense_pe()
        low_multi, ious, sam_tokens, obj_logits = self.sam_mask_decoder(
            backbone_features, pe, sparse.astype(backbone_features.dtype),
            dense.astype(backbone_features.dtype), multimask_output,
            high_res_features=high_res_features)
        is_obj = obj_logits > 0
        low_multi = jnp.where(is_obj[:, :, None, None],
                              low_multi.astype(f32), NO_OBJ_SCORE)
        high_multi = jax.image.resize(
            low_multi,
            (B, low_multi.shape[1], self.image_size, self.image_size),
            method="bilinear")
        sam_token = sam_tokens[:, 0]
        if multimask_output:
            best = jnp.argmax(ious, axis=-1)
            low_res = jnp.take_along_axis(
                low_multi, best[:, None, None, None], axis=1)
            high_res = jnp.take_along_axis(
                high_multi, best[:, None, None, None], axis=1)
            if sam_tokens.shape[1] > 1:
                sam_token = jnp.take_along_axis(
                    sam_tokens, best[:, None, None], axis=1)[:, 0]
        else:
            low_res, high_res = low_multi, high_multi
        obj_ptr = self.obj_ptr_proj(sam_token)
        lam = is_obj.astype(f32)  # (B, 1); fixed_no_obj_ptr
        obj_ptr = lam * obj_ptr + (1 - lam) * self.no_obj_ptr
        return low_multi, high_multi, ious, low_res, high_res, obj_ptr, obj_logits

    def use_mask_as_output(self, backbone_features, high_res_features,
                           mask_inputs):
        """GT-mask passthrough (ref:sam.py:547-592); mask_inputs NHWC01."""
        out_scale, out_bias = 20.0, -10.0
        mf = mask_inputs.astype(f32)
        high_res = mf * out_scale + out_bias
        B, H, W, _ = high_res.shape
        low_res = jax.image.resize(high_res, (B, H // 4, W // 4, 1),
                                   method="bilinear")
        ious = jnp.ones((B, 1), f32)
        _, _, _, _, _, obj_ptr, _ = self.forward_sam_heads(
            backbone_features,
            mask_inputs=self.mask_downsample(mf),
            high_res_features=high_res_features)
        is_obj = jnp.any(mf.reshape(B, -1) > 0.0, axis=1)[:, None]
        lam = is_obj.astype(f32)
        obj_logits = out_scale * lam + out_bias
        obj_ptr = lam * obj_ptr + (1 - lam) * self.no_obj_ptr
        # NHWC -> NCHW mask layout used by callers (B, 1, H, W)
        to_m = lambda x: x.transpose(0, 3, 1, 2)  # noqa: E731
        return (to_m(low_res), to_m(high_res), ious, to_m(low_res),
                to_m(high_res), obj_ptr, obj_logits)

    # ---- memory conditioning (ref:sam.py:619-781) ----

    def condition_features(self, curr_feat, curr_pos, memory, memory_pos,
                           num_obj_ptr_tokens: int = 0,
                           no_memory: bool = False):
        """curr_feat/curr_pos (B, T, C); memory/memory_pos (B, M, mem_dim).
        ``no_memory`` (init-cond frame): directly add no_mem_embed."""
        if no_memory:
            return curr_feat + self.no_mem_embed
        return self.memory_attention(
            curr_feat, memory, curr_pos=curr_pos, memory_pos=memory_pos,
            num_obj_ptr_tokens=num_obj_ptr_tokens)

    def encode_memory(self, pix_feat, high_res_masks, object_score_logits,
                      binarize: bool = False):
        """pix_feat (B, h, w, C); high_res_masks (B, H, W, 1) logits.
        Returns (maskmem (B, h, w, mem_dim), pos (B, h, w, mem_dim))."""
        if binarize:
            mask_for_mem = (high_res_masks > 0).astype(f32)
        else:
            mask_for_mem = jax.nn.sigmoid(high_res_masks)
        mask_for_mem = (mask_for_mem * self.sigmoid_scale_for_mem_enc
                        + self.sigmoid_bias_for_mem_enc)
        feats, pos = self.memory_encoder(pix_feat, mask_for_mem,
                                         skip_mask_sigmoid=True)
        if self.sam2_1:
            is_obj = (object_score_logits > 0).astype(f32)  # (B, 1)
            feats = feats + (1.0 - is_obj[:, :, None, None]) * \
                self.no_obj_embed_spatial[:, None, None, :]
        return feats, pos

    def tpos_spatial(self, t_pos):
        """Temporal encoding added to a memory slot's spatial pos-enc:
        maskmem_tpos_enc[num_maskmem - t_pos - 1] (ref:sam.py:694)."""
        return self.maskmem_tpos_enc[self.num_maskmem - t_pos - 1]

    def obj_ptr_tokens(self, obj_ptrs, t_diffs):
        """(B, P, C) pointers + (P,) frame distances -> (B, P*(C/mem),
        mem_dim) tokens and matching pos tokens (ref:sam.py:731-753)."""
        B, P, C = obj_ptrs.shape
        t_max = self.max_obj_ptrs_in_encoder - 1
        tpos_dim = C if self.sam2_1 else self.mem_dim
        pos = get_1d_sine_pe(jnp.asarray(t_diffs, f32) / max(t_max, 1),
                             tpos_dim)
        if self.sam2_1:
            pos = self.obj_ptr_tpos_proj(pos)  # (P, mem_dim)
        else:
            pos = pos[:, :self.mem_dim] * 0.0 if tpos_dim < self.mem_dim \
                else pos[:, :self.mem_dim]
        split = C // self.mem_dim
        toks = obj_ptrs.reshape(B, P * split, self.mem_dim)
        pos = jnp.broadcast_to(
            jnp.repeat(pos, split, axis=0)[None], (B, P * split, self.mem_dim))
        return toks, pos


class SAM2VideoPredictor:
    """Streaming video mask propagation over jitted SAM2Base functions.

    Parity: ref:ultralytics/models/sam/predict.py SAM2VideoPredictor +
    ref:sam.py:619-781 memory selection (eval path, r = temporal stride).
    TPU-native shape: per-frame compute is a handful of jitted programs
    whose shapes stabilize once the memory bank is full (after
    ``num_maskmem`` frames + ``max_obj_ptrs_in_encoder`` pointers), so
    long-video propagation reuses ONE compiled program per steady state;
    objects are tracked batched in a leading O dimension.
    """

    def __init__(self, base: SAM2Base, params, encoder=None,
                 encoder_params=None, memory_temporal_stride: int = 1):
        self.base = base
        self.params = {"params": params} if "params" not in params else params
        self.encoder = encoder
        self.encoder_params = encoder_params
        self.r = memory_temporal_stride
        self.num_maskmem = base.num_maskmem
        self.max_ptrs = base.max_obj_ptrs_in_encoder
        ap = self.params

        def heads(feats, s0, s1, pc, pl, mm):
            return base.apply(ap, feats, point_coords=pc, point_labels=pl,
                              high_res_features=(s0, s1),
                              multimask_output=mm,
                              method=SAM2Base.forward_sam_heads)

        self._heads = jax.jit(heads, static_argnums=(5,))
        self._condition = jax.jit(
            lambda f, p, m, mp, nptr: base.apply(
                ap, f, p, m, mp, num_obj_ptr_tokens=nptr,
                method=SAM2Base.condition_features),
            static_argnums=(4,))
        self._cond_init = jax.jit(
            lambda f: base.apply(ap, f, None, None, None, no_memory=True,
                                 method=SAM2Base.condition_features))
        self._encmem = jax.jit(
            lambda pf, hm, osl: base.apply(
                ap, pf, hm, osl, method=SAM2Base.encode_memory))
        self._project = jax.jit(
            lambda h0, h1: base.apply(ap, (h0, h1),
                                      method=SAM2Base.project_high_res))
        self._ptr_tokens = jax.jit(
            lambda ptrs, td: base.apply(ap, ptrs, td,
                                        method=SAM2Base.obj_ptr_tokens))
        if encoder is not None:
            ep = ({"params": encoder_params}
                  if "params" not in encoder_params else encoder_params)
            self._encode = jax.jit(lambda img: encoder.apply(ep, img))

    # ---- state ----

    def init_state(self, num_frames: int):
        return {"num_frames": num_frames, "cond": {}, "non_cond": {},
                "ptrs": {}}

    def encode_frame(self, image):
        """(1, S, S, 3) normalized image -> per-frame feature dict."""
        out = self._encode(image)
        fpn = out["backbone_fpn"]
        s0, s1 = self._project(fpn[0], fpn[1])
        return {"pix_feat": fpn[-1], "pos": out["vision_pos_enc"][-1],
                "s0": s0, "s1": s1}

    @staticmethod
    def _flat(x):  # (B, h, w, C) -> (B, hw, C)
        B, h, w, C = x.shape
        return x.reshape(B, h * w, C)

    def _broadcast_obj(self, feats, n_obj):
        return {k: jnp.broadcast_to(v, (n_obj,) + v.shape[1:])
                for k, v in feats.items()}

    def add_new_points(self, state, frame_idx, feats, points, labels):
        """Conditioning frame: points (O, P, 2) pixels, labels (O, P)
        (1 fg / 0 bg / 2,3 box corners / -1 pad).  Returns high-res mask
        logits (O, 1, S, S)."""
        n_obj = points.shape[0]
        f = self._broadcast_obj(feats, n_obj)
        cond_feat = self._cond_init(self._flat(f["pix_feat"]))
        gh, gw = f["pix_feat"].shape[1:3]
        pix = cond_feat.reshape(n_obj, gh, gw, -1)
        outs = self._heads(pix, f["s0"], f["s1"],
                           jnp.asarray(points, f32),
                           jnp.asarray(labels, jnp.int32), True)
        self._store(state, frame_idx, f, outs, cond=True)
        return np.asarray(outs[4]), np.asarray(outs[6])

    def _store(self, state, frame_idx, f, outs, cond: bool):
        low, high, obj_ptr, obj_logits = outs[3], outs[4], outs[5], outs[6]
        mem, pos = self._encmem(f["pix_feat"],
                                high.transpose(0, 2, 3, 1), obj_logits)
        entry = {"mem": self._flat(mem), "pos": self._flat(pos)}
        (state["cond"] if cond else state["non_cond"])[frame_idx] = entry
        state["ptrs"][frame_idx] = (obj_ptr, cond)
        # bound host memory: drop stale non-cond entries
        horizon = max(self.num_maskmem * self.r, self.max_ptrs) + 2
        for t in [t for t in state["non_cond"] if t < frame_idx - horizon]:
            del state["non_cond"][t]

    def _build_memory(self, state, frame_idx):
        """Select memory frames + obj pointers exactly as ref:sam.py:
        642-755 (eval, forward tracking)."""
        tpos_enc = self.params["params"]["maskmem_tpos_enc"]  # (NM, 1, mem)
        tpos = lambda t_pos: tpos_enc[self.num_maskmem - t_pos - 1]  # noqa: E731
        mems, poss = [], []
        for t, e in sorted(state["cond"].items()):
            mems.append(e["mem"])
            poss.append(e["pos"] + tpos(0))
        r = self.r
        for t_pos in range(1, self.num_maskmem):
            t_rel = self.num_maskmem - t_pos
            if t_rel == 1:
                prev = frame_idx - 1
            else:
                prev = ((frame_idx - 2) // r) * r - (t_rel - 2) * r
            e = state["non_cond"].get(prev)
            if e is None and prev in state["cond"]:
                e = state["cond"][prev]
            if e is None:
                continue
            mems.append(e["mem"])
            poss.append(e["pos"] + tpos(t_pos))
        # object pointers: cond (past only) + last (max_ptrs - 1) frames
        pos_and_ptrs = [(frame_idx - t, p) for t, (p, c) in
                        sorted(state["ptrs"].items()) if c and t <= frame_idx]
        for t_diff in range(1, self.max_ptrs):
            t = frame_idx - t_diff
            if t < 0:
                break
            got = state["ptrs"].get(t)
            if got is not None and not got[1]:
                pos_and_ptrs.append((t_diff, got[0]))
        nptr_tokens = 0
        if pos_and_ptrs:
            tds = np.asarray([d for d, _ in pos_and_ptrs], np.float32)
            ptrs = jnp.stack([p for _, p in pos_and_ptrs], axis=1)  # (O,P,C)
            ptok, ppos = self._ptr_tokens(ptrs, tds)
            mems.append(ptok)
            poss.append(ppos)
            nptr_tokens = int(ptok.shape[1])
        return (jnp.concatenate(mems, axis=1),
                jnp.concatenate(poss, axis=1), nptr_tokens)

    def track_frame(self, state, frame_idx, feats):
        """Propagate to a non-conditioning frame; returns (high-res mask
        logits (O, 1, S, S), object score logits (O, 1))."""
        n_obj = next(iter(state["ptrs"].values()))[0].shape[0]
        f = self._broadcast_obj(feats, n_obj)
        memory, memory_pos, nptr = self._build_memory(state, frame_idx)
        cond_feat = self._condition(
            self._flat(f["pix_feat"]), self._flat(f["pos"]),
            memory, memory_pos, nptr)
        gh, gw = f["pix_feat"].shape[1:3]
        pix = cond_feat.reshape(n_obj, gh, gw, -1)
        outs = self._heads(pix, f["s0"], f["s1"], None, None, True)
        self._store(state, frame_idx, f, outs, cond=False)
        return np.asarray(outs[4]), np.asarray(outs[6])

    def propagate_in_video(self, state, frame_feats, start_frame_idx=None):
        """Yield (frame_idx, high_res_logits, obj_logits) over frames.

        ``frame_feats``: sequence of encode_frame outputs (or images if
        an encoder was attached — detected by ndim)."""
        start = (start_frame_idx if start_frame_idx is not None
                 else min(state["cond"]))
        for t in range(start, state["num_frames"]):
            if t in state["cond"]:
                continue  # already predicted at prompt time
            feats = frame_feats[t]
            if not isinstance(feats, dict):
                feats = self.encode_frame(feats)
            high, score = self.track_frame(state, t, feats)
            yield t, high, score
