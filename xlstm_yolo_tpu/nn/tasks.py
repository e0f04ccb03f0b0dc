"""YAML graph compiler + DetectionModel executor.

Re-design of ref:ultralytics/nn/tasks.py:1073-1280 (parse_model) and
:114-430 (BaseModel/DetectionModel): the same ``[from, n, module, args]``
YAML DSL (the shipped ``640-base*.yaml`` files load unchanged) compiles
to a flat tuple of layer specs; a flax module instantiates and executes
them with savelist routing.  Everything is static under jit — stride
discovery needs no dummy forward because shapes are known at trace time.
"""

from __future__ import annotations

import ast
import math
from pathlib import Path
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import yaml
from flax import linen as nn

from xlstm_yolo_tpu.nn import blocks as B
from xlstm_yolo_tpu.nn import head as H

DEFAULT_CHUNKWISE_KERNEL = "auto"


def resolve_chunkwise_kernel(name: str, training: bool = False) -> str:
    """'auto' -> Pallas v2 on TPU, XLA chunkwise scan elsewhere.

    The round-1 blocker (full-graph Pallas + top-k gathers faulting the
    TPU runtime) is resolved: with the gather-free one-hot-matmul
    postprocess the fused program runs at every validated batch size
    (docs/KNOWN_ISSUES.md).  The v2 (B,S,H)-layout head-grouped kernel
    is the faster model body for BOTH eval (dispatch-amortized 216 vs
    193 img/s at batch 8) and training (41.5 vs 34.1 img/s full train
    step at batch 8 -- the custom-VJP backward avoids the XLA scan's
    (L, L) HBM spills), so TPU defaults to it; short sequences (<1024)
    inside the model still fall back to the XLA scan per the measured
    crossover (nn/layers.py).  Train/eval twins share params across
    kernel choices (the cell's param structure is kernel-independent).
    Note: the train-step compile (~3 min) is host-CPU-bound -- on a
    loaded host it can appear to hang (docs/KNOWN_ISSUES.md).
    """
    del training  # same choice for both modes (kept for call-site clarity)
    if name != "auto":
        return name
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover - no backend
        platform = "cpu"
    if platform == "tpu":
        return "chunkwise--pallas_xl_chunk_siging_v2"
    return "chunkwise--native_autograd"


def make_divisible(x: float, divisor: int = 8) -> int:
    return int(math.ceil(x / divisor) * divisor)


def yaml_model_load(path_or_dict) -> dict:
    """Load a model YAML (accepts the reference's files verbatim)."""
    if isinstance(path_or_dict, dict):
        return dict(path_or_dict)
    p = Path(path_or_dict)
    with open(p) as fh:
        d = yaml.safe_load(fh)
    d["yaml_file"] = str(p)
    return d


# modules whose first YAML arg is the output-channel count and which take
# (c1-prepended) standard args — parity with the base_modules set
# (nn/tasks.py:1099-1143) restricted to what we implement.
_BASE = {"Conv", "DWConv", "C2f", "C3", "C3k2", "SPPF", "Bottleneck", "SimpleStem",
         "Focus", "GhostConv", "GhostBottleneck", "RepConv", "SCDown", "PSA", "C2fPSA"}
_REPEAT = {"C2f", "C3", "C3k2"}


def parse_model_specs(d: dict, ch: int = 3, scale: str | None = None):
    """YAML dict -> (specs, savelist, per-layer channels).

    Channel bookkeeping follows nn/tasks.py:1181-1266 for the module
    families we support; each spec is a plain dict the model builder
    consumes.
    """
    nc = d.get("nc", 80)
    scales = d.get("scales")
    depth, width, max_channels = 1.0, 1.0, float("inf")
    if scales:
        scale = scale or d.get("scale") or tuple(scales.keys())[1]
        depth, width, max_channels = scales[scale]

    ch_list = [ch]
    tok_list: list[int | None] = [None]  # token-grid size per layer
    specs, save = [], []
    layers = list(d["backbone"]) + list(d["head"])
    for i, (f, n, m, args) in enumerate(layers):
        args = list(args)
        # resolve string args ('nc', 'None', numeric literals) like the
        # reference's locals()/literal_eval pass (nn/tasks.py:1174-1178)
        for j, a in enumerate(args):
            if isinstance(a, str):
                if a == "nc":
                    args[j] = nc
                else:
                    try:
                        args[j] = ast.literal_eval(a)
                    except (ValueError, SyntaxError):
                        pass
        name = m.replace("nn.", "") if isinstance(m, str) else m
        n_rep = max(round(n * depth), 1) if n > 1 else n
        # normalize relative froms other than -1 (e.g. [-2, -1]) to absolute
        if isinstance(f, int):
            f = f if f == -1 or f >= 0 else i + f
        else:
            f = [j if j == -1 or j >= 0 else i + j for j in f]

        c1 = ch_list[f] if isinstance(f, int) else None
        kwargs: dict[str, Any] = {}

        if name in _BASE:
            c2 = args[0]
            if c2 != nc:
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            args = [c2, *args[1:]]
            if name in _REPEAT:
                kwargs["n"] = n_rep
                n_rep = 1
        elif name in {"VitPatchEmbedBlock"}:
            c1, c2 = args[0], args[1]
        elif name in {"VitPosEmbedBlock"}:
            c2 = args[1]
        elif name in {"ViLBlockPairBlock", "ViLFusionBlock", "ViLBlock"}:
            c2 = args[1]
        elif name == "VisionClueMerge":
            c2 = args[1]
        elif name in {"FlattenPosEmbedBlock", "SequenceConv2dBlock", "VisionLSTM"}:
            c2 = args[1]
        elif name == "ConvTranspose":
            c2 = args[0]
        elif name == "AIFI":
            c2 = ch_list[f]  # channels unchanged (ref:nn/tasks.py:1231)
        elif name in {"HGStem", "HGBlock"}:
            c2 = args[1]  # [cm, c2, ...] (ref:nn/tasks.py:1233-1238)
            if name == "HGBlock":
                kwargs["n"] = n_rep
                n_rep = 1
        elif name == "RepC3":
            c2 = args[0]
            kwargs["n"] = n_rep
            n_rep = 1
        elif name == "RTDETRDecoder":
            kwargs["ch"] = tuple(ch_list[x] for x in f)
            c2 = None
        elif name in {"PatchMerger", "SequenceToImage", "Upsample",
                      "FeatureSplitIndex", "PermuteBlock"}:
            c2 = ch_list[f]
        elif name == "Concat":
            c2 = sum(ch_list[x] for x in f)
        elif name in {"Detect", "v10Detect", "Segment", "Pose", "OBB"}:
            kwargs["ch"] = tuple(ch_list[x] for x in f)
            c2 = None
        elif name == "Classify":
            c2 = args[0]
        else:
            raise ValueError(f"unsupported module '{m}' in model yaml (layer {i})")

        # token-grid bookkeeping: PatchMerger pools to a fixed learned-
        # query count, so multi-scale needs its *base* input token count
        # to rescale the query grid proportionally (see B.PatchMerger)
        tin = tok_list[f] if isinstance(f, int) else None
        if name == "VitPatchEmbedBlock" and len(args) > 3:
            res, patch = args[2], args[3]
            tok = (res[0] // patch[0]) * (res[1] // patch[1])
        elif name == "VitPosEmbedBlock" and len(args) > 2:
            tok = args[2][0] * args[2][1]
        elif name in {"ViLBlockPairBlock", "ViLFusionBlock"} and isinstance(args[-1], dict):
            sl = args[-1].get("seqlens")
            tok = sl[0] * sl[1] if sl else tin
        elif name == "PatchMerger":
            kwargs["base_tokens_in"] = tin
            tok = args[1]
        else:
            tok = tin

        specs.append(
            dict(i=i, f=f, n=n_rep, module=name, args=args, kwargs=kwargs, c1=c1, c2=c2)
        )
        save.extend(x % i for x in ([f] if isinstance(f, int) else f) if x != -1)
        if i == 0:
            ch_list = []
            tok_list = []
        ch_list.append(c2 if c2 is not None else (c1 or ch))
        tok_list.append(tok)
    return specs, sorted(set(save)), ch_list


def _vil_config(args_cfg: dict) -> dict:
    return dict(
        seqlens=tuple(args_cfg["seqlens"]),
        chunk_size=int(args_cfg.get("chunk_size", 256)),
        qkv_block_size=int(args_cfg.get("qkv_block_size", 16)),
        conv_kind=args_cfg.get("conv_kind", "2d"),
        drop_path=float(args_cfg.get("drop_path", 0.0)),
    )


def build_module(spec: dict, nc: int, training: bool, chunkwise_kernel: str,
                 compute_dtype, img_size: int, decode_only: bool = False,
                 fused: bool = False, sort_postprocess: bool | None = None):
    """Instantiate the flax module for one layer spec."""
    name, args, kw = spec["module"], spec["args"], spec["kwargs"]
    vilkw = dict(training=training, chunkwise_kernel=chunkwise_kernel,
                 compute_dtype=compute_dtype)
    mname = f"model_{spec['i']}"

    if name == "VitPatchEmbedBlock":
        _, c2, resolution, patch = args
        return B.VitPatchEmbedBlock(dim=c2, resolution=tuple(resolution),
                                    patch_size=tuple(patch), dtype=compute_dtype,
                                    name=mname)
    if name == "VitPosEmbedBlock":
        _, c2, seqlens = args
        return B.VitPosEmbedBlock(dim=c2, seqlens=tuple(seqlens), name=mname)
    if name == "ViLBlockPairBlock":
        _, c2, cfg = args
        return B.ViLBlockPairBlock(dim=c2, **_vil_config(cfg), **vilkw, name=mname)
    if name == "ViLFusionBlock":
        c1, c2, cfg = args
        cfg = dict(cfg)
        mlp_ratio = float(cfg.pop("mlp_ratio", 4.0))
        vc = _vil_config(cfg)
        drop_path = vc.pop("drop_path")
        return B.ViLFusionBlock(c1=c1, dim=c2, mlp_ratio=mlp_ratio,
                                drop_path=drop_path, fused=fused, **vc, **vilkw,
                                name=mname)
    if name == "PatchMerger":
        dim, m_out = args
        return B.PatchMerger(dim=dim, num_tokens_out=m_out,
                             base_tokens_in=kw.get("base_tokens_in"), name=mname)
    if name == "SequenceToImage":
        (seqlens,) = args
        return B.SequenceToImage(seqlens=tuple(seqlens), name=mname)
    if name == "Upsample":
        scale = args[1] if len(args) > 1 else 2
        return _Upsample(scale=int(scale), name=mname)
    if name == "Concat":
        return _Concat(name=mname)
    if name == "Conv":
        # yaml args mirror Conv(c2, k, s, p, g, d, act) (ref:conv.py:37)
        c2 = args[0]
        k = args[1] if len(args) > 1 else 1
        s = args[2] if len(args) > 2 else 1
        p = args[3] if len(args) > 3 else None
        g = args[4] if len(args) > 4 else 1
        d = args[5] if len(args) > 5 else 1
        act = "silu" if (len(args) < 7 or args[6] is True) else (
            args[6] if isinstance(args[6], str) else None)
        return B.ConvBNAct(c2=c2, k=k, s=s, p=p, g=g, d=d, act=act,
                           training=training, fused=fused,
                           dtype=compute_dtype, name=mname)
    if name == "DWConv":
        # DWConv(c2, k, s, d, act) (ref:conv.py:102)
        c2 = args[0]
        k = args[1] if len(args) > 1 else 1
        s = args[2] if len(args) > 2 else 1
        d = args[3] if len(args) > 3 else 1
        act = "silu" if (len(args) < 5 or args[4] is True) else (
            args[4] if isinstance(args[4], str) else None)
        return B.DWConvBlock(c2=c2, k=k, s=s, d=d, act=act, training=training,
                             fused=fused, dtype=compute_dtype, name=mname)
    if name == "C2f":
        c2 = args[0]
        shortcut = bool(args[1]) if len(args) > 1 else False
        return B.C2f(c2=c2, n=kw.get("n", 1), shortcut=shortcut,
                     training=training, name=mname)
    if name == "C3":
        c2 = args[0]
        shortcut = bool(args[1]) if len(args) > 1 else True
        return B.C3(c2=c2, n=kw.get("n", 1), shortcut=shortcut,
                    training=training, name=mname)
    if name == "C3k2":
        c2 = args[0]
        c3k = bool(args[1]) if len(args) > 1 else False
        return B.C3k2(c2=c2, n=kw.get("n", 1), c3k=c3k,
                      training=training, name=mname)
    if name == "SPPF":
        c2 = args[0]
        k = args[1] if len(args) > 1 else 5
        return B.SPPF(c2=c2, k=k, training=training, name=mname)
    if name == "Focus":
        return B.Focus(c2=args[0], k=args[1] if len(args) > 1 else 1,
                       s=args[2] if len(args) > 2 else 1, training=training,
                       dtype=compute_dtype, name=mname)
    if name == "GhostConv":
        return B.GhostConv(c2=args[0], k=args[1] if len(args) > 1 else 1,
                           s=args[2] if len(args) > 2 else 1, training=training,
                           dtype=compute_dtype, name=mname)
    if name == "GhostBottleneck":
        return B.GhostBottleneck(c2=args[0], k=args[1] if len(args) > 1 else 3,
                                 s=args[2] if len(args) > 2 else 1, training=training,
                                 dtype=compute_dtype, name=mname)
    if name == "RepConv":
        return B.RepConv(c2=args[0], s=args[2] if len(args) > 2 else 1,
                         training=training, dtype=compute_dtype, name=mname)
    if name == "SCDown":
        return B.SCDown(c2=args[0], k=args[1] if len(args) > 1 else 3,
                        s=args[2] if len(args) > 2 else 2, training=training,
                        dtype=compute_dtype, name=mname)
    if name == "PSA":
        return B.PSA(c2=args[0], training=training, dtype=compute_dtype, name=mname)
    if name == "SimpleStem":
        c2 = args[0]
        return B.SimpleStem(embed_dim=c2, training=training, name=mname)
    if name == "VisionClueMerge":
        c2 = args[1]
        return B.VisionClueMerge(c2=c2, training=training, name=mname)
    if name == "FeatureSplitIndex":
        return B.FeatureSplitIndex(index=int(args[0]), name=mname)
    if name == "PermuteBlock":
        (seqlens,) = args
        return B.PermuteBlock(seqlens=tuple(seqlens), name=mname)
    if name == "FlattenPosEmbedBlock":
        _, c2, seqlens = args
        return B.FlattenPosEmbedBlock(dim=c2, seqlens=tuple(seqlens), name=mname)
    if name == "SequenceConv2dBlock":
        _, c2, k, s, cfg = args
        return B.SequenceConv2dBlock(c2=c2, k=int(k), s=int(s),
                                     seqlens=tuple(cfg["seqlens"]),
                                     dtype=compute_dtype, name=mname)
    if name == "ConvTranspose":
        return B.ConvTransposeBlock(c2=args[0], k=args[1] if len(args) > 1 else 2,
                                    s=args[2] if len(args) > 2 else 2,
                                    training=training, fused=fused,
                                    dtype=compute_dtype, name=mname)
    if name == "VisionLSTM":
        _, dim, cfg = args if len(args) > 2 else (*args, {})
        return B.VisionLSTMBlock(
            dim=dim, depth=int(cfg.get("depth", 12)),
            resolution=tuple(cfg.get("resolution", (224, 224))),
            patch_size=int(cfg.get("patch_size", 16)),
            output_indices=tuple(cfg.get("output_indices", ())),
            pooling=cfg.get("pooling", "to_image"),
            drop_path=float(cfg.get("drop_path", 0.0)),
            chunk_size=int(cfg.get("chunk_size", 256)),
            qkv_block_size=int(cfg.get("qkv_block_size", 16)),
            **vilkw, name=mname)
    if name in {"Detect", "v10Detect"}:
        cls = H.v10Detect if name == "v10Detect" else H.Detect
        # Pallas custom calls + the top-k gathers in one program fault the
        # runtime; the sort-based postprocess is gather-free and safe.
        sp = ("pallas" in chunkwise_kernel) if sort_postprocess is None else sort_postprocess
        return cls(nc=args[0] if args else nc, ch=kw["ch"], training=training,
                   img_size=img_size, dtype=compute_dtype, decode_only=decode_only,
                   sort_postprocess=sp,
                   fused=fused, name=mname)
    if name == "Segment":
        nm = args[1] if len(args) > 1 else 32
        npr = args[2] if len(args) > 2 else 256
        return H.Segment(nc=args[0] if args else nc, nm=nm, npr=npr, ch=kw["ch"],
                         training=training, img_size=img_size, dtype=compute_dtype,
                         fused=fused, name=mname)
    if name == "Pose":
        kpt = tuple(args[1]) if len(args) > 1 else (17, 3)
        return H.Pose(nc=args[0] if args else nc, kpt_shape=kpt, ch=kw["ch"],
                      training=training, img_size=img_size, dtype=compute_dtype,
                      fused=fused, name=mname)
    if name == "OBB":
        ne = args[1] if len(args) > 1 else 1
        return H.OBB(nc=args[0] if args else nc, ne=ne, ch=kw["ch"],
                     training=training, img_size=img_size, dtype=compute_dtype,
                     fused=fused, name=mname)
    if name == "AIFI":
        d_ffn = args[0] if args else 1024
        nh = args[1] if len(args) > 1 else 8
        from xlstm_yolo_tpu.nn.transformer import AIFI
        return AIFI(d_ffn=d_ffn, num_heads=nh, dtype=compute_dtype, name=mname)
    if name == "HGStem":
        return B.HGStem(cm=args[0], c2=args[1], training=training,
                        dtype=compute_dtype, name=mname)
    if name == "HGBlock":
        k = args[2] if len(args) > 2 else 3
        light = bool(args[3]) if len(args) > 3 else False
        shortcut = bool(args[4]) if len(args) > 4 else False
        return B.HGBlock(cm=args[0], c2=args[1], k=k, n=kw.get("n", 6),
                         lightconv=light, shortcut=shortcut, training=training,
                         dtype=compute_dtype, name=mname)
    if name == "RepC3":
        return B.RepC3(c2=args[0], n=kw.get("n", 3),
                       e=args[1] if len(args) > 1 else 1.0,
                       training=training, dtype=compute_dtype, name=mname)
    if name == "RTDETRDecoder":
        from collections.abc import Mapping

        # flax freezes dict attrs inside module fields -> Mapping check
        over = dict(args[1]) if len(args) > 1 and isinstance(args[1], Mapping) else {}
        return H.RTDETRDecoder(nc=args[0] if args else nc, ch=kw["ch"],
                               training=training, img_size=img_size,
                               dtype=compute_dtype, fused=fused,
                               **over, name=mname)
    if name == "Classify":
        return H.Classify(c2=args[0] if args else nc,
                          k=args[1] if len(args) > 1 else 1,
                          s=args[2] if len(args) > 2 else 1,
                          training=training, dtype=compute_dtype, name=mname)
    raise ValueError(f"no builder for module '{name}'")


class _Upsample(nn.Module):
    scale: int = 2

    @nn.compact
    def __call__(self, x):
        return B.upsample_nearest(x, self.scale)


class _Concat(nn.Module):
    @nn.compact
    def __call__(self, xs):
        return B.concat_channels(xs)


class DetectionModel(nn.Module):
    """Graph executor over compiled layer specs (savelist routing).

    Parity: BaseModel._predict_once (nn/tasks.py:154-182) — iterate
    layers, re-route via ``f`` indices, cache savelist outputs.
    Training returns the head's raw dict; eval returns
    (decoded (B, max_det, 6), aux feature dict).
    """

    specs: Sequence[dict]
    save: Sequence[int]
    nc: int = 80
    training: bool = False
    chunkwise_kernel: str = DEFAULT_CHUNKWISE_KERNEL
    compute_dtype: Any = None
    img_size: int = 640
    decode_only: bool = False
    fused: bool = False  # eval-only: convs carry folded-BN biases
    sort_postprocess: bool | None = None  # None = auto (Pallas kernels)
    return_saved: bool = False  # also return every savelist intermediate

    def setup(self):
        self.layers = [
            build_module(
                s, self.nc, self.training, self.chunkwise_kernel,
                self.compute_dtype, self.img_size, self.decode_only,
                self.fused, self.sort_postprocess,
            )
            for s in self.specs
        ]

    def __call__(self, x, targets=None):
        img_hw = (x.shape[1], x.shape[2])
        saved: dict[int, jax.Array] = {}
        out = x
        for spec, layer in zip(self.specs, self.layers):
            f = spec["f"]
            if isinstance(f, int):
                inp = out if f == -1 else saved[f]
            else:
                inp = [out if j == -1 else saved[j] for j in f]
            if spec["module"] == "RTDETRDecoder":
                # CDN denoising group needs the (padded) gt targets
                out = layer(inp, img_hw=img_hw, targets=targets)
            elif spec["module"] in {"Detect", "v10Detect", "Segment", "Pose",
                                    "OBB"}:
                out = layer(inp, img_hw=img_hw)
            else:
                out = layer(inp)
            if spec["i"] in self.save:
                saved[spec["i"]] = out
        if self.return_saved:
            return out, saved
        return out


def scale_img(x, ratio: float, gs: int = 32, pad_value: float = 0.447):
    """Bilinear-resize an NHWC batch by ``ratio`` and pad to a ``gs``
    multiple (parity: ref:ultralytics/utils/torch_utils.py scale_img).

    Static-shape: the output size is a Python-level function of the
    input shape and ratio, so each ratio is its own compiled program —
    the TPU analogue of the reference's dynamic resize.
    """
    if ratio == 1.0:
        return x
    B_, h, w, c = x.shape
    sh, sw = int(h * ratio), int(w * ratio)
    y = jax.image.resize(x, (B_, sh, sw, c), method="bilinear")
    ph = math.ceil(h * ratio / gs) * gs
    pw = math.ceil(w * ratio / gs) * gs
    return jnp.pad(
        y, ((0, 0), (0, ph - sh), (0, pw - sw), (0, 0)),
        constant_values=jnp.asarray(pad_value, x.dtype),
    )


def descale_pred(p, flip: int | None, scale: float, img_hw: tuple[int, int]):
    """Undo TTA scale/flip on decoded preds (B, A, 4+nc) xywh-pixel.

    Parity: ref:ultralytics/nn/tasks.py:393-402 (_descale_pred) with the
    anchor axis second and boxes in xywh order.
    """
    xy, wh, rest = p[..., :2], p[..., 2:4], p[..., 4:]
    xy = xy / scale
    wh = wh / scale
    if flip == 2:  # ud
        xy = jnp.stack([xy[..., 0], img_hw[0] - xy[..., 1]], -1)
    elif flip == 3:  # lr
        xy = jnp.stack([img_hw[1] - xy[..., 0], xy[..., 1]], -1)
    return jnp.concatenate([xy, wh, rest], -1)


def clip_augmented(ys: list):
    """Drop unreliable scale tails (parity: ref:nn/tasks.py:404-413).

    Anchors concatenate P3->P5, so the largest-scale pass drops its P5
    (last A//21) anchors and the smallest-scale pass drops its P3
    (first 16*(A//21)) anchors; nl=3, g=1+4+16=21.
    """
    g = 21
    y0, y2 = ys[0], ys[-1]
    ys[0] = y0[:, : y0.shape[1] - y0.shape[1] // g]
    ys[-1] = y2[:, (y2.shape[1] // g) * (g - 5) :]
    return ys


def predict_augment(model, variables, x):
    """Test-time-augmented inference: scales (1, 0.83, 0.67) with an
    lr-flip on the middle pass, merged along the anchor axis.

    Parity: ref:ultralytics/nn/tasks.py:376-392 (_predict_augment).
    End2end heads revert to single-scale exactly like the reference
    (their decoded output is post-NMS topk, not mergeable anchors).
    Jittable as ONE program: the three static input shapes trace to
    three sub-graphs — no dynamic shapes on TPU.
    """
    end2end = any(s["module"] in {"v10Detect", "RTDETRDecoder"} for s in model.specs)
    if end2end:
        return model.apply(variables, x)
    img_hw = (x.shape[1], x.shape[2])
    ys = []
    for scale, flip in ((1.0, None), (0.83, 3), (0.67, None)):
        xi = jnp.flip(x, axis=2) if flip == 3 else x
        xi = scale_img(xi, scale)
        yi, _ = model.apply(variables, xi)
        ys.append(descale_pred(yi, flip, scale, img_hw))
    ys = clip_augmented(ys)
    return jnp.concatenate(ys, axis=1), None


def build_detection_model(
    cfg,
    ch: int = 3,
    nc: int | None = None,
    scale: str | None = None,
    training: bool = False,
    chunkwise_kernel: str = DEFAULT_CHUNKWISE_KERNEL,
    compute_dtype=None,
    decode_only: bool = False,
    fused: bool = False,
    sort_postprocess: bool | None = None,
    kpt_shape: tuple[int, int] | None = None,
    save_extra: Sequence[int] = (),
    return_saved: bool = False,
) -> tuple[DetectionModel, dict]:
    """Compile a model YAML into a DetectionModel (+ resolved cfg dict).

    ``kpt_shape`` overrides the Pose head's keypoint shape from the
    dataset yaml (parity: ref:models/yolo/pose/train.py:38 — the
    trainer rewrites model.kpt_shape from data['kpt_shape']).
    """
    d = yaml_model_load(cfg)
    if nc is not None and nc != d.get("nc"):
        d["nc"] = nc
    if kpt_shape is not None and "head" in d:
        head = []
        for row in d["head"]:
            if row[2] == "Pose":
                args = list(row[3])
                if len(args) > 1:
                    args[1] = list(kpt_shape)
                else:
                    args.append(list(kpt_shape))
                row = [row[0], row[1], row[2], args]
            head.append(row)
        d["head"] = head
    specs, save, ch_list = parse_model_specs(d, ch=ch, scale=scale)
    if save_extra:
        save = sorted(set(save) | set(int(i) for i in save_extra))
    chunkwise_kernel = resolve_chunkwise_kernel(chunkwise_kernel, training=training)
    model = DetectionModel(
        specs=tuple(specs),
        save=tuple(save),
        nc=d.get("nc", 80),
        training=training,
        chunkwise_kernel=chunkwise_kernel,
        compute_dtype=compute_dtype,
        img_size=int(d.get("imgsz", 640)),
        decode_only=decode_only,
        fused=fused,
        sort_postprocess=sort_postprocess,
        return_saved=return_saved,
    )
    return model, d


def extract_features(cfg, variables, x, layers: Sequence[int], **build_kw):
    """Intermediate feature maps of chosen layer indices.

    TPU-native replacement for the reference's forward-hook extractor
    (ref:vil_backbone.py — registers hooks on backbone stages): instead
    of mutating hooks, a twin model is compiled with ``layers`` added to
    the savelist and the executor returns the saved dict — pure and
    jittable.  Shares params with the plain model (the savelist does not
    change the param structure).  Returns {layer_i: array}.
    """
    model, _ = build_detection_model(
        cfg, save_extra=tuple(layers), return_saved=True, **build_kw
    )
    _, saved = model.apply(variables, x)
    return {i: saved[i] for i in layers}


def embed_features(cfg, variables, x, layers: Sequence[int], **build_kw):
    """Pooled per-layer embeddings, concatenated to (B, sum C).

    Parity: ref:ultralytics/nn/tasks.py:178-181 (``embed=`` arg of
    BaseModel._predict_once — adaptive-avg-pool each requested layer to
    1x1 and concatenate).  NHWC maps mean over (H, W); (B, S, D)
    sequence outputs mean over S.
    """
    feats = extract_features(cfg, variables, x, layers, **build_kw)
    pooled = []
    for i in layers:
        f = feats[i]
        axes = tuple(range(1, f.ndim - 1))
        pooled.append(f.mean(axis=axes) if axes else f)
    return jnp.concatenate(pooled, axis=-1)
