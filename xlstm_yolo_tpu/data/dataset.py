"""YOLO-format detection dataset with label caching and padded batches.

Re-design of ref:ultralytics/data/base.py:21-346 and dataset.py:45-250:
same on-disk format (images dir + labels/*.txt with normalized xywh,
dataset YAML with path/train/val/names), but batches collate to *padded*
fixed-shape arrays (img uint8 NHWC RGB; cls/bboxes/mask padded to
``max_targets``) so the jitted train step never re-specializes.
"""

from __future__ import annotations

import hashlib
import json
import math
import random
from pathlib import Path

import cv2
import numpy as np
import yaml

from xlstm_yolo_tpu.data.augment import SEGMENT_RESAMPLE, LetterBox, TrainTransforms

IMG_EXTS = {".bmp", ".jpeg", ".jpg", ".png", ".tif", ".tiff", ".webp", ".mpo"}


def check_det_dataset(data: str | dict) -> dict:
    """Resolve a dataset YAML into absolute split paths + names."""
    if isinstance(data, (str, Path)):
        p = Path(data)
        with open(p) as fh:
            d = yaml.safe_load(fh)
        d["yaml_dir"] = str(p.parent)
    else:
        d = dict(data)
    root = Path(d.get("path") or d.get("yaml_dir") or ".")
    if not root.is_absolute():
        root = Path(d.get("yaml_dir", ".")) / root
    out = dict(d)
    for split in ("train", "val", "test"):
        if d.get(split):
            sp = Path(d[split])
            out[split] = str(sp if sp.is_absolute() else root / sp)
    names = d.get("names", {})
    if isinstance(names, list):
        names = dict(enumerate(names))
    out["names"] = {int(k): str(v) for k, v in names.items()}
    out["nc"] = d.get("nc", len(out["names"]) or 80)
    return out


def img2label_path(img_path: str) -> str:
    """images/... -> labels/....txt (parity: data/utils.py img2label_paths)."""
    sa, sb = f"{Path('/').root}", None
    p = Path(img_path)
    parts = list(p.parts)
    for i in range(len(parts) - 1, -1, -1):
        if parts[i] == "images":
            parts[i] = "labels"
            break
    return str(Path(*parts).with_suffix(".txt"))


class YOLODataset:
    """Detection dataset: scan, verify, cache labels; serve samples.

    ``task`` selects the label interpretation: 'pose' parses keypoint
    rows (class + xywh + K*(x y [v]) — ref:ultralytics/data/dataset.py:45
    ``use_keypoints``); 'segment'/'obb' parse polygon rows.
    """

    def __init__(
        self,
        img_path: str,
        imgsz: int = 640,
        task: str = "detect",
        augment: bool = False,
        hyp=None,
        max_targets: int = 128,
        single_cls: bool = False,
        cache: bool = False,
        names: dict | None = None,
        fraction: float = 1.0,
        kpt_shape: tuple[int, int] | None = None,
        flip_idx=None,
    ):
        self.img_path = img_path
        self.imgsz = imgsz
        self.task = task
        self.augment = augment
        self.max_targets = max_targets
        self.single_cls = single_cls
        self.names = names or {}
        self.use_keypoints = task == "pose"
        self.kpt_shape = tuple(kpt_shape) if kpt_shape else ((17, 3) if self.use_keypoints else None)
        self.flip_idx = list(flip_idx) if flip_idx else None
        self.im_files = self._scan_images(img_path, fraction)
        self.labels = self._load_labels()
        self.hyp = hyp
        # cache: False | True/'ram' (decoded arrays in memory) | 'disk'
        # (decoded .npy sidecars, mmap-loaded — parity: ref:data/base.py:205)
        self.cache_mode = {True: "ram", False: None}.get(cache, cache) or None
        self._ims = [None] * len(self.im_files) if self.cache_mode == "ram" else None
        if augment and hyp is not None:
            fliplr = getattr(hyp, "fliplr", 0.5)
            if self.use_keypoints and not self.flip_idx and fliplr > 0:
                # parity: ref:data/augment.py:2329 — without a flip_idx
                # map a horizontal flip would silently swap left/right
                # keypoint semantics, so fliplr is disabled
                fliplr = 0.0
            self.transforms = TrainTransforms(
                dataset=self,
                imgsz=imgsz,
                mosaic=getattr(hyp, "mosaic", 1.0),
                mixup=getattr(hyp, "mixup", 0.0),
                degrees=getattr(hyp, "degrees", 0.0),
                translate=getattr(hyp, "translate", 0.1),
                scale=getattr(hyp, "scale", 0.5),
                shear=getattr(hyp, "shear", 0.0),
                perspective=getattr(hyp, "perspective", 0.0),
                hsv_h=getattr(hyp, "hsv_h", 0.015),
                hsv_s=getattr(hyp, "hsv_s", 0.7),
                hsv_v=getattr(hyp, "hsv_v", 0.4),
                fliplr=fliplr,
                flipud=getattr(hyp, "flipud", 0.0),
                copy_paste=getattr(hyp, "copy_paste", 0.0),
                flip_idx=self.flip_idx,
            )
        else:
            self.transforms = None
        # val/eval letterbox DOES scale up: the reference's val letterbox is
        # scaleup=False (ref:ultralytics/data/dataset.py:181) but its
        # load_image has ALREADY resized the long side to imgsz — including
        # upscaling small images (ref:ultralytics/data/base.py:168-172
        # `r = imgsz / max(h0, w0)` applied for any r != 1) — so the
        # letterbox is a pad-only no-op and the effective protocol is
        # always-resize. Measured: evaluating small images un-upscaled
        # shifted mAP50-95 by +0.087 on the trained-parity set
        # (scripts/parity_trained_diag2.py decomposition).
        self.letterbox = LetterBox((imgsz, imgsz), auto=False, scaleup=True)

    # -- scanning / label cache -------------------------------------------
    @staticmethod
    def _scan_images(img_path: str, fraction: float = 1.0) -> list[str]:
        p = Path(img_path)
        if p.is_dir():
            files = sorted(
                str(f) for f in p.rglob("*.*") if f.suffix.lower() in IMG_EXTS
            )
        elif p.is_file() and p.suffix == ".txt":  # file list
            files = [l.strip() for l in p.read_text().splitlines() if l.strip()]
        else:
            raise FileNotFoundError(f"dataset path not found: {img_path}")
        if fraction < 1.0:
            files = files[: max(1, int(len(files) * fraction))]
        if not files:
            raise FileNotFoundError(f"no images under {img_path}")
        return files

    def _cache_path(self) -> Path:
        h = hashlib.sha1(
            ("".join(self.im_files) + str(self.max_targets)
             + str(self.kpt_shape) + str(self.use_keypoints)).encode()
        ).hexdigest()[:16]
        return Path(self.im_files[0]).parent / f".xyt_labels_{h}.cache.npz"

    def _load_labels(self) -> list[dict]:
        cache = self._cache_path()
        if cache.exists():
            try:
                z = np.load(cache, allow_pickle=True)
                return list(z["labels"])
            except Exception:
                pass
        K, nd = self.kpt_shape if self.kpt_shape else (0, 0)
        labels = []
        for f in self.im_files:
            lp = img2label_path(f)
            cls, boxes, segments, kpts = [], [], [], []
            if Path(lp).exists():
                for line in Path(lp).read_text().splitlines():
                    vals = line.split()
                    if self.use_keypoints and len(vals) == 5 + K * nd:
                        # pose row: class + xywh + K*(x y [v]) normalized
                        # (parity: ref:data/utils.py verify_image_label kpt path)
                        c = int(float(vals[0]))
                        xywh = np.array(list(map(float, vals[1:5])), np.float32)
                        pts = np.array(list(map(float, vals[5:])), np.float32).reshape(K, nd)
                        if nd == 2:
                            vis = np.where((pts[:, 0] < 0) | (pts[:, 1] < 0), 0.0, 1.0)
                            pts = np.concatenate([pts, vis[:, None].astype(np.float32)], 1)
                        cls.append(0 if self.single_cls else c)
                        boxes.append(xywh)
                        segments.append(None)
                        kpts.append(pts)
                    elif not self.use_keypoints and len(vals) > 5 and len(vals) % 2 == 1:
                        # segment row: class + polygon (x y)*n normalized
                        c = int(float(vals[0]))
                        poly = np.array(list(map(float, vals[1:])), np.float32).reshape(-1, 2)
                        x1, y1 = poly.min(0)
                        x2, y2 = poly.max(0)
                        cls.append(0 if self.single_cls else c)
                        boxes.append(np.array(
                            [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], np.float32))
                        segments.append(poly)
                        kpts.append(None)
                    elif len(vals) >= 5:
                        c = int(float(vals[0]))
                        xywh = np.array(list(map(float, vals[1:5])), np.float32)
                        if (xywh[2:] > 0).all() and (0 <= xywh).all() and (xywh <= 1.0001).all():
                            cls.append(0 if self.single_cls else c)
                            boxes.append(xywh)
                            segments.append(None)
                            kpts.append(None)
            cls_a = np.asarray(cls, np.int64)
            box_a = np.asarray(boxes, np.float32).reshape(-1, 4)
            if len(cls_a):
                # drop exact duplicate rows, preserving first-seen order
                # (parity: ref:data/utils.py:143 verify_image_label np.unique)
                rows = np.concatenate([cls_a[:, None].astype(np.float32), box_a], 1)
                _, idx = np.unique(rows, axis=0, return_index=True)
                if len(idx) < len(cls_a):
                    idx = np.sort(idx)
                    cls_a, box_a = cls_a[idx], box_a[idx]
                    segments = [segments[j] for j in idx]
                    kpts = [kpts[j] for j in idx]
            lab = {
                "cls": cls_a,
                "bboxes_n": box_a,  # xywh norm
                "segments": segments,  # list of (P, 2) normalized polys or None
            }
            if self.use_keypoints:
                lab["keypoints_n"] = (
                    np.stack([k if k is not None else np.zeros((K, 3), np.float32)
                              for k in kpts])
                    if kpts else np.zeros((0, K, 3), np.float32)
                )  # (n, K, 3) normalized
            labels.append(lab)
        try:
            np.savez_compressed(cache, labels=np.asarray(labels, dtype=object))
        except Exception:
            pass
        return labels

    # -- sample loading ------------------------------------------------------
    def __len__(self):
        return len(self.im_files)

    def load_image(self, i: int):
        if self._ims is not None and self._ims[i] is not None:
            return self._ims[i]
        if self.cache_mode == "disk":
            npy = Path(self.im_files[i]).with_suffix(".npy")
            if npy.exists():
                return np.load(npy, mmap_mode="r")
        im = cv2.imread(self.im_files[i])
        if im is None:
            raise FileNotFoundError(f"image not found {self.im_files[i]}")
        if self.cache_mode == "disk":
            np.save(Path(self.im_files[i]).with_suffix(".npy"), im)
        elif self._ims is not None:
            self._ims[i] = im
        return im

    def _px_labels(self, i: int, w: int, h: int) -> dict:
        """Pixel-space labels dict for image i scaled to (w, h).

        {cls, bboxes xyxy px, segments (n, Sp, 2) px (Sp=0 when the task
        ignores polygons), keypoints (n, K, 3) px | None} — the contract
        every transform in data/augment.py moves.
        """
        from xlstm_yolo_tpu.data.augment import resample_segments

        lab = self.labels[i]
        b = lab["bboxes_n"]
        n = len(b)
        if n:
            xy = b[:, :2] * [w, h]
            wh = b[:, 2:] * [w, h]
            boxes = np.concatenate([xy - wh / 2, xy + wh / 2], 1).astype(np.float32)
        else:
            boxes = np.zeros((0, 4), np.float32)
        labels = {"cls": lab["cls"].copy(), "bboxes": boxes}
        if self.task in ("segment", "obb"):
            # polygon per instance (box corners for box-only rows — the
            # fallback that keeps detect-format datasets trainable)
            polys = []
            for j in range(n):
                seg = lab["segments"][j]
                if seg is not None and len(seg) >= 3:
                    polys.append(seg * [w, h])
                else:
                    x1, y1, x2, y2 = boxes[j]
                    polys.append(np.array(
                        [[x1, y1], [x2, y1], [x2, y2], [x1, y2]], np.float32))
            labels["segments"] = (
                resample_segments(polys, SEGMENT_RESAMPLE)
                if polys else np.zeros((0, SEGMENT_RESAMPLE, 2), np.float32)
            )
        else:
            labels["segments"] = np.zeros((n, 0, 2), np.float32)
        if self.use_keypoints:
            k = lab["keypoints_n"].copy()
            k[..., 0] *= w
            k[..., 1] *= h
            labels["keypoints"] = k
        else:
            labels["keypoints"] = None
        return labels

    def load_for_mosaic(self, i: int, size: int):
        """Image resized so the long side == size + pixel-space labels."""
        im = self.load_image(i)
        h0, w0 = im.shape[:2]
        r = size / max(h0, w0)
        if r != 1:
            im = cv2.resize(im, (round(w0 * r), round(h0 * r)), interpolation=cv2.INTER_LINEAR)
        h, w = im.shape[:2]
        return im, self._px_labels(i, w, h)

    def get_sample(self, i: int, rng: random.Random):
        """-> dict(img uint8 RGB HWC, cls, bboxes xyxy px, mask, meta,
        + per-task masks/kpts/rboxes padded arrays)."""
        if self.transforms is not None:
            labels = self.transforms(i, rng)
            img, bboxes, cls = labels["img"], labels["bboxes"], labels["cls"]
            ratio_pad = None
            orig_shape = (self.imgsz, self.imgsz)
            segments_px = labels["segments"]
            kpts_px = labels["keypoints"]
        else:
            im = self.load_image(i)
            h0, w0 = im.shape[:2]
            orig_shape = (h0, w0)
            # reference val protocol, replicated exactly: load_image FIRST
            # resizes the long side to imgsz — up or down, per-dim ceil
            # capped at imgsz (ref:data/base.py:168-172) — then the
            # letterbox only pads, and scale_boxes inverts with
            # gain = resized_h/h0 (ref:data/base.py:295-298,
            # utils/ops.py:117). The earlier single-letterbox val fed
            # different pixels: +0.087 mAP50-95 without upscale, -0.034
            # with round-arithmetic upscale, on the trained-parity set
            # (scripts/parity_trained_diag2.py isolated the delta to the
            # pixel path — matching and AP math are bit-identical).
            r = self.imgsz / max(h0, w0)
            if r != 1:
                wr = min(math.ceil(w0 * r), self.imgsz)
                hr = min(math.ceil(h0 * r), self.imgsz)
                im = cv2.resize(im, (wr, hr), interpolation=cv2.INTER_LINEAR)
            else:
                hr, wr = h0, w0
            labels0 = self._px_labels(i, wr, hr)
            out = self.letterbox(im, labels0)
            img, bboxes, cls = out["img"], out["bboxes"], labels0["cls"]
            ratio_pad = ((hr / h0, wr / w0), out["ratio_pad"][1])
            segments_px = out["segments"]
            kpts_px = out["keypoints"]
        img = np.ascontiguousarray(img[..., ::-1])  # BGR -> RGB
        masks = None
        if self.task == "segment":
            masks = self._rasterize_from_segments(segments_px, len(cls))
        M = self.max_targets
        n = min(len(cls), M)
        cls_p = np.zeros((M,), np.int32)
        box_p = np.zeros((M, 4), np.float32)
        mask = np.zeros((M,), bool)
        if n:
            cls_p[:n] = cls[:n]
            box_p[:n] = bboxes[:n]
            mask[:n] = True
        sample = {
            "img": img,
            "cls": cls_p,
            "bboxes": box_p,
            "mask": mask,
            "im_file": self.im_files[i],
            "orig_shape": orig_shape,
            "ratio_pad": ratio_pad,
        }
        if masks is not None:
            ms = self.imgsz // 4  # proto-resolution targets (stride-8 P2 x2 up)
            mp = np.zeros((M, ms, ms), np.uint8)
            mp[: min(len(masks), M)] = masks[:M]
            sample["masks"] = mp
        if self.use_keypoints:
            K = self.kpt_shape[0]
            kp = np.zeros((M, K, 3), np.float32)
            if kpts_px is not None and len(kpts_px):
                kp[: min(len(kpts_px), M)] = kpts_px[:M]
            sample["kpts"] = kp
        if self.task == "obb":
            rb = self._rboxes_from_segments(segments_px, bboxes)  # (n, 5) px
            rb_p = np.zeros((M, 5), np.float32)
            rb_p[: min(len(rb), M)] = rb[:M]
            sample["rboxes"] = rb_p
        return sample

    def _rboxes_from_segments(self, segments_px: np.ndarray, fallback_xyxy) -> np.ndarray:
        """Per-instance xywhr rotated boxes from the final (possibly
        augmented) pixel-space polygons via cv2.minAreaRect (parity:
        ref:utils/ops.py xyxyxyxy2xywhr); empty polygons fall back to
        the axis-aligned box at angle 0."""
        n = len(segments_px) if segments_px.size else len(fallback_xyxy)
        out = []
        for j in range(n):
            if segments_px.size and segments_px.shape[1] >= 3:
                pts = segments_px[j].astype(np.float32)
                (cx, cy), (bw, bh), ang = cv2.minAreaRect(pts)
                out.append([cx, cy, bw, bh, ang * math.pi / 180.0])
            elif j < len(fallback_xyxy):
                x1, y1, x2, y2 = fallback_xyxy[j]
                out.append([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1, 0.0])
        return np.asarray(out, np.float32).reshape(-1, 5)

    def _rasterize_from_segments(self, segments_px: np.ndarray, n: int) -> np.ndarray:
        """Per-instance binary masks at imgsz//4 from the final (possibly
        augmented) pixel-space polygons — rasterizing AFTER the geometric
        transforms keeps masks aligned with the augmented boxes (the
        round-2 letterbox-only path rasterized pre-transform polygons).
        """
        ms = self.imgsz // 4
        out = []
        for j in range(min(n, len(segments_px))):
            m = np.zeros((ms, ms), np.uint8)
            pts = (segments_px[j] / 4.0).astype(np.int32)
            cv2.fillPoly(m, [pts], 1)
            out.append(m)
        return np.asarray(out, np.uint8).reshape(-1, ms, ms)

    @staticmethod
    def collate(samples: list[dict]) -> dict:
        return {
            "img": np.stack([s["img"] for s in samples]),
            "cls": np.stack([s["cls"] for s in samples]),
            "bboxes": np.stack([s["bboxes"] for s in samples]),
            "mask": np.stack([s["mask"] for s in samples]),
            "im_file": [s["im_file"] for s in samples],
            "orig_shape": [s["orig_shape"] for s in samples],
            "ratio_pad": [s["ratio_pad"] for s in samples],
            **({"masks": np.stack([s["masks"] for s in samples])}
               if "masks" in samples[0] else {}),
            **({"kpts": np.stack([s["kpts"] for s in samples])}
               if "kpts" in samples[0] else {}),
            **({"rboxes": np.stack([s["rboxes"] for s in samples])}
               if "rboxes" in samples[0] else {}),
        }


class ClassificationDataset:
    """ImageNet-style folder dataset: root/<class_name>/*.jpg.

    Parity: ref:data/dataset.py:415-459 ClassificationDataset
    (torchvision ImageFolder semantics).  Val transform: aspect-
    preserving resize of the short side to floor(imgsz/crop_fraction)
    then center crop (ref:data/augment.py:2348 classify_transforms).
    Train transform: ClassifyAugment — RandomResizedCrop with
    scale=(1-hyp.scale, 1.0), H/V flips from fliplr/flipud, HSV color
    jitter, random erasing (ref:data/augment.py:2405
    classify_augmentations; the reference wires the same hyp keys at
    ref:data/dataset.py:445-456).  Serves uint8 RGB HWC.
    """

    def __init__(self, root: str, imgsz: int = 224, augment: bool = False,
                 hyp=None, fraction: float = 1.0):
        self.root = Path(root)
        self.imgsz = imgsz
        self.augment = augment
        self.fraction = float(fraction)
        self.crop_fraction = float(getattr(hyp, "crop_fraction", 1.0) or 1.0)
        if augment:
            from xlstm_yolo_tpu.data.augment import ClassifyAugment

            g = lambda k, d: float(getattr(hyp, k, d) if hyp is not None else d)
            self.transform = ClassifyAugment(
                size=imgsz,
                scale=(1.0 - g("scale", 0.5), 1.0),
                hflip=g("fliplr", 0.5),
                vflip=g("flipud", 0.0),
                hsv_h=g("hsv_h", 0.015),
                hsv_s=g("hsv_s", 0.4),
                hsv_v=g("hsv_v", 0.4),
                erasing=g("erasing", 0.0),
            )
        else:
            self.transform = None
        classes = sorted(d.name for d in self.root.iterdir() if d.is_dir())
        if not classes:
            raise FileNotFoundError(f"no class folders under {root}")
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.names = dict(enumerate(classes))
        self.samples = [
            (str(f), self.class_to_idx[c])
            for c in classes
            for f in sorted((self.root / c).rglob("*.*"))
            if f.suffix.lower() in IMG_EXTS
        ]
        if self.fraction < 1.0:
            # per-class truncation so a small fraction keeps every class
            # (ref:data/dataset.py fraction arg)
            by_cls: dict[int, list] = {}
            for s in self.samples:
                by_cls.setdefault(s[1], []).append(s)
            self.samples = [
                s for lst in by_cls.values()
                for s in lst[: max(1, int(len(lst) * self.fraction))]
            ]

    def __len__(self):
        return len(self.samples)

    def get_sample(self, i: int, rng: random.Random):
        path, label = self.samples[i]
        im = cv2.imread(path)
        if im is None:
            raise FileNotFoundError(path)
        if self.transform is not None:
            im = self.transform(im, rng)
        else:
            h, w = im.shape[:2]
            scale_size = int(self.imgsz / self.crop_fraction)
            s = scale_size / min(h, w)
            im = cv2.resize(im, (max(scale_size, round(w * s)), max(scale_size, round(h * s))),
                            interpolation=cv2.INTER_LINEAR)
            h, w = im.shape[:2]
            top, left = (h - self.imgsz) // 2, (w - self.imgsz) // 2
            im = im[top : top + self.imgsz, left : left + self.imgsz]
        return {"img": np.ascontiguousarray(im[..., ::-1]), "cls": label, "im_file": path}

    @staticmethod
    def collate(samples: list[dict]) -> dict:
        return {
            "img": np.stack([s["img"] for s in samples]),
            "cls": np.asarray([s["cls"] for s in samples], np.int32),
            "im_file": [s["im_file"] for s in samples],
        }
