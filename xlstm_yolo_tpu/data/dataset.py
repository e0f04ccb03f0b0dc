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

from xlstm_yolo_tpu.data.augment import LetterBox, TrainTransforms

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
    """Detection dataset: scan, verify, cache labels; serve samples."""

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
    ):
        self.img_path = img_path
        self.imgsz = imgsz
        self.task = task
        self.augment = augment
        self.max_targets = max_targets
        self.single_cls = single_cls
        self.names = names or {}
        self.im_files = self._scan_images(img_path, fraction)
        self.labels = self._load_labels()
        self.hyp = hyp
        # cache: False | True/'ram' (decoded arrays in memory) | 'disk'
        # (decoded .npy sidecars, mmap-loaded — parity: ref:data/base.py:205)
        self.cache_mode = {True: "ram", False: None}.get(cache, cache) or None
        self._ims = [None] * len(self.im_files) if self.cache_mode == "ram" else None
        if augment and hyp is not None:
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
                fliplr=getattr(hyp, "fliplr", 0.5),
                flipud=getattr(hyp, "flipud", 0.0),
                copy_paste=getattr(hyp, "copy_paste", 0.0),
            )
        else:
            self.transforms = None
        # val/eval letterbox only scales DOWN, matching the reference's val
        # transform (ref:ultralytics/data/dataset.py:181 scaleup=False) —
        # upscaling small images inflates/deflates val mAP vs the reference.
        self.letterbox = LetterBox((imgsz, imgsz), auto=False, scaleup=bool(augment))

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
            ("".join(self.im_files) + str(self.max_targets)).encode()
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
        labels = []
        for f in self.im_files:
            lp = img2label_path(f)
            cls, boxes, segments = [], [], []
            if Path(lp).exists():
                for line in Path(lp).read_text().splitlines():
                    vals = line.split()
                    if len(vals) > 5 and len(vals) % 2 == 1:
                        # segment row: class + polygon (x y)*n normalized
                        c = int(float(vals[0]))
                        poly = np.array(list(map(float, vals[1:])), np.float32).reshape(-1, 2)
                        x1, y1 = poly.min(0)
                        x2, y2 = poly.max(0)
                        cls.append(0 if self.single_cls else c)
                        boxes.append(np.array(
                            [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], np.float32))
                        segments.append(poly)
                    elif len(vals) >= 5:
                        c = int(float(vals[0]))
                        xywh = np.array(list(map(float, vals[1:5])), np.float32)
                        if (xywh[2:] > 0).all() and (0 <= xywh).all() and (xywh <= 1.0001).all():
                            cls.append(0 if self.single_cls else c)
                            boxes.append(xywh)
                            segments.append(None)
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
            labels.append(
                {
                    "cls": cls_a,
                    "bboxes_n": box_a,  # xywh norm
                    "segments": segments,  # list of (K, 2) normalized polys or None
                }
            )
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

    def load_for_mosaic(self, i: int, size: int):
        """Image resized so the long side == size, labels in pixel xyxy."""
        im = self.load_image(i)
        h0, w0 = im.shape[:2]
        r = size / max(h0, w0)
        if r != 1:
            im = cv2.resize(im, (round(w0 * r), round(h0 * r)), interpolation=cv2.INTER_LINEAR)
        h, w = im.shape[:2]
        lab = self.labels[i]
        b = lab["bboxes_n"]
        if len(b):
            xy = b[:, :2] * [w, h]
            wh = b[:, 2:] * [w, h]
            boxes = np.concatenate([xy - wh / 2, xy + wh / 2], 1).astype(np.float32)
        else:
            boxes = np.zeros((0, 4), np.float32)
        return im, boxes, lab["cls"].copy()

    def get_sample(self, i: int, rng: random.Random):
        """-> dict(img uint8 RGB HWC, cls, bboxes xyxy px, mask, meta)."""
        if self.transforms is not None:
            img, bboxes, cls = self.transforms(i, rng)
            ratio_pad = None
            orig_shape = (self.imgsz, self.imgsz)
        else:
            im = self.load_image(i)
            orig_shape = im.shape[:2]
            lab = self.labels[i]
            b = lab["bboxes_n"]
            h0, w0 = orig_shape
            if len(b):
                xy = b[:, :2] * [w0, h0]
                wh = b[:, 2:] * [w0, h0]
                boxes = np.concatenate([xy - wh / 2, xy + wh / 2], 1).astype(np.float32)
            else:
                boxes = np.zeros((0, 4), np.float32)
            out = self.letterbox(im, {"bboxes": boxes, "cls": lab["cls"]})
            img, bboxes, cls = out["img"], out["bboxes"], lab["cls"]
            ratio_pad = out["ratio_pad"]
        img = np.ascontiguousarray(img[..., ::-1])  # BGR -> RGB
        masks = None
        if self.task == "segment":
            masks = self._rasterize_masks(i, ratio_pad, len(cls))
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
        if self.task == "obb":
            rb = self._rboxes(i, ratio_pad, bboxes)  # (n, 5) letterboxed px
            rb_p = np.zeros((M, 5), np.float32)
            rb_p[: min(len(rb), M)] = rb[:M]
            sample["rboxes"] = rb_p
        return sample

    def _rboxes(self, i: int, ratio_pad, fallback_xyxy) -> np.ndarray:
        """Per-instance xywhr rotated boxes in letterboxed pixels.

        Polygon rows (DOTA yolo-obb format: class + 4 corner points) map
        through cv2.minAreaRect (parity: ref:utils/ops.py
        xyxyxyxy2xywhr); plain box rows fall back to angle 0.
        """
        lab = self.labels[i]
        (rw, rh), (padw, padh) = ratio_pad if ratio_pad else ((1.0, 1.0), (0.0, 0.0))
        h0, w0 = self.load_image(i).shape[:2]
        out = []
        for j, seg in enumerate(lab["segments"]):
            if seg is not None and len(seg) >= 3:
                pts = seg * [w0, h0] * [rw, rh] + [padw, padh]
                (cx, cy), (bw, bh), ang = cv2.minAreaRect(pts.astype(np.float32))
                out.append([cx, cy, bw, bh, ang * math.pi / 180.0])
            elif j < len(fallback_xyxy):
                x1, y1, x2, y2 = fallback_xyxy[j]
                out.append([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1, 0.0])
        return np.asarray(out, np.float32).reshape(-1, 5)

    def _rasterize_masks(self, i: int, ratio_pad, n: int) -> np.ndarray:
        """Per-instance binary masks at imgsz//4, letterbox-aligned.

        Polygon rows rasterize exactly; box-only rows fall back to the
        filled box (the reference errors instead; the fallback keeps
        detect-format datasets trainable for quick seg experiments).
        """
        lab = self.labels[i]
        ms = self.imgsz // 4
        (rw, rh), (padw, padh) = ratio_pad if ratio_pad else ((1.0, 1.0), (0.0, 0.0))
        h0, w0 = self.load_image(i).shape[:2]
        sx = lambda xn: (xn * w0 * rw + padw) / 4.0
        sy = lambda yn: (yn * h0 * rh + padh) / 4.0
        out = []
        segs = lab.get("segments", [None] * n)
        boxes_n = lab["bboxes_n"]
        for j in range(min(n, len(boxes_n))):
            m = np.zeros((ms, ms), np.uint8)
            seg = segs[j] if j < len(segs) else None
            if seg is not None:
                pts = np.stack([sx(seg[:, 0]), sy(seg[:, 1])], -1)
                cv2.fillPoly(m, [pts.astype(np.int32)], 1)
            else:
                cx, cy, bw, bh = boxes_n[j]
                m[int(sy(cy - bh / 2)): int(sy(cy + bh / 2)),
                  int(sx(cx - bw / 2)): int(sx(cx + bw / 2))] = 1
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
            **({"rboxes": np.stack([s["rboxes"] for s in samples])}
               if "rboxes" in samples[0] else {}),
        }


class ClassificationDataset:
    """ImageNet-style folder dataset: root/<class_name>/*.jpg.

    Parity: ref:data/dataset.py ClassificationDataset (torchvision
    ImageFolder semantics).  Val transform: aspect-preserving resize of
    the short side to imgsz then center crop; train adds horizontal
    flip (the reference's RandomResizedCrop scale jitter is a planned
    extension).  Serves uint8 RGB HWC.
    """

    def __init__(self, root: str, imgsz: int = 224, augment: bool = False):
        self.root = Path(root)
        self.imgsz = imgsz
        self.augment = augment
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

    def __len__(self):
        return len(self.samples)

    def get_sample(self, i: int, rng: random.Random):
        path, label = self.samples[i]
        im = cv2.imread(path)
        if im is None:
            raise FileNotFoundError(path)
        h, w = im.shape[:2]
        s = self.imgsz / min(h, w)
        im = cv2.resize(im, (max(self.imgsz, round(w * s)), max(self.imgsz, round(h * s))),
                        interpolation=cv2.INTER_LINEAR)
        h, w = im.shape[:2]
        top, left = (h - self.imgsz) // 2, (w - self.imgsz) // 2
        im = im[top : top + self.imgsz, left : left + self.imgsz]
        if self.augment and rng.random() < 0.5:
            im = im[:, ::-1]
        return {"img": np.ascontiguousarray(im[..., ::-1]), "cls": label, "im_file": path}

    @staticmethod
    def collate(samples: list[dict]) -> dict:
        return {
            "img": np.stack([s["img"] for s in samples]),
            "cls": np.asarray([s["cls"] for s in samples], np.int32),
            "im_file": [s["im_file"] for s in samples],
        }
