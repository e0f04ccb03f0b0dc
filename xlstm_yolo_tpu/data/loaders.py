"""Inference source loaders (images, videos, dirs, arrays, streams).

Re-design of ref:ultralytics/data/loaders.py:51-560 — host-side cv2
decoding that yields (paths, bgr_images, metadata) batches for the
predictor.  Stream sources run a reader thread per source with a
most-recent-frame buffer.
"""

from __future__ import annotations

import glob
import threading
import time
from pathlib import Path
from typing import Iterator

import cv2
import numpy as np

IMG_FORMATS = {"bmp", "dng", "jpeg", "jpg", "mpo", "png", "tif", "tiff", "webp", "pfm"}
VID_FORMATS = {"asf", "avi", "gif", "m4v", "mkv", "mov", "mp4", "mpeg", "mpg", "ts", "wmv", "webm"}


class LoadImagesAndVideos:
    """Iterate image files and video frames (parity: loaders.py:284-450)."""

    def __init__(self, path, batch: int = 1, vid_stride: int = 1):
        files = []
        for p in path if isinstance(path, (list, tuple)) else [path]:
            p = str(p)
            if "*" in p:
                files.extend(sorted(glob.glob(p, recursive=True)))
            elif Path(p).is_dir():
                files.extend(sorted(glob.glob(str(Path(p) / "**" / "*.*"), recursive=True)))
            elif Path(p).is_file():
                files.append(p)
            else:
                raise FileNotFoundError(f"source not found: {p}")
        self.files = [
            f for f in files if f.rsplit(".", 1)[-1].lower() in IMG_FORMATS | VID_FORMATS
        ]
        if not self.files:
            raise FileNotFoundError(f"no images/videos in source {path}")
        self.batch = batch
        self.vid_stride = vid_stride
        self.mode = "image"

    def __len__(self):
        return len(self.files)

    def __iter__(self) -> Iterator:
        paths, imgs, infos = [], [], []
        for f in self.files:
            ext = f.rsplit(".", 1)[-1].lower()
            if ext in IMG_FORMATS:
                im = cv2.imread(f)
                if im is None:
                    continue
                paths.append(f)
                imgs.append(im)
                infos.append(f"image {f}")
                if len(imgs) == self.batch:
                    yield paths, imgs, infos
                    paths, imgs, infos = [], [], []
            else:
                cap = cv2.VideoCapture(f)
                frame_idx = 0
                while cap.isOpened():
                    ok = cap.grab()
                    if not ok:
                        break
                    frame_idx += 1
                    if (frame_idx - 1) % self.vid_stride:
                        continue
                    ok, im = cap.retrieve()
                    if not ok:
                        break
                    paths.append(f)
                    imgs.append(im)
                    infos.append(f"video {f} frame {frame_idx}")
                    if len(imgs) == self.batch:
                        yield paths, imgs, infos
                        paths, imgs, infos = [], [], []
                cap.release()
        if imgs:
            yield paths, imgs, infos


class LoadPilAndNumpy:
    """In-memory images (np arrays / PIL) (parity: loaders.py:451-515)."""

    def __init__(self, imgs, batch: int | None = None):
        if not isinstance(imgs, (list, tuple)):
            imgs = [imgs]
        self.imgs = [self._as_bgr(im) for im in imgs]
        self.paths = [getattr(im, "filename", f"image{i}.jpg") for i, im in enumerate(imgs)]
        self.batch = batch or len(self.imgs)
        self.mode = "image"

    @staticmethod
    def _as_bgr(im):
        if hasattr(im, "mode"):  # PIL
            arr = np.asarray(im.convert("RGB"))
            return np.ascontiguousarray(arr[..., ::-1])
        return np.asarray(im)

    def __len__(self):
        return len(self.imgs)

    def __iter__(self):
        for i in range(0, len(self.imgs), self.batch):
            sl = slice(i, i + self.batch)
            yield self.paths[sl], self.imgs[sl], [""] * len(self.imgs[sl])


class LoadTensor:
    """Pre-batched tensors (torch/jax/np, BCHW or BHWC, float 0-1 or uint8)
    (parity: ref:data/loaders.py:516-560)."""

    def __init__(self, tensor):
        arr = np.asarray(tensor)
        if arr.ndim == 3:
            arr = arr[None]
        assert arr.ndim == 4, f"expected 3/4-D tensor, got {arr.shape}"
        if arr.shape[1] in (1, 3) and arr.shape[-1] not in (1, 3):  # BCHW -> BHWC
            arr = arr.transpose(0, 2, 3, 1)
        if arr.dtype != np.uint8:
            assert arr.max() <= 1.0 + 1e-3, "float tensor sources must be 0-1"
            arr = (arr * 255).astype(np.uint8)
        self.imgs = [np.ascontiguousarray(a[..., ::-1]) for a in arr]  # RGB->BGR
        self.paths = [f"tensor{i}.jpg" for i in range(len(self.imgs))]
        self.batch = len(self.imgs)
        self.mode = "image"

    def __len__(self):
        return len(self.imgs)

    def __iter__(self):
        yield self.paths, self.imgs, [""] * len(self.imgs)


class LoadScreenshots:
    """Desktop screenshot source via ``mss`` (parity: loaders.py:213-283).

    Source syntax: "screen" or "screen 0 left top width height"."""

    def __init__(self, source: str = "screen"):
        try:
            import mss
        except ImportError as e:  # pragma: no cover - mss not in this image
            raise ImportError("screenshot source requires the 'mss' package") from e
        parts = str(source).split()
        self.screen = int(parts[1]) if len(parts) > 1 else 0
        self.sct = mss.mss()
        mon = self.sct.monitors[self.screen + 1]
        if len(parts) == 6:
            left, top, w, h = map(int, parts[2:6])
            self.monitor = {"left": mon["left"] + left, "top": mon["top"] + top,
                            "width": w, "height": h}
        else:
            self.monitor = mon
        self.mode = "stream"
        self.frame = 0

    def __iter__(self):
        return self

    def __next__(self):
        im = np.asarray(self.sct.grab(self.monitor))[..., :3]  # BGRA -> BGR
        self.frame += 1
        return [f"screen{self.screen}.jpg"], [np.ascontiguousarray(im)], [f"frame {self.frame}"]


class LoadStreams:
    """Threaded webcam/RTSP/HTTP stream reader (parity: loaders.py:51-212)."""

    def __init__(self, sources: str, vid_stride: int = 1, buffer: bool = False):
        self.sources = [s.strip() for s in str(sources).split("|")]
        self.vid_stride = vid_stride
        self.buffer = buffer
        self.running = True
        self.mode = "stream"
        self.caps, self.frames, self.threads, self.locks = [], [], [], []
        for i, s in enumerate(self.sources):
            src = int(s) if s.isnumeric() else s
            cap = cv2.VideoCapture(src)
            if not cap.isOpened():
                raise ConnectionError(f"failed to open stream {s}")
            self.caps.append(cap)
            self.frames.append([])
            self.locks.append(threading.Lock())
            t = threading.Thread(target=self._reader, args=(i,), daemon=True)
            t.start()
            self.threads.append(t)

    def _reader(self, i: int):
        n = 0
        while self.running and self.caps[i].isOpened():
            ok = self.caps[i].grab()
            n += 1
            if not ok:
                break
            if n % self.vid_stride:
                continue
            ok, im = self.caps[i].retrieve()
            if not ok:
                continue
            with self.locks[i]:
                if self.buffer:
                    self.frames[i].append(im)
                else:
                    self.frames[i] = [im]
        self.running = False

    def __iter__(self):
        while self.running:
            imgs = []
            for i in range(len(self.sources)):
                t0 = time.time()
                while True:
                    with self.locks[i]:
                        if self.frames[i]:
                            imgs.append(self.frames[i].pop(0))
                            break
                    if not self.running or time.time() - t0 > 5:
                        return
                    time.sleep(1 / 100)
            yield self.sources, imgs, [""] * len(imgs)

    def close(self):
        self.running = False
        for cap in self.caps:
            cap.release()


def load_inference_source(source, batch: int = 1, vid_stride: int = 1):
    """Dispatch source type (parity: data/build.py:160-219 check_source)."""
    if isinstance(source, (str, Path)):
        s = str(source)
        if s.startswith("screen"):
            return LoadScreenshots(s)
        if s.isnumeric() or s.startswith(("rtsp://", "rtmp://", "http://", "https://", "tcp://")):
            return LoadStreams(s, vid_stride=vid_stride)
        return LoadImagesAndVideos(source, batch=batch, vid_stride=vid_stride)
    if isinstance(source, np.ndarray) and source.ndim == 4:
        return LoadTensor(source)
    if hasattr(source, "device") and hasattr(source, "ndim"):  # torch/jax tensor
        return LoadTensor(source)
    if isinstance(source, np.ndarray) or hasattr(source, "mode"):
        return LoadPilAndNumpy(source, batch=batch)
    if isinstance(source, (list, tuple)):
        if source and isinstance(source[0], (str, Path)):
            return LoadImagesAndVideos(list(source), batch=batch, vid_stride=vid_stride)
        return LoadPilAndNumpy(list(source), batch=batch)
    raise TypeError(f"unsupported source type {type(source)}")
