"""Prefetching data loader: host worker threads double-buffering batches.

Replaces the reference's torch DataLoader/InfiniteDataLoader
(ref:ultralytics/data/build.py:28-158): cv2 decode + augment release the
GIL, so a thread pool saturates the host while the TPU consumes the
previous batch from a bounded queue (the 'double buffering' in the
north-star).  Multi-host: pass rank/world_size to shard the index space
like DistributedSampler.
"""

from __future__ import annotations

import queue
import random
import threading

import numpy as np

from xlstm_yolo_tpu.data.dataset import YOLODataset


class DataLoader:
    """Iterates epochs of shuffled, padded, collated numpy batches."""

    def __init__(
        self,
        dataset: YOLODataset,
        batch_size: int = 16,
        shuffle: bool = True,
        workers: int = 8,
        seed: int = 0,
        drop_last: bool = True,
        rank: int = 0,
        world_size: int = 1,
        prefetch: int = 4,
        infinite: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.workers = max(1, workers)
        self.seed = seed
        self.drop_last = drop_last
        self.rank = rank
        self.world_size = world_size
        self.prefetch = prefetch
        self.infinite = infinite
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.world_size
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_indices(self, epoch: int) -> list[int]:
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + epoch).shuffle(idx)
        # contiguous shard per process (DistributedSampler semantics)
        idx = idx[self.rank :: self.world_size]
        if self.drop_last:
            idx = idx[: len(idx) - len(idx) % self.batch_size]
        return idx

    def __iter__(self):
        epoch = self.epoch
        while True:
            yield from self._iter_epoch(epoch)
            if not self.infinite:
                return
            epoch += 1

    def _iter_epoch(self, epoch: int):
        indices = self._epoch_indices(epoch)
        nb = len(indices) // self.batch_size if self.drop_last else -(-len(indices) // self.batch_size)
        batches = [
            indices[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)
        ]
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        task_q: queue.Queue = queue.Queue()
        results: dict[int, dict] = {}
        lock = threading.Lock()
        stop = threading.Event()

        for bi, b in enumerate(batches):
            task_q.put((bi, b))

        def worker(wid: int):
            rng = random.Random((self.seed + epoch) * 9973 + wid)
            while not stop.is_set():
                try:
                    bi, idxs = task_q.get_nowait()
                except queue.Empty:
                    return
                samples = [self.dataset.get_sample(i, rng) for i in idxs]
                with lock:
                    results[bi] = self.dataset.collate(samples)

        threads = [
            threading.Thread(target=worker, args=(w,), daemon=True)
            for w in range(self.workers)
        ]
        for t in threads:
            t.start()

        try:
            nxt = 0
            import time

            while nxt < nb:
                with lock:
                    ready = nxt in results
                if ready:
                    with lock:
                        batch = results.pop(nxt)
                    nxt += 1
                    yield batch
                else:
                    time.sleep(0.002)
        finally:
            stop.set()


def build_yolo_dataset(cfg, img_path: str, batch: int, data_info: dict, mode: str = "train"):
    """Parity: data/build.py:96-137 — dataset construction from cfg."""
    task = str(getattr(cfg, "task", "detect") or "detect")
    return YOLODataset(
        img_path=img_path,
        imgsz=int(cfg.imgsz),
        task=task,
        # all det-family tasks augment: segments/keypoints/rboxes ride the
        # instance-aware mosaic/affine/flip pipeline (data/augment.py)
        augment=(mode == "train"),
        hyp=cfg if mode == "train" else None,
        max_targets=int(getattr(cfg, "max_targets", 128) or 128),
        single_cls=bool(getattr(cfg, "single_cls", False)),
        cache=bool(getattr(cfg, "cache", False)),
        names=data_info.get("names", {}),
        fraction=float(getattr(cfg, "fraction", 1.0) or 1.0) if mode == "train" else 1.0,
        kpt_shape=data_info.get("kpt_shape"),
        flip_idx=data_info.get("flip_idx"),
    )


def build_dataloader(dataset, batch: int, workers: int, shuffle: bool = True,
                     rank: int = 0, world_size: int = 1, seed: int = 0,
                     drop_last: bool = True, infinite: bool = False) -> DataLoader:
    return DataLoader(
        dataset, batch_size=batch, shuffle=shuffle, workers=workers, seed=seed,
        drop_last=drop_last, rank=rank, world_size=world_size, infinite=infinite,
    )
