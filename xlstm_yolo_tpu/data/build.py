"""Prefetching data loader: host worker threads double-buffering batches.

Replaces the reference's torch DataLoader/InfiniteDataLoader
(ref:ultralytics/data/build.py:28-158): cv2 decode + augment release the
GIL, so a thread pool saturates the host while the TPU consumes the
previous batch from a bounded queue (the 'double buffering' in the
north-star).  Multi-host: pass rank/world_size to shard the index space
like DistributedSampler.

``use_processes=True`` switches to a persistent fork-based process pool
(the reference's num_workers subprocess model): the GIL-holding parts of
the pipeline — label geometry, np.stack collation, mosaic pastes — are
~1/3 of per-sample time (scripts/exp_host_pipeline.py profile), so a
thread pool tops out near 3x regardless of cores; processes sidestep it
entirely. Workers are forked lazily on first use and never touch JAX
(fork-safe for the same reason torch DataLoader workers must not touch
CUDA); batches return through a pickling queue.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import queue
import random
import threading

import numpy as np

from xlstm_yolo_tpu.data.dataset import YOLODataset


def _proc_worker(dataset, seed: int, task_q, out_q):
    """Forked worker loop: (epoch, bi, idxs) -> (bi, collated batch)."""
    while True:
        item = task_q.get()
        if item is None:
            return
        epoch, bi, idxs = item
        rng = random.Random((seed + epoch) * 9973 + bi)
        samples = [dataset.get_sample(i, rng) for i in idxs]
        out_q.put((epoch, bi, dataset.collate(samples)))


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
        use_processes: bool | None = None,
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
        if use_processes is None:
            use_processes = os.environ.get("XY_DATA_PROCS", "0") == "1"
        self.use_processes = bool(use_processes)
        self._procs: list = []
        self._task_q = self._out_q = None

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

    # ---- process-pool mode ------------------------------------------
    def _ensure_pool(self):
        if self._procs:
            return
        ctx = mp.get_context("fork")  # children inherit the dataset; they
        # must never touch JAX (same rule as torch workers vs CUDA)
        self._task_q = ctx.Queue()
        self._out_q = ctx.Queue()
        self._procs = [
            ctx.Process(target=_proc_worker,
                        args=(self.dataset, self.seed, self._task_q, self._out_q),
                        daemon=True)
            for _ in range(self.workers)
        ]
        for p in self._procs:
            p.start()

    def close(self):
        for _ in self._procs:
            self._task_q.put(None)
        for p in self._procs:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()
        self._procs = []

    def _iter_epoch_procs(self, epoch: int, batches):
        self._ensure_pool()
        nb = len(batches)
        for bi, b in enumerate(batches):
            self._task_q.put((epoch, bi, b))
        results: dict[int, dict] = {}
        nxt = 0
        while nxt < nb:
            if nxt in results:
                yield results.pop(nxt)
                nxt += 1
                continue
            ep, bi, batch = self._out_q.get()
            if ep == epoch:  # drop leftovers from an abandoned epoch
                results[bi] = batch

    def _iter_epoch(self, epoch: int):
        indices = self._epoch_indices(epoch)
        nb = len(indices) // self.batch_size if self.drop_last else -(-len(indices) // self.batch_size)
        batches = [
            indices[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)
        ]
        if self.use_processes:
            yield from self._iter_epoch_procs(epoch, batches)
            return
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        task_q: queue.Queue = queue.Queue()
        results: dict[int, dict] = {}
        lock = threading.Lock()
        stop = threading.Event()

        for bi, b in enumerate(batches):
            task_q.put((bi, b))

        def worker(wid: int):
            while not stop.is_set():
                try:
                    bi, idxs = task_q.get_nowait()
                except queue.Empty:
                    return
                # per-BATCH rng (not per-worker): batch contents don't
                # depend on which worker raced to the task, and the
                # process mode reproduces them exactly
                rng = random.Random((self.seed + epoch) * 9973 + bi)
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
        # pass through as-is: False | True ('ram') | 'ram' | 'disk'
        # (bool() would collapse cache='disk' into the RAM mode)
        cache=getattr(cfg, "cache", False),
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
