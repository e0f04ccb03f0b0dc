"""Training orchestrator: epochs, warmup, EMA-val, checkpoint/resume.

Re-design of ref:ultralytics/engine/trainer.py:62-760 as a
single-controller JAX loop: no DDP subprocess relaunch, no GradScaler —
one jitted step program over the ('data','model') mesh, a host thread
pool feeding it, and orbax checkpoints of (params, batch_stats,
opt_state, EMA, step, epoch, fitness, rng).
"""

from __future__ import annotations

import csv
import os
import math
import queue
import threading
import time
from pathlib import Path
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from xlstm_yolo_tpu.cfg import get_cfg
from xlstm_yolo_tpu.data.build import build_dataloader, build_yolo_dataset
from xlstm_yolo_tpu.data.dataset import check_det_dataset
from xlstm_yolo_tpu.engine import optimizers as opt_lib
from xlstm_yolo_tpu.engine.steps import (
    FlatTrainState,
    HybridTrainState,
    TrainState,
    make_train_step,
)
from xlstm_yolo_tpu.engine.validator import DetectionValidator
from xlstm_yolo_tpu.nn.tasks import build_detection_model
from xlstm_yolo_tpu.parallel import mesh as mesh_lib
from xlstm_yolo_tpu.utils.callbacks import Callbacks, add_tensorboard
from xlstm_yolo_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


_SENTINEL = object()


def _prefetch(gen, depth: int = 2):
    """Run ``gen`` on a background thread, buffering ``depth`` items.

    Double-buffers host batch assembly + host->device transfer behind
    the (async-dispatched) train step; exceptions re-raise in the
    consumer."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    err: list[BaseException] = []

    def worker():
        try:
            for item in gen:
                q.put(item)
        except BaseException as e:  # re-raised on the main thread
            err.append(e)
        finally:
            q.put(_SENTINEL)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item


class EarlyStopping:
    """Parity: utils/torch_utils.py:733 — patience on fitness."""

    def __init__(self, patience: int = 100):
        self.best_fitness = 0.0
        self.best_epoch = 0
        self.patience = patience or float("inf")

    def __call__(self, epoch: int, fitness: float) -> bool:
        if fitness is None:
            return False
        if fitness >= self.best_fitness:
            self.best_epoch = epoch
            self.best_fitness = fitness
        return (epoch - self.best_epoch) >= self.patience


class DetectionTrainer:
    """Detect-task trainer (parity: BaseTrainer + detect/train.py)."""

    def __init__(self, cfg=None, overrides: dict | None = None, model_cfg=None):
        self.args = cfg if isinstance(cfg, SimpleNamespace) else get_cfg(cfg, overrides)
        self.model_cfg = model_cfg or self.args.model
        self.callbacks = Callbacks()
        # resolve save_dir ONCE: a second _get_save_dir() call would see the
        # dir the first caller created and auto-increment past it, splitting
        # tb events and weights across runs
        self.save_dir = self._get_save_dir()
        if getattr(self.args, "plots", True):
            add_tensorboard(self.callbacks, str(self.save_dir / "tb"))
        from xlstm_yolo_tpu.utils.callbacks.integrations import add_available_integrations

        add_available_integrations(self.callbacks)
        self.wdir = self.save_dir / "weights"
        self.csv_path = self.save_dir / "results.csv"
        self.best_fitness = 0.0
        self.start_epoch = 0
        self.metrics = {}

    def _get_save_dir(self) -> Path:
        project = self.args.project or "runs/detect"
        name = self.args.name or "train"
        d = Path(project) / name
        if d.exists() and not self.args.exist_ok and not self.args.resume:
            for i in range(2, 10000):
                d2 = Path(project) / f"{name}{i}"
                if not d2.exists():
                    d = d2
                    break
        return d

    # ------------------------------------------------------------------
    def train(self):
        args = self.args
        self.callbacks.run("on_pretrain_routine_start", self)
        task = str(getattr(args, "task", "detect") or "detect")
        if task == "classify":
            # folder dataset (root/{train,val}/<class>/*) — no det yaml
            from xlstm_yolo_tpu.data.dataset import ClassificationDataset

            root = Path(args.data)
            probe = ClassificationDataset(str(root / "train"), imgsz=int(args.imgsz))
            data = {"train": str(root / "train"), "val": str(root / "val"),
                    "nc": len(probe.names), "names": probe.names}
        else:
            data = check_det_dataset(args.data)
        nc = data["nc"]
        imgsz = int(args.imgsz)
        batch = int(args.batch)

        # XY_TP > 1 adds tensor parallelism on the 'model' axis (column/
        # row-parallel ViL projections, parallel/mesh.py) — the TPU-native
        # extension beyond the reference's DDP; default is pure DP.
        n_model = int(os.environ.get("XY_TP", "1") or 1)
        mesh = mesh_lib.make_mesh(n_model=n_model)
        n_data = mesh.shape[mesh_lib.DATA_AXIS]
        if batch % n_data:
            batch = max(n_data, batch - batch % n_data)

        # --- model (train + eval twins share params) ---
        compute_dtype = jnp.bfloat16 if args.amp else None
        ck = str(getattr(args, "chunkwise_kernel", "auto") or "auto")
        kpt = tuple(data["kpt_shape"]) if (task == "pose" and data.get("kpt_shape")) else None
        model_t, mcfg = build_detection_model(
            self.model_cfg, nc=nc, training=True, compute_dtype=compute_dtype,
            chunkwise_kernel=ck, kpt_shape=kpt,
        )
        model_e, _ = build_detection_model(
            self.model_cfg, nc=nc, training=False, compute_dtype=compute_dtype,
            chunkwise_kernel=ck, kpt_shape=kpt,
        )
        rng = jax.random.PRNGKey(int(args.seed))
        init_img = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
        variables = jax.jit(model_t.init)({"params": rng, "droppath": rng}, init_img)

        if args.pretrained and isinstance(args.pretrained, str):
            variables = self._load_pretrained(variables, args.pretrained)

        # --- data ---
        # device-side HSV + fliplr (opt-in, detect only): move the two
        # per-pixel host transforms onto the chip — the host pipeline
        # runs with them zeroed and the train step applies them fused
        # into its normalize pass (data/device_augment.py).
        device_aug = None
        if (os.environ.get("XY_DEVICE_AUG") == "1"
                or getattr(args, "device_aug", False)) and task == "detect":
            device_aug = {
                "hsv_h": float(getattr(args, "hsv_h", 0.0) or 0.0),
                "hsv_s": float(getattr(args, "hsv_s", 0.0) or 0.0),
                "hsv_v": float(getattr(args, "hsv_v", 0.0) or 0.0),
                "fliplr": float(getattr(args, "fliplr", 0.0) or 0.0),
            }
            args.hsv_h = args.hsv_s = args.hsv_v = 0.0
            args.fliplr = 0.0
            print(f"device-side augmentation: {device_aug}")
        if task == "classify":
            from xlstm_yolo_tpu.data.dataset import ClassificationDataset

            trainset = ClassificationDataset(
                data["train"], imgsz=imgsz, augment=True, hyp=args,
                fraction=float(getattr(args, "fraction", 1.0) or 1.0),
            )
        else:
            trainset = build_yolo_dataset(args, data["train"], batch, data, mode="train")
        loader = build_dataloader(
            trainset, batch, workers=int(args.workers), shuffle=True,
            seed=int(args.seed),
            rank=jax.process_index(), world_size=jax.process_count(),
        )
        nb = max(len(loader), 1)  # batches per epoch
        epochs = int(args.epochs)

        # --- optimizer (nbs accumulation + lr scaling, trainer.py:298-320) ---
        nbs = int(args.nbs)
        accumulate = min(max(round(nbs / batch), 1), nb)  # cap by batches/epoch
        weight_decay = float(args.weight_decay) * batch * accumulate / nbs
        steps_per_epoch = max(nb // accumulate, 1)
        iterations = steps_per_epoch * epochs
        # reference floor is 100 LOADER batches (ref:trainer.py:369 nw);
        # our warmup counter ticks once per OPTIMIZER step, so the floor
        # divides by `accumulate` — otherwise a small dataset with heavy
        # accumulation (e.g. 72 imgs, batch 8, nbs 64 -> 1 step/epoch)
        # never exits warmup and trains at ~0 lr for the whole run
        # (found by the classification convergence artifact, round 4).
        warmup_steps = max(round(float(args.warmup_epochs) * steps_per_epoch),
                           max(1, round(100 / accumulate)))
        sched_fn = opt_lib.cosine_lr if args.cos_lr else opt_lib.linear_lr
        # base schedule WITHOUT warmup — build_optimizer applies the
        # reference warmup semantics (bias group from warmup_bias_lr,
        # others from 0, momentum from warmup_momentum; trainer.py:369-378)
        schedule = sched_fn(
            float(args.lr0), float(args.lrf), epochs, steps_per_epoch,
        )
        opt_kw = dict(
            name=args.optimizer, lr=float(args.lr0),
            momentum=float(args.momentum), weight_decay=weight_decay,
            schedule=schedule, iterations=iterations, nc=nc,
            warmup_steps=warmup_steps,
            warmup_momentum=float(getattr(args, "warmup_momentum", 0.8)),
            warmup_bias_lr=float(getattr(args, "warmup_bias_lr", 0.1)),
        )
        # flat-buffer optimizer+EMA (one fused vector program instead of
        # ~8 small fusions per param leaf); under TP the hybrid keeps the
        # 'model'-sharded leaves as per-leaf buffers and ravels the rest.
        # XY_FLAT_OPT=0 forces the per-leaf tree path.
        flat_req = os.environ.get("XY_FLAT_OPT", "1") != "0"
        flat_ok = flat_req and n_model == 1
        hybrid_ok = flat_req and n_model > 1
        shard_mask = None
        if flat_ok:
            try:
                tx, lr0, opt_name = opt_lib.build_flat_optimizer(
                    variables["params"], **opt_kw)
            except NotImplementedError:
                flat_ok = False
        elif hybrid_ok:
            shard_mask = mesh_lib.sharded_mask(variables["params"], n_model)
            try:
                tx, lr0, opt_name = opt_lib.build_hybrid_optimizer(
                    variables["params"], shard_mask, **opt_kw)
            except NotImplementedError:
                hybrid_ok = False
        if not (flat_ok or hybrid_ok):
            tx, lr0, opt_name = opt_lib.build_optimizer(
                variables["params"], **opt_kw)
        if flat_ok:
            state = FlatTrainState.create(variables, tx)
        elif hybrid_ok:
            state = HybridTrainState.create(variables, tx, shard_mask)
        else:
            state = TrainState.create(variables, tx)
        if n_model > 1:
            # place the 'model'-sharded leaves (flat/replicated parts get
            # the default replication; XLA propagates to grads/opt-state)
            param_sh = mesh_lib.make_param_shardings(mesh, variables["params"])
            if hybrid_ok:
                sh_tuple = tuple(
                    s for s, m in zip(jax.tree.leaves(param_sh),
                                      jax.tree.leaves(shard_mask)) if m)
                state = state.replace(
                    sharded_params=jax.device_put(state.sharded_params, sh_tuple),
                    ema_sharded=jax.device_put(state.ema_sharded, sh_tuple),
                )
            elif isinstance(state, TrainState):
                state = state.replace(
                    params=jax.device_put(state.params, param_sh),
                    ema=state.ema._replace(
                        params=jax.device_put(state.ema.params, param_sh)),
                )
        if args.resume:
            try:
                state, self.start_epoch, self.best_fitness = load_checkpoint(
                    self.wdir / "last", state
                )
            except Exception:
                if not (flat_ok or hybrid_ok):
                    raise
                # pre-flat checkpoint: opt_state is the tree-optimizer
                # layout — resume on the tree path instead
                print("resume: checkpoint has a tree opt_state; "
                      "falling back to the per-leaf optimizer")
                flat_ok = hybrid_ok = False
                tx, lr0, opt_name = opt_lib.build_optimizer(
                    variables["params"], **opt_kw)
                state = TrainState.create(variables, tx)
                state, self.start_epoch, self.best_fitness = load_checkpoint(
                    self.wdir / "last", state
                )

        # grad accumulation: collect `accumulate` loader batches and scan
        # over them as microbatches inside one optimizer step (the nbs
        # semantics of trainer.py:304,372)
        kpt_for_step = (tuple(data.get("kpt_shape") or (17, 3))
                        if task == "pose" else None)
        train_step = make_train_step(model_t, tx, nc=nc, accumulate=accumulate,
                                     task=task, kpt_shape=kpt_for_step,
                                     device_aug=device_aug)
        # buffer donation would halve peak HBM, but both available
        # runtimes currently reject it: the XLA CPU backend deadlocks its
        # collective rendezvous with donated multi-device buffers, and
        # the remote TPU runtime raises INVALID_ARGUMENT on the donated
        # step (docs/KNOWN_ISSUES.md) — so no donation for now.
        step_jit = jax.jit(train_step)
        # multi-scale: a static bucket set {0.8, 1.0, 1.2} x imgsz (stride-
        # 32 aligned) pre-compiles one step per bucket — the TPU-first
        # form of ref:models/yolo/detect/train.py:60's free per-batch
        # resize (3 compiles instead of one per size; batch resize +
        # geometry scaling happen on device inside the step)
        ms_steps: dict[int, object] = {}
        if getattr(args, "multi_scale", False) and task != "classify":
            buckets = sorted({max(32, round(imgsz * s / 32) * 32)
                              for s in (0.8, 1.0, 1.2)})
            ms_steps = {
                b: (step_jit if b == imgsz else jax.jit(make_train_step(
                    model_t, tx, nc=nc, accumulate=accumulate, task=task,
                    kpt_shape=kpt_for_step, imgsz_out=b,
                    device_aug=device_aug)))
                for b in buckets
            }
            print(f"multi-scale buckets: {buckets}")

        if task == "classify":
            from xlstm_yolo_tpu.models.yolo.classify.val import ClassificationValidator

            validator = ClassificationValidator(args, data=args.data, save_dir=self.save_dir)
        elif task == "obb":
            from xlstm_yolo_tpu.models.yolo.obb.val import OBBValidator

            validator = OBBValidator(args, data=data, save_dir=self.save_dir)
        elif task == "segment":
            from xlstm_yolo_tpu.models.yolo.segment.val import SegmentationValidator

            validator = SegmentationValidator(args, data=data, save_dir=self.save_dir)
        elif task == "pose":
            from xlstm_yolo_tpu.models.yolo.pose.val import PoseValidator

            validator = PoseValidator(args, data=data, save_dir=self.save_dir)
        else:
            validator = DetectionValidator(args, data=data, save_dir=self.save_dir)
        stopper = EarlyStopping(int(args.patience))
        self.wdir.mkdir(parents=True, exist_ok=True)
        (self.save_dir / "args.yaml").write_text(
            "\n".join(f"{k}: {v}" for k, v in vars(args).items())
        )

        if getattr(args, "plots", True) and task != "classify":
            # labeled train-sample mosaic with mask/kpt overlays
            # (parity: ref:engine/trainer.py plot_training_samples)
            try:
                import random as _r

                from xlstm_yolo_tpu.utils.plotting import plot_images

                rr = _r.Random(0)
                samples = [trainset.get_sample(i % len(trainset), rr)
                           for i in range(min(9, max(batch, 4)))]
                b0 = trainset.collate(samples)
                self.save_dir.mkdir(parents=True, exist_ok=True)
                plot_images(b0["img"], b0["cls"], b0["bboxes"], b0["mask"],
                            names=data.get("names"),
                            fname=self.save_dir / "train_batch0.jpg",
                            masks=b0.get("masks"), kpts=b0.get("kpts"))
                # label-distribution panel (parity: ref plot_labels at
                # train start)
                from xlstm_yolo_tpu.utils.plotting import plot_labels

                all_cls = np.concatenate(
                    [np.asarray(lb["cls"]).ravel() for lb in trainset.labels]
                ) if getattr(trainset, "labels", None) else np.zeros(0)
                all_boxes = np.concatenate(
                    [np.asarray(lb["bboxes"]).reshape(-1, 4)
                     for lb in trainset.labels]
                ) if getattr(trainset, "labels", None) else np.zeros((0, 4))
                plot_labels(all_cls, all_boxes, data.get("names") or {},
                            self.save_dir / "labels.png")
            except Exception as e:
                print(f"train-sample plot failed: {e}")

        print(
            f"train: {len(trainset)} imgs, batch {batch} x{n_data} devices, "
            f"{epochs} epochs, opt {opt_name}, accumulate {accumulate}"
        )
        self.callbacks.run("on_train_start", self)
        t_start = time.time()
        step_rng = jax.random.PRNGKey(int(args.seed) + 1)

        for epoch in range(self.start_epoch, epochs):
            self.epoch = epoch
            self.callbacks.run("on_train_epoch_start", self)
            if epoch == epochs - int(args.close_mosaic):
                tf = getattr(trainset, "transforms", None)
                tf and setattr(tf, "mosaic_enabled", False)

            losses = []
            t_ep = time.time()

            def epoch_batches(ep=epoch):
                """Assemble optimizer-step batches: uint8 images (the step
                normalizes on-device — 1/4 the host->device bytes), one
                sharded device_put per leaf."""
                keys = (("img", "cls") if task == "classify"
                        else ("img", "cls", "bboxes", "mask"))
                micro = []
                for host_batch in loader._iter_epoch(ep):
                    micro.append(host_batch)
                    if len(micro) < accumulate:
                        continue
                    mkeys = keys + tuple(
                        k for k in ("masks", "kpts", "rboxes") if k in micro[0]
                    )
                    if accumulate == 1:
                        hostb = {k: micro[0][k] for k in mkeys}
                        axis = 0
                    else:
                        hostb = {k: np.stack([b[k] for b in micro]) for k in mkeys}
                        axis = 1
                    micro = []
                    yield mesh_lib.shard_host_batch(hostb, mesh, axis=axis)

            # double-buffered host->device prefetch: the next batch is
            # assembled + transferred on a background thread while the
            # current step runs (the reference overlaps via DataLoader
            # workers + pin_memory, ref:data/build.py:139)
            import random as _pyrandom

            ms_rng = _pyrandom.Random(int(args.seed) * 1000 + epoch)
            ms_keys = list(ms_steps)
            for bi, dev_batch in enumerate(_prefetch(epoch_batches())):
                step_rng, sub = jax.random.split(step_rng)
                step_fn = (ms_steps[ms_rng.choice(ms_keys)]
                           if ms_keys else step_jit)
                state, metrics = step_fn(state, dev_batch, sub)
                losses.append(metrics)
                self.callbacks.run("on_train_batch_end", self)

            mloss = {k: float(np.mean([float(m[k]) for m in losses])) for k in losses[0]} if losses else {}
            dt = time.time() - t_ep
            print(
                f"epoch {epoch + 1}/{epochs}: loss={mloss.get('loss', float('nan')):.3f} "
                f"box={mloss.get('box_loss', 0):.3f} cls={mloss.get('cls_loss', 0):.3f} "
                f"dfl={mloss.get('dfl_loss', 0):.3f} ({dt:.1f}s, "
                f"{len(losses) * batch / max(dt, 1e-9):.1f} img/s)"
            )

            # --- validation with EMA params (trainer.py:437-460) ---
            fitness = None
            if args.val:
                ema_bundle = {
                    "model": model_e,
                    "variables": {
                        "params": state.ema.params,
                        "batch_stats": state.batch_stats,
                    },
                }
                res = validator(ema_bundle, batch_size=batch, verbose=True)
                fitness = res.get("fitness", 0.0)
                self.metrics = res
            self._log_csv(epoch, mloss, self.metrics)

            # --- checkpoints ---
            if args.save:
                is_best = fitness is not None and fitness >= self.best_fitness
                if is_best:
                    self.best_fitness = fitness
                save_checkpoint(self.wdir / "last", state, epoch, self.best_fitness, vars(args))
                if is_best:
                    save_checkpoint(self.wdir / "best", state, epoch, self.best_fitness, vars(args))
            self.callbacks.run("on_fit_epoch_end", self)

            if fitness is not None and stopper(epoch, fitness):
                print(f"early stopping at epoch {epoch + 1} (patience {args.patience})")
                break
            if args.time and (time.time() - t_start) / 3600 > float(args.time):
                print("time budget reached")
                break

        # final eval on best weights + deploy-stripped checkpoints
        # (parity: ref:engine/trainer.py:684 final_eval +
        # utils/torch_utils.py:553 strip_optimizer)
        if args.save and args.val and (self.wdir / "best").exists():
            from xlstm_yolo_tpu.utils.checkpoint import strip_optimizer

            best_state, _, _ = load_checkpoint(self.wdir / "best", state)
            bundle = {
                "model": model_e,
                "variables": {"params": best_state.ema.params,
                              "batch_stats": best_state.batch_stats},
            }
            print("validating best weights:")
            self.metrics = validator(bundle, batch_size=batch, verbose=True)
            for p in ("last", "best"):
                if (self.wdir / p).exists():
                    strip_optimizer(self.wdir / p)

        if getattr(args, "plots", True) and self.csv_path.exists():
            # training curves (parity: ref plot_metrics/plot_results)
            try:
                from xlstm_yolo_tpu.utils.plotting import plot_results

                plot_results(self.csv_path)
            except Exception as e:
                print(f"results plot failed: {e}")

        self.callbacks.run("on_train_end", self)
        self.state = state
        return self.metrics

    # ------------------------------------------------------------------
    def _load_pretrained(self, variables, path: str):
        p = Path(path)
        if p.suffix == ".pt":
            import torch

            from xlstm_yolo_tpu.utils.torch_convert import convert_torch_state_dict

            ckpt = torch.load(p, map_location="cpu", weights_only=False)
            model = ckpt.get("ema") or ckpt.get("model")
            sd = model.state_dict() if hasattr(model, "state_dict") else model
            return convert_torch_state_dict(variables, sd, strict=False)
        state = TrainState.create(variables, opt_lib.build_optimizer(variables["params"])[0])
        state, *_ = load_checkpoint(p, state)
        return {"params": state.params, "batch_stats": state.batch_stats}

    def _log_csv(self, epoch: int, mloss: dict, metrics: dict):
        """Append an epoch row; the header is pinned by the first row so
        columns stay aligned when metrics appear/disappear mid-run
        (e.g. val skipped on an epoch)."""
        self.save_dir.mkdir(parents=True, exist_ok=True)
        row = {"epoch": epoch, **mloss, **(metrics or {})}
        if self.csv_path.exists():
            with open(self.csv_path, newline="") as fh:
                fields = next(csv.reader(fh), None) or list(row.keys())
        else:
            fields = list(row.keys())
            with open(self.csv_path, "w", newline="") as fh:
                csv.DictWriter(fh, fieldnames=fields).writeheader()
        with open(self.csv_path, "a", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=fields, extrasaction="ignore")
            w.writerow({k: row.get(k, "") for k in fields})
