"""FastSAM model facade (parity: ref:ultralytics/models/fastsam/model.py:12-55).

FastSAM is a single-class (``object``) YOLO-seg graph; ``predict`` takes
optional box/point/label prompts that post-select from the
segment-everything output.
"""

from __future__ import annotations

from xlstm_yolo_tpu.engine.model import YOLO

from .predict import FastSAMPredictor


class FastSAM(YOLO):
    def __init__(self, model="vil-det-tiny-seg.yaml", verbose: bool = False):
        super().__init__(model, task="segment", verbose=verbose)
        self.names = {0: "object"}

    def predict(self, source=None, stream: bool = False, bboxes=None, points=None,
                labels=None, texts=None, **kwargs):
        """Segment everything, then select by prompts (ref:model.py:24-49)."""
        prompts = dict(bboxes=bboxes, points=points, labels=labels, texts=texts)
        from xlstm_yolo_tpu.cfg import get_cfg

        args = get_cfg(overrides={**self.overrides, **kwargs, "mode": "predict",
                                  "task": self.task})
        bundle = self._get_bundle(
            imgsz=int(args.imgsz),
            chunkwise_kernel=str(getattr(args, "chunkwise_kernel", "auto") or "auto"),
        )
        predictor = FastSAMPredictor(args, bundle, self.names)
        predictor.set_prompts(prompts)
        return predictor(source, stream=stream)

    @property
    def task_map(self):
        return {"segment": {"predictor": FastSAMPredictor}}
