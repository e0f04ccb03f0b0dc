"""Auto-annotation: detector boxes -> SAM box prompts -> polygon labels.

Re-design of ref:ultralytics/data/annotator.py:8-70. A YOLO detection
model proposes boxes over a folder of images; SAM turns each box into an
instance mask (encode-once / decode-per-box, so the heavy image encoder
runs once per image); the best mask's contour is written as a normalized
YOLO-segment label line (``class x1 y1 x2 y2 ...``), one ``.txt`` per
image, ready to train a segmentation model on.

The reference resolves ``det_model``/``sam_model`` from released weight
names; this environment has no weight downloads, so both accept either a
ready object (a ``YOLO`` facade / ``SAMPredictor``) or a spec to build
one (a model yaml / ``(variant, checkpoint)``).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

__all__ = ["auto_annotate"]


def _resolve_det(det_model):
    if hasattr(det_model, "predict"):
        return det_model
    from xlstm_yolo_tpu.engine.model import YOLO

    return YOLO(det_model)


def _resolve_sam(sam_model, sam_checkpoint):
    if hasattr(sam_model, "set_image"):
        return sam_model
    from xlstm_yolo_tpu.models.sam.predict import SAMPredictor, build_sam

    model, params = build_sam(sam_model or "vit_b", checkpoint=sam_checkpoint)
    if params is None:
        raise ValueError(
            "auto_annotate needs SAM weights: pass sam_checkpoint= (a torch "
            "SAM .pt/.pth) or a ready SAMPredictor as sam_model"
        )
    return SAMPredictor(model, params)


def auto_annotate(
    data,
    det_model="vil-det-192.yaml",
    sam_model="vit_b",
    *,
    sam_checkpoint=None,
    conf: float = 0.25,
    iou: float = 0.45,
    imgsz: int = 640,
    max_det: int = 300,
    classes=None,
    output_dir=None,
):
    """Annotate a folder of images with YOLO boxes refined to SAM polygons.

    Parity: ref:ultralytics/data/annotator.py:8 — same flow (detect ->
    box-prompt SAM -> normalized polygon .txt per image, skipping images
    with no detections / degenerate contours), same defaults.

    Returns the output directory path.
    """
    det = _resolve_det(det_model)
    sam = _resolve_sam(sam_model, sam_checkpoint)

    data = Path(data)
    if not output_dir:
        output_dir = data.parent / f"{data.stem}_auto_annotate_labels"
    output_dir = Path(output_dir)
    output_dir.mkdir(exist_ok=True, parents=True)

    results = det.predict(
        data, stream=True, conf=conf, iou=iou, imgsz=imgsz,
        max_det=max_det, classes=classes,
    )

    from xlstm_yolo_tpu.engine.results import Masks

    for result in results:
        if result.boxes is None or len(result.boxes) == 0:
            continue
        class_ids = result.boxes.cls.astype(int).tolist()
        boxes = np.asarray(result.boxes.xyxy, np.float32)
        h0, w0 = result.orig_img.shape[:2]

        sam.set_image(result.orig_img)
        masks = []
        for box in boxes:
            mk, mk_iou = sam.predict(box=box)
            masks.append(mk[int(np.argmax(mk_iou))])
        segments = Masks(np.stack(masks), (h0, w0)).xyn

        lines = []
        for cid, seg in zip(class_ids, segments):
            if len(seg) < 3:  # degenerate contour -> no polygon
                continue
            coords = " ".join(str(float(v)) for v in seg.reshape(-1))
            lines.append(f"{cid} {coords}")
        if lines:
            (output_dir / f"{Path(result.path).stem}.txt").write_text(
                "\n".join(lines) + "\n"
            )
    return output_dir
