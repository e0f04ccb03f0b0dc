"""auto_annotate: detector boxes -> SAM polygons -> YOLO-segment labels.

Parity target: ref:ultralytics/data/annotator.py:8-70 (flow + output
format). The detector is stubbed with fixed boxes so the test exercises
the annotator's SAM prompting + polygon serialization deterministically.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def jaxm():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    return jax, jnp


class _StubDet:
    """Duck-typed YOLO facade: fixed boxes for every image in the folder."""

    def __init__(self, boxes):
        self._boxes = boxes  # (N, 6) xyxy conf cls

    def predict(self, source, stream=False, **kw):
        import cv2

        from xlstm_yolo_tpu.engine.results import Results

        def gen():
            from pathlib import Path

            for p in sorted(Path(source).glob("*.png")):
                im = cv2.imread(str(p))
                yield Results(im, str(p), {0: "a", 1: "b"}).update(self._boxes)

        return gen() if stream else list(gen())


@pytest.fixture(scope="module")
def tiny_sam(jaxm):
    jax, jnp = jaxm
    from xlstm_yolo_tpu.models.sam.modules import SAMModel
    from xlstm_yolo_tpu.models.sam.predict import SAMPredictor

    m = SAMModel(img_size=64, embed_dim=32, depth=2, num_heads=2,
                 global_attn_indexes=(1,), prompt_embed_dim=32)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    pts = (jnp.zeros((1, 8, 2)), -jnp.ones((1, 8), jnp.int32))
    v = m.init(jax.random.PRNGKey(0), img, points=pts)
    return SAMPredictor(m, v, max_points=8)


def test_auto_annotate_writes_polygon_labels(tmp_path, tiny_sam):
    import cv2

    from xlstm_yolo_tpu.data.annotator import auto_annotate

    src = tmp_path / "imgs"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        im = rng.uniform(0, 255, (48, 60, 3)).astype(np.uint8)
        cv2.rectangle(im, (10, 10), (40, 35), (255, 255, 255), -1)
        cv2.imwrite(str(src / f"im{i}.png"), im)

    boxes = np.array([[8.0, 8.0, 42.0, 38.0, 0.9, 0.0],
                      [2.0, 2.0, 20.0, 20.0, 0.8, 1.0]], np.float32)
    out = auto_annotate(src, det_model=_StubDet(boxes), sam_model=tiny_sam)

    assert out == src.parent / "imgs_auto_annotate_labels"
    txts = sorted(out.glob("*.txt"))
    assert len(txts) == 2
    for t in txts:
        lines = t.read_text().strip().splitlines()
        assert len(lines) >= 1
        for ln in lines:
            parts = ln.split()
            assert int(parts[0]) in (0, 1)
            coords = np.array(parts[1:], np.float64)
            assert len(coords) >= 6 and len(coords) % 2 == 0
            assert (coords >= 0).all() and (coords <= 1).all()


def test_auto_annotate_skips_empty_detections(tmp_path, tiny_sam):
    import cv2

    from xlstm_yolo_tpu.data.annotator import auto_annotate

    src = tmp_path / "imgs"
    src.mkdir()
    cv2.imwrite(str(src / "im0.png"),
                np.zeros((48, 60, 3), np.uint8))
    out = auto_annotate(src, det_model=_StubDet(np.zeros((0, 6), np.float32)),
                        sam_model=tiny_sam, output_dir=tmp_path / "lbl")
    assert out.exists() and not list(out.glob("*.txt"))
