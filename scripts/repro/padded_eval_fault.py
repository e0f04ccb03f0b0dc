"""Repro: XLA-scan model with the padded-chunkwise eval path, batch 8.

The model's cells normally use the segment-split inference wrapper at
eval (known-good); forcing mode='train_with_padding' with divisor
chunking (L=400/200/50) produces the faulting program shape.  XLA memory
analysis reports only ~1 GB temp at batch 8, so this is not OOM.
"""

from _common import run_predict

if __name__ == "__main__":
    import xlstm_yolo_tpu.nn.layers as L

    # force every cell onto the padded path (ViLLayer resolves
    # mode = self.mode or ('train_with_padding' if training else 'inference'))
    orig_call = L.MatrixLSTMCell.__call__

    def forced(self, *a, **kw):
        object.__setattr__(self, "mode", "train_with_padding")
        return orig_call(self, *a, **kw)

    L.MatrixLSTMCell.__call__ = forced
    run_predict("chunkwise--native_autograd", batch=8)
