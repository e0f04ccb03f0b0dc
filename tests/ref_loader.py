"""Load the reference torch fork (read-only at /root/reference) for goldens.

The environment ships torch (CPU) but not torchvision; the reference
imports torchvision only for NMS and its version string, so a minimal
stub (plus fake dist-info metadata) lets the full package import.  The
v10 end2end inference path never calls torchvision.ops.nms.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REF = Path("/root/reference")
_STUB_DIR = Path("/tmp/_ref_stubs")


def _write_stubs():
    tv = _STUB_DIR / "torchvision"
    (tv / "ops").mkdir(parents=True, exist_ok=True)
    (tv / "__init__.py").write_text(
        "__version__ = '0.18.0'\nfrom . import ops\n"
    )
    (tv / "ops" / "__init__.py").write_text(
        "def nms(boxes, scores, iou_threshold):\n"
        "    import torch\n"
        "    # minimal greedy NMS for goldens (torchvision parity semantics)\n"
        "    order = scores.argsort(descending=True)\n"
        "    keep = []\n"
        "    while order.numel() > 0:\n"
        "        i = order[0].item()\n"
        "        keep.append(i)\n"
        "        if order.numel() == 1:\n"
        "            break\n"
        "        rest = order[1:]\n"
        "        b = boxes[i]\n"
        "        xx1 = torch.maximum(b[0], boxes[rest, 0])\n"
        "        yy1 = torch.maximum(b[1], boxes[rest, 1])\n"
        "        xx2 = torch.minimum(b[2], boxes[rest, 2])\n"
        "        yy2 = torch.minimum(b[3], boxes[rest, 3])\n"
        "        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)\n"
        "        a1 = (b[2] - b[0]) * (b[3] - b[1])\n"
        "        a2 = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])\n"
        "        iou = inter / (a1 + a2 - inter + 1e-7)\n"
        "        order = rest[iou <= iou_threshold]\n"
        "    return torch.tensor(keep, dtype=torch.long)\n"
    )
    di = _STUB_DIR / "torchvision-0.18.0.dist-info"
    di.mkdir(parents=True, exist_ok=True)
    (di / "METADATA").write_text("Metadata-Version: 2.1\nName: torchvision\nVersion: 0.18.0\n")
    (di / "RECORD").write_text("")

    # triton stub: the reference's mlstm_kernels imports triton at module
    # scope (decorators + tl.constexpr annotations) even on the CPU path.
    tr = _STUB_DIR / "triton"
    tr.mkdir(parents=True, exist_ok=True)
    (tr / "__init__.py").write_text(
        "__version__ = '3.0.0'\n"
        "from . import language\n"
        "def jit(fn=None, **kw):\n"
        "    if fn is None:\n"
        "        return lambda f: f\n"
        "    return fn\n"
        "def autotune(*a, **k):\n"
        "    return lambda f: f\n"
        "def heuristics(*a, **k):\n"
        "    return lambda f: f\n"
        "class Config:\n"
        "    def __init__(self, kwargs=None, **kw):\n"
        "        self.kwargs = dict(kwargs or {})\n"
        "        self.kwargs.update(kw)\n"
        "        self.num_warps = kw.get('num_warps', 4)\n"
        "        self.num_stages = kw.get('num_stages', 2)\n"
        "def cdiv(a, b):\n"
        "    return -(-a // b)\n"
        "def next_power_of_2(x):\n"
        "    n = 1\n"
        "    while n < x:\n"
        "        n *= 2\n"
        "    return n\n"
        "def __getattr__(name):\n"
        "    return _Stub(name)\n"
        "class _Stub:\n"
        "    def __init__(self, name):\n"
        "        self._name = name\n"
        "    def __call__(self, *a, **k):\n"
        "        return self\n"
        "    def __getattr__(self, a):\n"
        "        return _Stub(f'{self._name}.{a}')\n"
    )
    # inductor probes these on import when a 'triton' package is present
    (tr / "backends" / "").mkdir(exist_ok=True)
    (tr / "backends" / "__init__.py").write_text("from . import compiler\n")
    (tr / "backends" / "compiler.py").write_text(
        "class AttrsDescriptor:\n"
        "    def __init__(self, *a, **k):\n"
        "        pass\n"
        "class GPUTarget:\n"
        "    def __init__(self, *a, **k):\n"
        "        pass\n"
    )
    (tr / "compiler").mkdir(exist_ok=True)
    (tr / "compiler" / "__init__.py").write_text("from . import compiler\n")
    (tr / "compiler" / "compiler.py").write_text(
        "class CompiledKernel:\n"
        "    pass\n"
    )
    (tr / "language.py").write_text(
        "class _Ty:\n"
        "    def __init__(self, name):\n"
        "        self._name = name\n"
        "    def __call__(self, *a, **k):\n"
        "        return self\n"
        "    def __getattr__(self, a):\n"
        "        return _Ty(f'{self._name}.{a}')\n"
        "    def __repr__(self):\n"
        "        return f'tl.{self._name}'\n"
        "def __getattr__(name):\n"
        "    return _Ty(name)\n"
    )


def load_reference():
    """Make `import ultralytics` / `import mlstm_kernels` resolve to the ref."""
    _write_stubs()
    os.environ.setdefault("YOLO_OFFLINE", "1")
    os.environ.setdefault("ULTRALYTICS_OFFLINE", "1")
    # keep torch.compile/dynamo inert: the stub triton would otherwise be
    # probed by inductor at decoration time
    os.environ.setdefault("TORCHDYNAMO_DISABLE", "1")
    os.environ.setdefault("TORCH_COMPILE_DISABLE", "1")
    for p in (str(_STUB_DIR), str(REF)):
        if p not in sys.path:
            sys.path.insert(0, p)
