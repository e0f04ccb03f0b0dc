#!/usr/bin/env python
"""Convert reference torch .pt checkpoints into orbax params for this framework.

Usage: python scripts/convert_weights.py weights.pt 640-base192.yaml out_dir/
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(pt_path: str, model_yaml: str, out_dir: str):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp
    import torch

    from xlstm_yolo_tpu.nn.tasks import build_detection_model
    from xlstm_yolo_tpu.utils.torch_convert import convert_torch_state_dict

    model, d = build_detection_model(model_yaml)
    imgsz = int(d.get("imgsz", 640))
    img = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), img)

    ckpt = torch.load(pt_path, map_location="cpu", weights_only=False)
    tm = ckpt.get("ema") or ckpt.get("model") or ckpt
    sd = tm.state_dict() if hasattr(tm, "state_dict") else tm
    variables = convert_torch_state_dict(variables, dict(sd), strict=False)
    variables = jax.tree.map(np.asarray, variables)

    out = Path(out_dir).resolve()
    if out.exists():
        import shutil

        shutil.rmtree(out)
    ocp.PyTreeCheckpointer().save(str(out), {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    })
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    print(f"converted {n:,} params -> {out}")


if __name__ == "__main__":
    main(*sys.argv[1:4])
