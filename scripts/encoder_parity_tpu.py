"""SAM encoder output parity across kernel configurations, on device.

Runs the ViT-L encoder on the same random weights/pixels with (a) the
plain XLA path, (b) flash kernels + fused LN/qkv/MLP blocks, and prints
max|delta| / corr between the two -- the on-hardware counterpart of the
interpret-mode kernel tests.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from flmm_tpu.configs.deepseek_vl import sam_vit_l
from flmm_tpu.models.sam import image_encoder


def main(bs: int = 2):
    base = sam_vit_l().encoder
    params = image_encoder.init_params(base, jax.random.key(0))
    # give the zero-init rel-pos tables real values so the bias paths count
    for i, bp in enumerate(params["blocks"]):
        k = jax.random.fold_in(jax.random.key(1), i)
        bp["rel_pos_h"] = jax.random.normal(
            k, bp["rel_pos_h"].shape, base.dtype) * 0.1
        bp["rel_pos_w"] = jax.random.normal(
            jax.random.fold_in(k, 1), bp["rel_pos_w"].shape, base.dtype) * 0.1
    pixels = jax.random.normal(
        jax.random.key(2), (bs, base.img_size, base.img_size, 3),
        jnp.bfloat16)

    outs = {}
    for name, cfg in {
        "xla": dataclasses.replace(base, flash_global=False,
                                   flash_window=False, fused_mlp=False),
        "flash_fused": base,
    }.items():
        fn = jax.jit(lambda px, p, c=cfg: image_encoder.forward(p, c, px))
        outs[name] = np.asarray(fn(pixels, params), np.float32)
        print(json.dumps({"config": name,
                          "checksum": float(outs[name].sum())}), flush=True)
    d = np.abs(outs["xla"] - outs["flash_fused"])
    corr = np.corrcoef(outs["xla"].ravel(), outs["flash_fused"].ravel())[0, 1]
    scale = float(np.abs(outs["xla"]).max())
    print(json.dumps({"max_abs_delta": float(d.max()),
                      "out_scale": scale,
                      "corr": float(corr)}))
    assert corr > 0.9999, corr
    assert float(d.max()) <= 0.02 * max(scale, 1.0), (d.max(), scale)
    print("encoder parity ok")


if __name__ == "__main__":
    main()
