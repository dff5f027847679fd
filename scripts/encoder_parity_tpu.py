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
    tower_parity(bs)


def tower_parity(bs: int = 2):
    """SigLIP tower: fused LN/qkv/proj/MLP kernels vs plain XLA."""
    import dataclasses

    from flmm_tpu.configs.deepseek_vl import deepseek_vl_1_3b
    from flmm_tpu.models.vision import vit

    cfg = deepseek_vl_1_3b().vision
    params = vit.init_params(cfg, jax.random.key(3))
    pixels = jax.random.normal(
        jax.random.key(4), (bs, cfg.image_size, cfg.image_size, 3),
        jnp.bfloat16)
    outs = {}
    for name, c in {"fused": cfg,
                    "xla": dataclasses.replace(cfg, fused_mlp=False)}.items():
        fn = jax.jit(lambda px, p, c=c: vit.forward(p, c, px))
        outs[name] = np.asarray(fn(pixels, params), np.float32)
    d = np.abs(outs["xla"] - outs["fused"])
    corr = np.corrcoef(outs["xla"].ravel(), outs["fused"].ravel())[0, 1]
    scale = float(np.abs(outs["xla"]).max())
    print(json.dumps({"tower_max_abs_delta": float(d.max()),
                      "tower_out_scale": scale,
                      "tower_corr": float(corr)}))
    assert corr > 0.9999, corr
    # the fused path keeps the residual in f32 across proj+LN+MLP while
    # XLA rounds to bf16 between ops; 24 layers of different rounding
    # order accumulate a few-percent max deviation at 0.9999+ corr
    assert float(d.max()) <= 0.04 * max(scale, 1.0), (d.max(), scale)
    print("tower parity ok")


if __name__ == "__main__":
    main()
