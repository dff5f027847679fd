"""ConvNeXt auxiliary vision tower (MGM's high-res branch).

Behavioural spec: reference mgm/model/multimodal_encoder/openclip_encoder.py
(OpenCLIPVisionTower) -- an open_clip ConvNeXt trunk run stem -> stages,
with every stage's feature map bilinearly upsampled to the stage-0
resolution and channel-concatenated (backbone:67-87).  For ConvNeXt-L-320
the concatenated width is 192+384+768+1536 = 2880 channels at 1/8 input
resolution (768 -> 96 -> concat at 96... stage0 res = input/8? stem /4 then
stage strides /1,/2,/2,/2 -> resolutions /4,/8,/16,/32; the reference
upsamples everything to the *stage-1* (/8) map it starts from -- see
``downsample`` handling below).

NHWC layout; LayerNorm in f32.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from flmm_tpu.models.sam.common import layer_norm
from flmm_tpu.ops.resize import resize_bilinear


@dataclasses.dataclass(frozen=True)
class ConvNeXtConfig:
    depths: tuple = (3, 3, 27, 3)  # convnext-large
    dims: tuple = (192, 384, 768, 1536)
    image_size: int = 768
    ln_eps: float = 1e-6
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        return sum(self.dims)


def init_params(cfg: ConvNeXtConfig, key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 256))

    def w(shape, fan_in):
        return (jax.random.normal(next(keys), shape, jnp.float32)
                / jnp.sqrt(fan_in)).astype(cfg.dtype)

    def block(dim):
        return {
            "dw_k": w((7, 7, 1, dim), 49),
            "dw_b": jnp.zeros((dim,), cfg.dtype),
            "ln_w": jnp.ones((dim,), cfg.dtype),
            "ln_b": jnp.zeros((dim,), cfg.dtype),
            "w1": w((dim, 4 * dim), dim),
            "b1": jnp.zeros((4 * dim,), cfg.dtype),
            "w2": w((4 * dim, dim), 4 * dim),
            "b2": jnp.zeros((dim,), cfg.dtype),
            "gamma": jnp.full((dim,), 1e-6, cfg.dtype),
        }

    stages = []
    for i, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
        stage = {"blocks": [block(dim) for _ in range(depth)]}
        if i > 0:
            stage["down_ln_w"] = jnp.ones((cfg.dims[i - 1],), cfg.dtype)
            stage["down_ln_b"] = jnp.zeros((cfg.dims[i - 1],), cfg.dtype)
            stage["down_k"] = w((2, 2, cfg.dims[i - 1], dim),
                                4 * cfg.dims[i - 1])
            stage["down_b"] = jnp.zeros((dim,), cfg.dtype)
        stages.append(stage)
    return {
        "stem_k": w((4, 4, 3, cfg.dims[0]), 48),
        "stem_b": jnp.zeros((cfg.dims[0],), cfg.dtype),
        "stem_ln_w": jnp.ones((cfg.dims[0],), cfg.dtype),
        "stem_ln_b": jnp.zeros((cfg.dims[0],), cfg.dtype),
        "stages": stages,
    }


def _block_forward(x: jnp.ndarray, p: dict, eps: float) -> jnp.ndarray:
    dim = x.shape[-1]
    shortcut = x
    y = jax.lax.conv_general_dilated(
        x, p["dw_k"].astype(x.dtype), (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=dim,
    ) + p["dw_b"].astype(x.dtype)
    y = layer_norm(y, p["ln_w"], p["ln_b"], eps)
    y = jax.nn.gelu(y @ p["w1"].astype(y.dtype) + p["b1"].astype(y.dtype),
                    approximate=False)
    y = y @ p["w2"].astype(y.dtype) + p["b2"].astype(y.dtype)
    return shortcut + y * p["gamma"].astype(y.dtype)


def forward(params: dict, cfg: ConvNeXtConfig, pixels: jnp.ndarray):
    """Pixels (B, H, W, 3) -> multi-stage concat features.

    Returns ``(B, H/4? , ...)``: all stage outputs upsampled to the stage-0
    resolution (input/4) and concatenated to ``sum(dims)`` channels, NHWC.
    """
    x = jax.lax.conv_general_dilated(
        pixels.astype(cfg.dtype), params["stem_k"].astype(cfg.dtype),
        (4, 4), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["stem_b"].astype(cfg.dtype)
    x = layer_norm(x, params["stem_ln_w"], params["stem_ln_b"], cfg.ln_eps)

    feats = []
    for i, stage in enumerate(params["stages"]):
        if i > 0:
            x = layer_norm(x, stage["down_ln_w"], stage["down_ln_b"],
                           cfg.ln_eps)
            x = jax.lax.conv_general_dilated(
                x, stage["down_k"].astype(x.dtype), (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + stage["down_b"].astype(x.dtype)
        for bp in stage["blocks"]:
            x = _block_forward(x, bp, cfg.ln_eps)
        feats.append(x)

    h0, w0 = feats[0].shape[1], feats[0].shape[2]
    ups = [feats[0]]
    for f in feats[1:]:
        f = jnp.moveaxis(f, -1, 1)
        f = resize_bilinear(f, (h0, w0))
        ups.append(jnp.moveaxis(f, 1, -1))
    return jnp.concatenate(ups, axis=-1)
