"""Trainable U-Net mask head (JAX), matching the reference's mmseg spec.

Behavioural spec: reference flmm/models/mask_head/mask_decoder.py (UNetHead)
with the architecture fixed by the configs (e.g. configs/deepseek_vl/
frozen_deepseek_vl_1_3b_chat_unet_sam_l_refcoco_png.py:57-71):

* 4 encoder stages of BasicConvBlocks (2x [3x3 conv -> GroupNorm(1) ->
  ReLU]), channel widths base * 2**i, MaxPool2d(2) between stages;
* 3 decoder UpConvBlocks: InterpConv upsample (f32 bilinear 2x -> 1x1
  conv -> GN -> ReLU), concat skip, BasicConvBlock;
* 1x1 ``conv_seg`` to a single logit channel;
* input pipeline: optional sum-to-1 normalisation of the attention maps,
  f32 bilinear upsample of the low-res input to >= ``upsample_input``,
  zero-pad H/W to a multiple of ``2**(num_stages-1)`` and crop back.

All spatial math is NHWC and shape-static (grid sizes are config-known).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from flmm_tpu.ops.resize import resize_bilinear


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int
    base_channels: int = 64
    num_stages: int = 4
    enc_num_convs: tuple = (2, 2, 2, 2)
    dec_num_convs: tuple = (2, 2, 2)
    normalize_input: bool = True
    upsample_input: int | None = 64
    dtype: Any = jnp.float32

    def stage_channels(self, i: int) -> int:
        return self.base_channels * (2 ** i)


def _conv_params(key, kh, kw, cin, cout, dtype):
    fan_in = kh * kw * cin
    k = jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)
    return {
        "k": (k * math.sqrt(2.0 / fan_in)).astype(dtype),
        "b": jnp.zeros((cout,), dtype),
        "gn_w": jnp.ones((cout,), dtype),
        "gn_b": jnp.zeros((cout,), dtype),
    }


def init_params(cfg: UNetConfig, key: jax.Array) -> dict:
    n = cfg.num_stages
    keys = iter(jax.random.split(key, 64))
    enc = []
    cin = cfg.in_channels
    for i in range(n):
        block = []
        for j in range(cfg.enc_num_convs[i]):
            cout = cfg.stage_channels(i)
            block.append(_conv_params(next(keys), 3, 3, cin if j == 0 else cout,
                                      cout, cfg.dtype))
        enc.append(block)
        cin = cfg.stage_channels(i)
    dec = []
    for i in range(1, n):  # decoder i fuses stage i -> stage i-1
        up = _conv_params(next(keys), 1, 1, cfg.stage_channels(i),
                          cfg.stage_channels(i - 1), cfg.dtype)
        block = []
        for j in range(cfg.dec_num_convs[i - 1]):
            cin_b = 2 * cfg.stage_channels(i - 1) if j == 0 else cfg.stage_channels(i - 1)
            block.append(_conv_params(next(keys), 3, 3, cin_b,
                                      cfg.stage_channels(i - 1), cfg.dtype))
        dec.append({"up": up, "convs": block})
    seg_k = jax.random.normal(next(keys), (1, 1, cfg.base_channels, 1), jnp.float32)
    return {
        "enc": enc,
        "dec": dec,
        "seg_k": (seg_k * math.sqrt(2.0 / cfg.base_channels)).astype(cfg.dtype),
        "seg_b": jnp.zeros((1,), cfg.dtype),
    }


def _group_norm1(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, eps=1e-5):
    """GroupNorm(num_groups=1): normalise over (H, W, C) per sample."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=(1, 2, 3), keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=(1, 2, 3), keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def _conv_gn_relu(x, p, padding=1, stride=1):
    y = jax.lax.conv_general_dilated(
        x, p["k"].astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"].astype(x.dtype)
    y = _group_norm1(y, p["gn_w"], p["gn_b"])
    return jax.nn.relu(y)


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def forward(params: dict, cfg: UNetConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Attention maps -> coarse mask logits.

    Args:
      x: ``(M, h, w, C_in)`` stacked per-mask attention images (values in
        [0, 1] when ``normalize_input``).

    Returns ``(M, H, W)`` logits where H/W are the upsampled input size.
    """
    x = x.astype(cfg.dtype)
    if cfg.normalize_input:
        s = jnp.clip(x.sum(axis=(1, 2), keepdims=True), 1e-12, None)
        x = x / s
    h, w = x.shape[1], x.shape[2]
    if cfg.upsample_input is not None:
        scale = max(1.0, cfg.upsample_input / max(h, w))
        h, w = int(h * scale), int(w * scale)
        # scale_factor coordinate convention (reference mask_decoder.py:49)
        x = jnp.moveaxis(
            resize_bilinear(jnp.moveaxis(x, -1, 1), (h, w),
                            scale=(scale, scale)), 1, -1
        )
    div = 2 ** (cfg.num_stages - 1)
    ph = math.ceil(h / div) * div
    pw = math.ceil(w / div) * div
    x = jnp.pad(x, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)))

    enc_outs = []
    for i, block in enumerate(params["enc"]):
        if i > 0:
            x = _maxpool2(x)
        for p in block:
            x = _conv_gn_relu(x, p)
        enc_outs.append(x)

    for i in range(cfg.num_stages - 1, 0, -1):
        dp = params["dec"][i - 1]
        # InterpConv: f32 bilinear 2x then 1x1 conv+GN+ReLU
        x = jnp.moveaxis(x, -1, 1)
        x = resize_bilinear(x, (x.shape[-2] * 2, x.shape[-1] * 2))
        x = jnp.moveaxis(x, 1, -1)
        x = _conv_gn_relu(x, dp["up"], padding=0)
        x = jnp.concatenate([enc_outs[i - 1], x], axis=-1)
        for p in dp["convs"]:
            x = _conv_gn_relu(x, p)

    x = x[:, :h, :w]
    logits = jax.lax.conv_general_dilated(
        x, params["seg_k"].astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["seg_b"].astype(x.dtype)
    return logits[..., 0]


def output_hw(cfg: UNetConfig, in_hw: tuple[int, int]) -> tuple[int, int]:
    """Static output size for a given attention-grid input size."""
    h, w = in_hw
    if cfg.upsample_input is not None:
        scale = max(1.0, cfg.upsample_input / max(h, w))
        h, w = int(h * scale), int(w * scale)
    return h, w
