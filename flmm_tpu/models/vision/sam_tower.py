"""DeepSeek-VL's SAM-B high-resolution vision tower.

Behavioural spec: reference deepseek_vl/models/sam.py -- a SAM ViT-B
ViTDet trunk whose neck output is bilinearly resized to 96x96 and pushed
through two stride-2 convs (512 -> 1024 channels), plus an 'HD' residual:
the first global block's features through a duplicate neck, the same
resize/downsample path, scaled by a learned ``hd_alpha`` (:168-196).
Output: (B, 24, 24, 1024) -> 576 high-res tokens for the hybrid tower.

Reuses the flmm_tpu SAM encoder blocks (models/sam/image_encoder.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from flmm_tpu.models.sam import image_encoder as sam_enc
from flmm_tpu.models.sam.common import channel_norm, conv2d
from flmm_tpu.ops.resize import resize_bilinear


@dataclasses.dataclass(frozen=True)
class SamTowerConfig:
    encoder: sam_enc.SamEncoderConfig = dataclasses.field(
        default_factory=lambda: sam_enc.SamEncoderConfig(
            embed_dim=768, depth=12, num_heads=12,
            global_attn_indexes=(2, 5, 8, 11),
        )
    )
    downsample_channels: tuple = (512, 1024)
    neck_size: int = 96  # neck features resized here before downsampling
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        return self.downsample_channels[-1]


def init_params(cfg: SamTowerConfig, key: jax.Array) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    enc = sam_enc.init_params(cfg.encoder, k1)
    downs = []
    cin = cfg.encoder.out_chans
    for i, cout in enumerate(cfg.downsample_channels):
        kk = jax.random.fold_in(k2, i)
        downs.append({
            "k": (jax.random.normal(kk, (3, 3, cin, cout), jnp.float32)
                  / jnp.sqrt(9 * cin)).astype(cfg.dtype),
        })
        cin = cout
    # neck_hd: a duplicate of the encoder neck (reference :165)
    neck_hd = {
        "neck0_kernel": enc["neck0_kernel"],
        "neck0_ln_w": enc["neck0_ln_w"],
        "neck0_ln_b": enc["neck0_ln_b"],
        "neck1_kernel": enc["neck1_kernel"],
        "neck1_ln_w": enc["neck1_ln_w"],
        "neck1_ln_b": enc["neck1_ln_b"],
    }
    return {
        "encoder": enc,
        "downsamples": downs,
        "neck_hd": jax.tree.map(jnp.copy, neck_hd),
        "hd_alpha": jnp.zeros((1,), jnp.float32),
    }


def _neck(x, p, prefix, eps):
    x = conv2d(x, p[prefix + "0_kernel"])
    x = channel_norm(x, p[prefix + "0_ln_w"], p[prefix + "0_ln_b"], eps)
    x = conv2d(x, p[prefix + "1_kernel"], padding=1)
    return channel_norm(x, p[prefix + "1_ln_w"], p[prefix + "1_ln_b"], eps)


def _resize_and_downsample(x, cfg: SamTowerConfig, downs):
    x = jnp.moveaxis(x, -1, 1)
    x = resize_bilinear(x, (cfg.neck_size, cfg.neck_size))
    x = jnp.moveaxis(x, 1, -1)
    for d in downs:
        x = jax.lax.conv_general_dilated(
            x, d["k"].astype(x.dtype), (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    return x


def forward(params: dict, cfg: SamTowerConfig, pixels: jnp.ndarray):
    """Pixels (B, 1024, 1024, 3) -> (B, 24, 24, out_channels)."""
    ecfg = cfg.encoder
    enc = params["encoder"]
    x = conv2d(pixels.astype(ecfg.dtype), enc["patch_kernel"],
               enc["patch_bias"], stride=ecfg.patch_size)
    x = x + enc["pos_embed"].astype(x.dtype)
    first_global = None
    for i, bp in enumerate(enc["blocks"]):
        x = sam_enc._block(x, bp, ecfg, windowed=i not in ecfg.global_attn_indexes)
        if first_global is None and i in ecfg.global_attn_indexes:
            first_global = x
    main = _neck(x, enc, "neck", ecfg.ln_eps)
    main = _resize_and_downsample(main, cfg, params["downsamples"])

    hd = _neck(first_global, params["neck_hd"], "neck", ecfg.ln_eps)
    hd = _resize_and_downsample(hd, cfg, params["downsamples"])
    alpha = params["hd_alpha"].astype(main.dtype)
    return main + hd * alpha
