"""LLaVA-1.5 experiment presets.

Mirrors reference configs/llava/frozen_llava_1_5_vicuna_7b_unet_sam_l
_refcoco_png.py: Vicuna-7B + CLIP-ViT-L/14-336 (select layer -2, CLS
dropped), 576-token contiguous image block, in_channels = 32 layers x 32
heads, vicuna prompt template, llava image-processor size rule.
"""

from __future__ import annotations

import jax.numpy as jnp

from flmm_tpu.configs.deepseek_vl import sam_vit_l
from flmm_tpu.models.frozen.grounding import GroundingConfig
from flmm_tpu.models.llm.decoder import DecoderConfig
from flmm_tpu.models.mask_head.unet import UNetConfig
from flmm_tpu.models.vision.vit import ViTConfig


def clip_vit_l_336(dtype=jnp.bfloat16) -> ViTConfig:
    return ViTConfig(
        hidden_size=1024, num_layers=24, num_heads=16, patch_size=14,
        image_size=336, mlp_dim=4096, use_class_token=True,
        use_pre_norm=True, patch_bias=False, act="quick_gelu",
        ln_eps=1e-5, final_norm=False, dtype=dtype,
    )


def vicuna_7b(dtype=jnp.bfloat16) -> DecoderConfig:
    return DecoderConfig(
        vocab_size=32064, hidden_size=4096, num_layers=32, num_heads=32,
        num_kv_heads=32, head_dim=128, intermediate_size=11008,
        rope_theta=10000.0, rms_eps=1e-5, dtype=dtype,
    )


def llava_1_5_7b(dtype=jnp.bfloat16, img_start: int = 35) -> GroundingConfig:
    """LLaVA-1.5-7B grounding stack.

    ``img_start`` is the position of the (pre-expanded) image block under
    the vicuna template prompt; the data pipeline computes the true offset.
    """
    return GroundingConfig(
        llm=vicuna_7b(dtype),
        vision=clip_vit_l_336(dtype),
        unet=UNetConfig(in_channels=32 * 32),
        sam=sam_vit_l(dtype=dtype),
        projector_depth=2,
        img_start=img_start, num_img_tokens=576, clip_shape=24,
        vision_select_layer=-2, vision_drop_cls=True,
        dtype=dtype,
    )


def tiny_llava(dtype=jnp.float32, img_start: int = 3) -> GroundingConfig:
    """Toy LLaVA-topology config (CLS token + pre-norm + quick-gelu path)."""
    from flmm_tpu.configs.deepseek_vl import tiny

    base = tiny(dtype=dtype, img_start=img_start)
    vision = ViTConfig(
        hidden_size=32, num_layers=2, num_heads=2, patch_size=8,
        image_size=64, mlp_dim=64, use_class_token=True, use_pre_norm=True,
        patch_bias=False, act="quick_gelu", final_norm=False, dtype=dtype,
    )
    import dataclasses

    return dataclasses.replace(
        base, vision=vision, vision_select_layer=-2, vision_drop_cls=True
    )
