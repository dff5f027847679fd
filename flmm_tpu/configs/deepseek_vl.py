"""DeepSeek-VL experiment presets.

Mirrors reference configs/deepseek_vl/frozen_deepseek_vl_1_3b_chat_unet_sam_l
_refcoco_png.py (and the 7b variant) as python factories.  A ``tiny``
preset with identical topology but toy dimensions drives the hermetic CPU
test-suite and the multi-chip dry run.
"""

from __future__ import annotations

import jax.numpy as jnp

from flmm_tpu.models.frozen.grounding import GroundingConfig as DeepseekVLGroundingConfig
from flmm_tpu.models.llm.decoder import DecoderConfig
from flmm_tpu.models.mask_head.refiner import SamRefinerConfig
from flmm_tpu.models.mask_head.unet import UNetConfig
from flmm_tpu.models.sam.image_encoder import SamEncoderConfig
from flmm_tpu.models.sam.mask_decoder import MaskDecoderConfig
from flmm_tpu.models.sam.prompt_encoder import PromptEncoderConfig
from flmm_tpu.models.sam.transformer import TwoWayConfig
from flmm_tpu.models.vision.vit import ViTConfig


def sam_vit_l(dtype=jnp.bfloat16, flash: bool = True,
              img_size: int = 1024) -> SamRefinerConfig:
    """SAM ViT-L refiner (reference build_sam.py:27-34).

    ``flash`` enables the Pallas attention kernels (TPU only; 2.5x encoder
    speedup measured on v5e with exact output parity).

    ``img_size``: SAM input resolution.  1024 is the reference-exact
    setting; smaller multiples of 16 enable the reduced-resolution
    deployment schedule (the checkpoint converter resamples the absolute
    pos-embed bicubically and the global rel-pos tables linearly, the
    same interpolation the reference applies in get_rel_pos).  448 gives
    a zero-padding 2x2 grid of 14x14 windows and ~5x fewer encoder
    FLOPs; accuracy is a measured tradeoff, not parity.
    """
    assert img_size % 16 == 0, img_size
    grid = img_size // 16
    return SamRefinerConfig(
        encoder=SamEncoderConfig(
            img_size=img_size,
            embed_dim=1024, depth=24, num_heads=16,
            global_attn_indexes=(5, 11, 17, 23), dtype=dtype,
            flash_global=flash, flash_window=flash,
            # whole-block window kernel (ops/window_block.py): measured
            # 8.5 vs 16.5 ms/window-layer in situ on v5e bs8 round 3
            window_block_fused=flash,
        ),
        prompt=PromptEncoderConfig(
            dtype=jnp.float32, image_embedding_size=grid,
            input_image_size=img_size),
        decoder=MaskDecoderConfig(dtype=jnp.float32),
        use_text=True, use_mask=True, use_box=True, multimask_output=False,
        prompt_size=4 * grid,
    )


def deepseek_vl_1_3b(dtype=jnp.bfloat16,
                     img_start: int = 5,
                     sam_img_size: int = 1024) -> DeepseekVLGroundingConfig:
    """DeepSeek-VL-1.3B-chat grounding stack.

    LLM dims per deepseek-ai/deepseek-vl-1.3b-chat (DeepSeek-LLM 1.3B:
    24 layers x 16 heads, hidden 2048, ffn 5504, vocab 102400); tower is
    SigLIP-L/16-384 (reference frozen_deepseek_vl.py:36-37).

    ``img_start``: static position of the image block in the packed
    sequence.  5 = the raw deepseek prompt offset.  Passing a multiple of
    128 (with the batch builders' ``align_image_block=128`` masked
    padding) turns on the fused flash-capture decoder kernel -- measured
    on v5e bs8 that only pays off at anyres sequence lengths (S=768:
    XLA 150 ms vs kernel 163 ms; S=3072: kernel 151 vs 183 ms), so the
    short-sequence deepseek recipe defaults to the unpadded layout.
    """
    llm = DecoderConfig(
        vocab_size=102400, hidden_size=2048, num_layers=24, num_heads=16,
        num_kv_heads=16, head_dim=128, intermediate_size=5504,
        rope_theta=10000.0, rms_eps=1e-6, dtype=dtype,
        use_flash_capture=img_start % 128 == 0,
    )
    vision = ViTConfig(
        hidden_size=1024, num_layers=24, num_heads=16, patch_size=16,
        image_size=384, mlp_dim=4096, use_class_token=False,
        act="gelu", ln_eps=1e-6, final_norm=True, dtype=dtype,
    )
    return DeepseekVLGroundingConfig(
        llm=llm, vision=vision,
        unet=UNetConfig(in_channels=24 * 16),
        sam=sam_vit_l(dtype=dtype, img_size=sam_img_size),
        projector_depth=2,
        # prompt: BOS + 'User: ' prefix tokens then 576 placeholders; the
        # batch builders assert the (aligned) tokenizer-derived offset
        # equals this value (collate.BatchSpec.expected_img_start).
        img_start=img_start, num_img_tokens=576, clip_shape=24,
        dtype=dtype,
    )


def deepseek_vl_7b(dtype=jnp.bfloat16,
                   img_start: int = 5) -> DeepseekVLGroundingConfig:
    """DeepSeek-VL-7B-chat grounding stack: hybrid tower (SAM-B high-res @
    1024 + SigLIP-L/16-384 low-res, reference deepseek_vl/models/
    clip_encoder.py:126-203) with the split mlp_gelu projector."""
    from flmm_tpu.models.vision.sam_tower import SamTowerConfig

    llm = DecoderConfig(
        vocab_size=102400, hidden_size=4096, num_layers=30, num_heads=32,
        num_kv_heads=32, head_dim=128, intermediate_size=11008,
        rope_theta=10000.0, rms_eps=1e-6, dtype=dtype,
        use_flash_capture=img_start % 128 == 0,
    )
    vision = ViTConfig(
        hidden_size=1024, num_layers=24, num_heads=16, patch_size=16,
        image_size=384, mlp_dim=4096, use_class_token=False,
        act="gelu", ln_eps=1e-6, final_norm=True, dtype=dtype,
    )
    base = deepseek_vl_1_3b(dtype, img_start=img_start)
    import dataclasses

    hybrid = SamTowerConfig(dtype=dtype)
    hybrid = dataclasses.replace(
        hybrid, encoder=dataclasses.replace(hybrid.encoder, dtype=dtype))
    return dataclasses.replace(
        base, llm=llm, vision=vision,
        unet=UNetConfig(in_channels=30 * 32),
        hybrid_high=hybrid,
        image_input_size=384,
    )


def tiny(dtype=jnp.float32, img_start: int = 3) -> DeepseekVLGroundingConfig:
    """Toy-dimension config with the production topology (CPU-runnable)."""
    llm = DecoderConfig(
        vocab_size=256, hidden_size=64, num_layers=3, num_heads=4,
        num_kv_heads=2, head_dim=16, intermediate_size=128, dtype=dtype,
    )
    vision = ViTConfig(
        hidden_size=32, num_layers=2, num_heads=2, patch_size=8,
        image_size=64, mlp_dim=64, use_class_token=False, dtype=dtype,
    )
    sam = SamRefinerConfig(
        encoder=SamEncoderConfig(
            img_size=128, patch_size=16, embed_dim=32, depth=2, num_heads=2,
            mlp_ratio=2.0, out_chans=16, window_size=2,
            global_attn_indexes=(1,), dtype=dtype,
        ),
        prompt=PromptEncoderConfig(
            embed_dim=16, image_embedding_size=8, input_image_size=128,
            mask_in_chans=8, dtype=dtype,
        ),
        decoder=MaskDecoderConfig(
            transformer_dim=16,
            transformer=TwoWayConfig(depth=2, embed_dim=16, num_heads=2,
                                     mlp_dim=32, dtype=dtype),
            dtype=dtype,
        ),
        prompt_size=32, box_frame=32,
    )
    return DeepseekVLGroundingConfig(
        llm=llm, vision=vision,
        unet=UNetConfig(in_channels=3 * 4, base_channels=8,
                        upsample_input=16),
        sam=sam,
        projector_depth=2, img_start=img_start, num_img_tokens=64,
        clip_shape=8, dtype=dtype,
    )


def tiny_hybrid(dtype=jnp.float32, img_start: int = 3):
    """Toy hybrid-tower (DeepSeek-7B topology) config."""
    import dataclasses

    from flmm_tpu.models.vision.sam_tower import SamTowerConfig

    base = tiny(dtype=dtype, img_start=img_start)
    hybrid = SamTowerConfig(
        encoder=SamEncoderConfig(
            img_size=64, patch_size=16, embed_dim=16, depth=2, num_heads=2,
            mlp_ratio=2.0, out_chans=8, window_size=2,
            global_attn_indexes=(1,), dtype=dtype,
        ),
        downsample_channels=(16, 32),
        neck_size=32,  # 64/16=4 grid -> neck resize 32 -> /4 = 8 = clip grid
        dtype=dtype,
    )
    return dataclasses.replace(base, hybrid_high=hybrid)
