"""SAM torch checkpoint -> flmm_tpu param trees.

Consumes the official ``sam_vit_{b,l,h}`` state dict layout (reference
segment_anything/build_sam.py:55-107).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np
import jax.numpy as jnp

from flmm_tpu.models.sam.image_encoder import SamEncoderConfig
from flmm_tpu.models.sam.mask_decoder import MaskDecoderConfig
from flmm_tpu.models.sam.prompt_encoder import PromptEncoderConfig


def _np(x: Any) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().to("cpu").float().numpy()
    return np.asarray(x)


def _lin(sd, name, dtype):
    return {
        "w": jnp.asarray(_np(sd[name + ".weight"]).T, dtype),
        "b": jnp.asarray(_np(sd[name + ".bias"]), dtype),
    }


def _attn(sd, prefix, dtype):
    return {
        "q": _lin(sd, prefix + ".q_proj", dtype),
        "k": _lin(sd, prefix + ".k_proj", dtype),
        "v": _lin(sd, prefix + ".v_proj", dtype),
        "out": _lin(sd, prefix + ".out_proj", dtype),
    }


def resize_rel_pos(table: np.ndarray, target_len: int) -> np.ndarray:
    """Linear-resample a ``(L, hd)`` decomposed rel-pos table to
    ``(target_len, hd)`` -- exact semantics of the reference's
    ``get_rel_pos`` F.interpolate(mode='linear', align_corners=False)
    (segment_anything/modeling/image_encoder.py:292-308)."""
    L = table.shape[0]
    if L == target_len:
        return table
    # output i samples input coordinate (i + .5) * L/target - .5
    coords = (np.arange(target_len) + 0.5) * (L / target_len) - 0.5
    coords = np.clip(coords, 0.0, L - 1.0)
    lo = np.floor(coords).astype(np.int64)
    hi = np.minimum(lo + 1, L - 1)
    t = (coords - lo)[:, None]
    return table[lo] * (1.0 - t) + table[hi] * t


def resize_pos_embed_2d(pos: np.ndarray, target_grid: int) -> np.ndarray:
    """Bicubic-resample a ``(G, G, D)`` absolute pos-embed grid (same
    torch-parity a=-0.75 bicubic used for the ViT towers)."""
    import jax

    G = pos.shape[0]
    if G == target_grid:
        return pos
    from flmm_tpu.ops.resize import resize_bicubic

    out = resize_bicubic(
        jnp.asarray(pos, jnp.float32).transpose(2, 0, 1)[None],
        (target_grid, target_grid))[0]
    return np.asarray(jax.device_get(out)).transpose(1, 2, 0)


def encoder_params(
    sd: Mapping[str, Any], cfg: SamEncoderConfig, prefix: str = "image_encoder.",
    dtype: Any = None,
) -> dict:
    """Convert the encoder weights; when ``cfg`` asks for a different
    input resolution than the checkpoint's (e.g. the reduced-resolution
    schedule, configs/deepseek_vl.sam_vit_l(img_size=...)), the absolute
    pos-embed is bicubic-resampled and the global blocks' rel-pos tables
    linear-resampled to ``2*grid - 1`` (window tables are size-invariant)."""
    dtype = dtype or cfg.dtype

    def get(name):
        return _np(sd[prefix + name])

    blocks = []
    for i in range(cfg.depth):
        b = f"blocks.{i}."
        size = cfg.grid if i in cfg.global_attn_indexes else cfg.window_size
        blocks.append({
            "ln1_w": jnp.asarray(get(b + "norm1.weight"), dtype),
            "ln1_b": jnp.asarray(get(b + "norm1.bias"), dtype),
            "ln2_w": jnp.asarray(get(b + "norm2.weight"), dtype),
            "ln2_b": jnp.asarray(get(b + "norm2.bias"), dtype),
            "wqkv": jnp.asarray(get(b + "attn.qkv.weight").T, dtype),
            "bqkv": jnp.asarray(get(b + "attn.qkv.bias"), dtype),
            "wo": jnp.asarray(get(b + "attn.proj.weight").T, dtype),
            "bo": jnp.asarray(get(b + "attn.proj.bias"), dtype),
            "mlp": {
                "w1": jnp.asarray(get(b + "mlp.lin1.weight").T, dtype),
                "b1": jnp.asarray(get(b + "mlp.lin1.bias"), dtype),
                "w2": jnp.asarray(get(b + "mlp.lin2.weight").T, dtype),
                "b2": jnp.asarray(get(b + "mlp.lin2.bias"), dtype),
            },
            "rel_pos_h": jnp.asarray(
                resize_rel_pos(get(b + "attn.rel_pos_h"), 2 * size - 1),
                dtype),
            "rel_pos_w": jnp.asarray(
                resize_rel_pos(get(b + "attn.rel_pos_w"), 2 * size - 1),
                dtype),
        })
    return {
        "patch_kernel": jnp.asarray(
            get("patch_embed.proj.weight").transpose(2, 3, 1, 0), dtype
        ),
        "patch_bias": jnp.asarray(get("patch_embed.proj.bias"), dtype),
        "pos_embed": jnp.asarray(
            resize_pos_embed_2d(get("pos_embed")[0], cfg.grid), dtype),
        "neck0_kernel": jnp.asarray(get("neck.0.weight").transpose(2, 3, 1, 0), dtype),
        "neck0_ln_w": jnp.asarray(get("neck.1.weight"), dtype),
        "neck0_ln_b": jnp.asarray(get("neck.1.bias"), dtype),
        "neck1_kernel": jnp.asarray(get("neck.2.weight").transpose(2, 3, 1, 0), dtype),
        "neck1_ln_w": jnp.asarray(get("neck.3.weight"), dtype),
        "neck1_ln_b": jnp.asarray(get("neck.3.bias"), dtype),
        "blocks": blocks,
    }


def prompt_encoder_params(
    sd: Mapping[str, Any], cfg: PromptEncoderConfig,
    prefix: str = "prompt_encoder.", dtype: Any = None,
) -> dict:
    dtype = dtype or cfg.dtype

    def get(name):
        return _np(sd[prefix + name])

    return {
        "pe_gaussian": jnp.asarray(
            get("pe_layer.positional_encoding_gaussian_matrix"), dtype
        ),
        "point_embeddings": jnp.asarray(
            np.concatenate(
                [get(f"point_embeddings.{i}.weight") for i in range(4)], axis=0
            ),
            dtype,
        ),
        "not_a_point": jnp.asarray(get("not_a_point_embed.weight"), dtype),
        "no_mask": jnp.asarray(get("no_mask_embed.weight"), dtype),
        "mask_down": {
            "k0": jnp.asarray(
                get("mask_downscaling.0.weight").transpose(2, 3, 1, 0), dtype
            ),
            "b0": jnp.asarray(get("mask_downscaling.0.bias"), dtype),
            "ln0_w": jnp.asarray(get("mask_downscaling.1.weight"), dtype),
            "ln0_b": jnp.asarray(get("mask_downscaling.1.bias"), dtype),
            "k1": jnp.asarray(
                get("mask_downscaling.3.weight").transpose(2, 3, 1, 0), dtype
            ),
            "b1": jnp.asarray(get("mask_downscaling.3.bias"), dtype),
            "ln1_w": jnp.asarray(get("mask_downscaling.4.weight"), dtype),
            "ln1_b": jnp.asarray(get("mask_downscaling.4.bias"), dtype),
            "k2": jnp.asarray(
                get("mask_downscaling.6.weight").transpose(2, 3, 1, 0), dtype
            ),
            "b2": jnp.asarray(get("mask_downscaling.6.bias"), dtype),
        },
    }


def _conv_transpose_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight (in, out, kH, kW) -> our HWIO kernel.

    jax.lax.conv_transpose(transpose_kernel=False) correlates with the
    kernel as a forward conv, so torch's gradient-style kernel must be
    spatially flipped (verified bit-exact in tests/test_sam.py).
    """
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1])


def mask_decoder_params(
    sd: Mapping[str, Any], cfg: MaskDecoderConfig,
    prefix: str = "mask_decoder.", dtype: Any = None,
) -> dict:
    dtype = dtype or cfg.dtype

    def get(name):
        return _np(sd[prefix + name])

    def mlp_layers(base, n):
        return [_lin(sd, f"{prefix}{base}.layers.{j}", dtype) for j in range(n)]

    layers = []
    for i in range(cfg.transformer.depth):
        t = f"{prefix}transformer.layers.{i}."
        layers.append({
            "self_attn": _attn(sd, t + "self_attn", dtype),
            "cross_t2i": _attn(sd, t + "cross_attn_token_to_image", dtype),
            "cross_i2t": _attn(sd, t + "cross_attn_image_to_token", dtype),
            "mlp": {
                "w1": jnp.asarray(_np(sd[t + "mlp.lin1.weight"]).T, dtype),
                "b1": jnp.asarray(_np(sd[t + "mlp.lin1.bias"]), dtype),
                "w2": jnp.asarray(_np(sd[t + "mlp.lin2.weight"]).T, dtype),
                "b2": jnp.asarray(_np(sd[t + "mlp.lin2.bias"]), dtype),
            },
            **{
                f"ln{j}_{wb}": jnp.asarray(
                    _np(sd[t + f"norm{j}.{name}"]), dtype
                )
                for j in range(1, 5)
                for wb, name in (("w", "weight"), ("b", "bias"))
            },
        })
    transformer = {
        "layers": layers,
        "final_attn": _attn(
            sd, prefix + "transformer.final_attn_token_to_image", dtype
        ),
        "final_ln_w": jnp.asarray(
            get("transformer.norm_final_attn.weight"), dtype
        ),
        "final_ln_b": jnp.asarray(get("transformer.norm_final_attn.bias"), dtype),
    }
    hyper = [
        mlp_layers(f"output_hypernetworks_mlps.{i}", 3)
        for i in range(cfg.num_mask_tokens)
    ]
    return {
        "iou_token": jnp.asarray(get("iou_token.weight"), dtype),
        "mask_tokens": jnp.asarray(get("mask_tokens.weight"), dtype),
        "transformer": transformer,
        "upscale": {
            "k0": jnp.asarray(
                _conv_transpose_kernel(get("output_upscaling.0.weight")), dtype
            ),
            "b0": jnp.asarray(get("output_upscaling.0.bias"), dtype),
            "ln_w": jnp.asarray(get("output_upscaling.1.weight"), dtype),
            "ln_b": jnp.asarray(get("output_upscaling.1.bias"), dtype),
            "k1": jnp.asarray(
                _conv_transpose_kernel(get("output_upscaling.3.weight")), dtype
            ),
            "b1": jnp.asarray(get("output_upscaling.3.bias"), dtype),
        },
        "hyper_mlps": hyper,
        "iou_mlp": mlp_layers("iou_prediction_head", cfg.iou_head_depth),
    }
