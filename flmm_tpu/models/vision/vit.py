"""Generic vision transformer covering every tower the reference vendors.

One parametric implementation spans:

* CLIP-ViT-L/14-336 (LLaVA/LLaVA-Next/MGM; HF ``CLIPVisionModel`` layout --
  class token, pre-layernorm, quick-gelu)
* SigLIP-L/16-384 and so400m (DeepSeekVL; timm-style trunk vendored at
  reference deepseek_vl/models/siglip_vit.py:259 -- no class token, exact
  GELU, final LayerNorm, head ignored)
* HF SigLIP @448 (HPT-1.5; reference hpt/modeling_siglip.py:829 -- same
  trunk, tanh-gelu)

The towers are frozen; features are taken at a configurable layer index
following each wrapper's ``select_layer`` convention.  Position embeddings
can be bicubically resampled for enlarged input resolutions (reference:
flmm/models/frozen_hpt.py:41-70).

Layout: NHWC images, stacked per-layer weights scanned with ``lax.scan``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from flmm_tpu.ops.resize import resize_bicubic


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    hidden_size: int
    num_layers: int
    num_heads: int
    patch_size: int
    image_size: int
    mlp_dim: int
    use_class_token: bool = False
    use_pre_norm: bool = False  # CLIP pre_layrnorm after embeddings
    patch_bias: bool = True
    act: str = "gelu"  # 'gelu' | 'gelu_tanh' | 'quick_gelu'
    ln_eps: float = 1e-6
    # Whether select_layer=-1 applies the final LayerNorm.  True for
    # SigLIP/timm trunks (deepseek_vl/models/siglip_vit.py, HF Siglip);
    # False for HF CLIP, whose post_layernorm only feeds the pooled CLS.
    final_norm: bool = True
    # Use the Pallas bias-free flash kernel for self-attention on TPU
    # (ops.sam_flash.plain_flash_attention).  Measured v5e bs8 SigLIP-L
    # S=729: XLA 68.7 ms vs kernel 79 ms -- XLA's fused attention wins at
    # tower sizes, so this stays off; the kernel exists for long-sequence
    # towers where the (G,S,S) materialisation would dominate.
    flash: bool = False
    # fuse LN2 + MLP + residual into one Pallas kernel on TPU (the (N, F)
    # activation never touches HBM); auto-disabled for non-tiling shapes
    fused_mlp: bool = True
    dtype: Any = jnp.float32

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def seq_len(self) -> int:
        return self.num_patches + (1 if self.use_class_token else 0)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def init_params(cfg: ViTConfig, key: jax.Array) -> dict:
    ks = jax.random.split(key, 8)
    d, f, L = cfg.hidden_size, cfg.mlp_dim, cfg.num_layers

    def w(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32) / jnp.sqrt(fan_in)).astype(
            cfg.dtype
        )

    params = {
        "patch_kernel": w(ks[0], (cfg.patch_size, cfg.patch_size, 3, d),
                          cfg.patch_size * cfg.patch_size * 3),
        "pos_embed": w(ks[1], (cfg.seq_len, d), d),
        "layers": {
            "ln1_w": jnp.ones((L, d), cfg.dtype),
            "ln1_b": jnp.zeros((L, d), cfg.dtype),
            "ln2_w": jnp.ones((L, d), cfg.dtype),
            "ln2_b": jnp.zeros((L, d), cfg.dtype),
            "wqkv": w(ks[2], (L, d, 3 * d), d),
            "bqkv": jnp.zeros((L, 3 * d), cfg.dtype),
            "wo": w(ks[3], (L, d, d), d),
            "bo": jnp.zeros((L, d), cfg.dtype),
            "w1": w(ks[4], (L, d, f), d),
            "b1": jnp.zeros((L, f), cfg.dtype),
            "w2": w(ks[5], (L, f, d), f),
            "b2": jnp.zeros((L, d), cfg.dtype),
        },
        "final_ln_w": jnp.ones((d,), cfg.dtype),
        "final_ln_b": jnp.zeros((d,), cfg.dtype),
    }
    if cfg.patch_bias:
        params["patch_bias"] = jnp.zeros((d,), cfg.dtype)
    if cfg.use_class_token:
        params["cls_token"] = jnp.zeros((d,), cfg.dtype)
    if cfg.use_pre_norm:
        params["pre_ln_w"] = jnp.ones((d,), cfg.dtype)
        params["pre_ln_b"] = jnp.zeros((d,), cfg.dtype)
    return params


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def _act(x, kind):
    if kind == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if kind == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    if kind == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    raise ValueError(kind)


def resample_pos_embed(
    pos: jnp.ndarray, old_grid: int, new_grid: int, has_cls: bool
) -> jnp.ndarray:
    """Bicubic position-embedding interpolation (frozen_hpt.py:41-70)."""
    if old_grid == new_grid:
        return pos
    cls = pos[:1] if has_cls else None
    grid_pos = pos[1:] if has_cls else pos
    d = grid_pos.shape[-1]
    g = grid_pos.reshape(old_grid, old_grid, d).transpose(2, 0, 1)
    g = resize_bicubic(g, (new_grid, new_grid))
    g = g.transpose(1, 2, 0).reshape(new_grid * new_grid, d)
    return jnp.concatenate([cls, g], 0) if cls is not None else g


def forward(
    params: dict,
    cfg: ViTConfig,
    pixels: jnp.ndarray,
    select_layer: int = -1,
) -> jnp.ndarray:
    """Run the tower, returning hidden states at ``select_layer``.

    ``select_layer`` follows the HF ``hidden_states`` indexing the wrappers
    use: -1 = final layer output **with** the final LayerNorm applied
    (timm/SigLIP convention when the full depth is kept), -2 = output of the
    penultimate block, un-normed (CLIP/LLaVA's ``vision_feature_layer``).

    Args:
      pixels: ``(B, H, W, 3)`` normalised images (NHWC).

    Returns ``(B, seq, D)`` -- including the class token if present
    (callers slice it off per family convention).
    """
    B = pixels.shape[0]
    d = cfg.hidden_size
    x = jax.lax.conv_general_dilated(
        pixels.astype(cfg.dtype),
        params["patch_kernel"].astype(cfg.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    grid_hw = x.shape[1], x.shape[2]
    x = x.reshape(B, -1, d)
    if cfg.patch_bias:
        x = x + params["patch_bias"]
    if cfg.use_class_token:
        cls = jnp.broadcast_to(params["cls_token"], (B, 1, d)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
    pos = params["pos_embed"]
    if grid_hw[0] != cfg.grid or grid_hw[1] != cfg.grid:
        assert grid_hw[0] == grid_hw[1], "non-square resample unsupported"
        pos = resample_pos_embed(pos, cfg.grid, grid_hw[0], cfg.use_class_token)
    x = x + pos.astype(x.dtype)
    if cfg.use_pre_norm:
        x = _ln(x, params["pre_ln_w"], params["pre_ln_b"], cfg.ln_eps)

    H, hd = cfg.num_heads, cfg.head_dim
    S = x.shape[1]
    scale = 1.0 / jnp.sqrt(float(hd))
    use_flash = cfg.flash and jax.default_backend() == "tpu"
    use_fused_mlp = (
        cfg.fused_mlp and jax.default_backend() == "tpu"
        and cfg.act in ("gelu", "gelu_tanh", "quick_gelu")
        and d % 128 == 0 and cfg.mlp_dim % 512 == 0
    )

    def layer(h, lp):
        if use_fused_mlp:
            from flmm_tpu.ops.fused_block import fused_ln_qkv

            qkv = fused_ln_qkv(h, lp["ln1_w"], lp["ln1_b"], lp["wqkv"],
                               lp["bqkv"], eps=cfg.ln_eps)
        else:
            y = _ln(h, lp["ln1_w"], lp["ln1_b"], cfg.ln_eps)
            qkv = y @ lp["wqkv"] + lp["bqkv"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, S, H, hd)
        k = k.reshape(B, S, H, hd)
        v = v.reshape(B, S, H, hd)
        if use_flash:
            from flmm_tpu.ops.sam_flash import plain_flash_attention

            def heads(t):
                return t.transpose(0, 2, 1, 3).reshape(B * H, S, hd)

            o = plain_flash_attention(heads(q), heads(k), heads(v))
            o = o.reshape(B, H, S, hd).transpose(0, 2, 1, 3).reshape(B, S, d)
        else:
            logits = (
                jnp.einsum("bshd,bthd->bhst", q, k,
                           preferred_element_type=jnp.float32)
                * scale
            )
            probs = jax.nn.softmax(logits, axis=-1).astype(h.dtype)
            o = jnp.einsum("bhst,bthd->bshd", probs, v).reshape(B, S, d)
        if use_fused_mlp:
            from flmm_tpu.ops.fused_block import fused_proj_ln_mlp

            h = fused_proj_ln_mlp(
                h, o, lp["wo"], lp["bo"], lp["ln2_w"], lp["ln2_b"],
                lp["w1"], lp["b1"], lp["w2"], lp["b2"], eps=cfg.ln_eps,
                act=cfg.act)
        else:
            h = h + (o @ lp["wo"] + lp["bo"])
            y2 = _ln(h, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)
            h = h + (_act(y2 @ lp["w1"] + lp["b1"], cfg.act) @ lp["w2"]
                     + lp["b2"])
        return h, h

    x_final, hs = jax.lax.scan(layer, x, params["layers"])
    if select_layer in (-1, cfg.num_layers):
        if cfg.final_norm:
            return _ln(x_final, params["final_ln_w"], params["final_ln_b"], cfg.ln_eps)
        return x_final
    idx = select_layer if select_layer >= 0 else cfg.num_layers + select_layer
    return hs[idx]
