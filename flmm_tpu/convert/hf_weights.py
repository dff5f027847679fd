"""HF checkpoint -> flmm_tpu parameter-tree converters.

These consume a flat ``name -> array`` state dict (torch tensors or numpy
arrays; torch stays a host-side conversion dependency only) and emit the
stacked-layer pytrees used by the JAX models.  Covers the Llama family
(Llama/Vicuna/DeepSeek-LLM/Mistral/Gemma share the layout).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np
import jax.numpy as jnp

from flmm_tpu.models.llm.decoder import DecoderConfig
from flmm_tpu.models.vision.vit import ViTConfig


def _np(x: Any) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().to("cpu").float().numpy()
    return np.asarray(x)


def llama_decoder_params(
    sd: Mapping[str, Any],
    cfg: DecoderConfig,
    prefix: str = "model.",
    dtype: Any = None,
) -> dict:
    """Convert an HF ``LlamaForCausalLM``-layout state dict.

    HF stores ``Linear.weight`` as ``(out, in)``; our matmuls use ``(in,
    out)`` so every weight is transposed.  Layer tensors are stacked on a
    leading layer axis for ``lax.scan``.
    """
    dtype = dtype or cfg.dtype
    L = cfg.num_layers

    def get(name):
        return _np(sd[name])

    def stack(fmt, transpose=True):
        ws = [get(fmt.format(i=i)) for i in range(L)]
        arr = np.stack([w.T if transpose else w for w in ws])
        return jnp.asarray(arr, dtype)

    layers = {
        "ln1": stack(prefix + "layers.{i}.input_layernorm.weight", transpose=False),
        "ln2": stack(
            prefix + "layers.{i}.post_attention_layernorm.weight", transpose=False
        ),
        "wq": stack(prefix + "layers.{i}.self_attn.q_proj.weight"),
        "wk": stack(prefix + "layers.{i}.self_attn.k_proj.weight"),
        "wv": stack(prefix + "layers.{i}.self_attn.v_proj.weight"),
        "wo": stack(prefix + "layers.{i}.self_attn.o_proj.weight"),
    }
    if cfg.num_experts > 0:
        # Mixtral block_sparse_moe: w1=gate, w3=up, w2=down
        E = cfg.num_experts

        def estack(w_name):
            per_layer = []
            for i in range(L):
                per_layer.append(np.stack([
                    get(prefix + f"layers.{i}.block_sparse_moe.experts."
                                 f"{e}.{w_name}.weight").T
                    for e in range(E)
                ]))
            return jnp.asarray(np.stack(per_layer), dtype)

        layers["router"] = stack(
            prefix + "layers.{i}.block_sparse_moe.gate.weight")
        layers["w_gate"] = estack("w1")
        layers["w_up"] = estack("w3")
        layers["w_down"] = estack("w2")
    else:
        layers["w_gate"] = stack(prefix + "layers.{i}.mlp.gate_proj.weight")
        layers["w_up"] = stack(prefix + "layers.{i}.mlp.up_proj.weight")
        layers["w_down"] = stack(prefix + "layers.{i}.mlp.down_proj.weight")
    if cfg.attn_bias:
        layers["bq"] = stack(prefix + "layers.{i}.self_attn.q_proj.bias", False)
        layers["bk"] = stack(prefix + "layers.{i}.self_attn.k_proj.bias", False)
        layers["bv"] = stack(prefix + "layers.{i}.self_attn.v_proj.bias", False)

    params = {
        "embed": jnp.asarray(get(prefix + "embed_tokens.weight"), dtype),
        "layers": layers,
        "final_norm": jnp.asarray(get(prefix + "norm.weight"), dtype),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = jnp.asarray(get("lm_head.weight").T, dtype)
    return params


def clip_vit_params(
    sd: Mapping[str, Any],
    cfg: ViTConfig,
    prefix: str = "vision_model.",
    dtype: Any = None,
) -> dict:
    """Convert an HF ``CLIPVisionModel`` state dict (LLaVA/MGM towers)."""
    dtype = dtype or cfg.dtype
    L = cfg.num_layers

    def get(name):
        return _np(sd[name])

    def stack(fmt, transpose=True):
        ws = [get(fmt.format(i=i)) for i in range(L)]
        return jnp.asarray(
            np.stack([w.T if transpose else w for w in ws]), dtype
        )

    enc = prefix + "encoder.layers.{i}."
    wq = stack(enc + "self_attn.q_proj.weight")
    wk = stack(enc + "self_attn.k_proj.weight")
    wv = stack(enc + "self_attn.v_proj.weight")
    bq = stack(enc + "self_attn.q_proj.bias", False)
    bk = stack(enc + "self_attn.k_proj.bias", False)
    bv = stack(enc + "self_attn.v_proj.bias", False)

    params = {
        # HF conv kernel is (D, 3, P, P) -> HWIO
        "patch_kernel": jnp.asarray(
            get(prefix + "embeddings.patch_embedding.weight").transpose(2, 3, 1, 0),
            dtype,
        ),
        "pos_embed": jnp.asarray(
            get(prefix + "embeddings.position_embedding.weight"), dtype
        ),
        "cls_token": jnp.asarray(get(prefix + "embeddings.class_embedding"), dtype),
        "pre_ln_w": jnp.asarray(get(prefix + "pre_layrnorm.weight"), dtype),
        "pre_ln_b": jnp.asarray(get(prefix + "pre_layrnorm.bias"), dtype),
        "layers": {
            "ln1_w": stack(enc + "layer_norm1.weight", False),
            "ln1_b": stack(enc + "layer_norm1.bias", False),
            "ln2_w": stack(enc + "layer_norm2.weight", False),
            "ln2_b": stack(enc + "layer_norm2.bias", False),
            "wqkv": jnp.concatenate([wq, wk, wv], axis=-1),
            "bqkv": jnp.concatenate([bq, bk, bv], axis=-1),
            "wo": stack(enc + "self_attn.out_proj.weight"),
            "bo": stack(enc + "self_attn.out_proj.bias", False),
            "w1": stack(enc + "mlp.fc1.weight"),
            "b1": stack(enc + "mlp.fc1.bias", False),
            "w2": stack(enc + "mlp.fc2.weight"),
            "b2": stack(enc + "mlp.fc2.bias", False),
        },
        "final_ln_w": jnp.asarray(get(prefix + "post_layernorm.weight"), dtype),
        "final_ln_b": jnp.asarray(get(prefix + "post_layernorm.bias"), dtype),
    }
    if cfg.patch_bias and prefix + "embeddings.patch_embedding.bias" in sd:
        params["patch_bias"] = jnp.asarray(
            get(prefix + "embeddings.patch_embedding.bias"), dtype
        )
    return params


def siglip_vit_params(
    sd: Mapping[str, Any],
    cfg: ViTConfig,
    prefix: str = "vision_model.",
    dtype: Any = None,
) -> dict:
    """Convert an HF ``SiglipVisionModel`` state dict (HPT-1.5 tower; also the
    layout DeepSeekVL's timm-style trunk maps onto)."""
    dtype = dtype or cfg.dtype
    L = cfg.num_layers

    def get(name):
        return _np(sd[name])

    def stack(fmt, transpose=True):
        ws = [get(fmt.format(i=i)) for i in range(L)]
        return jnp.asarray(np.stack([w.T if transpose else w for w in ws]), dtype)

    enc = prefix + "encoder.layers.{i}."
    wq = stack(enc + "self_attn.q_proj.weight")
    wk = stack(enc + "self_attn.k_proj.weight")
    wv = stack(enc + "self_attn.v_proj.weight")
    bq = stack(enc + "self_attn.q_proj.bias", False)
    bk = stack(enc + "self_attn.k_proj.bias", False)
    bv = stack(enc + "self_attn.v_proj.bias", False)
    return {
        "patch_kernel": jnp.asarray(
            get(prefix + "embeddings.patch_embedding.weight").transpose(2, 3, 1, 0),
            dtype,
        ),
        "patch_bias": jnp.asarray(get(prefix + "embeddings.patch_embedding.bias"), dtype),
        "pos_embed": jnp.asarray(
            get(prefix + "embeddings.position_embedding.weight"), dtype
        ),
        "layers": {
            "ln1_w": stack(enc + "layer_norm1.weight", False),
            "ln1_b": stack(enc + "layer_norm1.bias", False),
            "ln2_w": stack(enc + "layer_norm2.weight", False),
            "ln2_b": stack(enc + "layer_norm2.bias", False),
            "wqkv": jnp.concatenate([wq, wk, wv], axis=-1),
            "bqkv": jnp.concatenate([bq, bk, bv], axis=-1),
            "wo": stack(enc + "self_attn.out_proj.weight"),
            "bo": stack(enc + "self_attn.out_proj.bias", False),
            "w1": stack(enc + "mlp.fc1.weight"),
            "b1": stack(enc + "mlp.fc1.bias", False),
            "w2": stack(enc + "mlp.fc2.weight"),
            "b2": stack(enc + "mlp.fc2.bias", False),
        },
        "final_ln_w": jnp.asarray(get(prefix + "post_layernorm.weight"), dtype),
        "final_ln_b": jnp.asarray(get(prefix + "post_layernorm.bias"), dtype),
    }


def eva_vit_params(
    sd: Mapping[str, Any], cfg: ViTConfig, dtype: Any = None
) -> dict:
    """Convert the EVA-G trunk MGM's alternative tower uses (reference
    mgm/model/multimodal_encoder/eva_encoder.py): fused qkv with separate
    q_bias/v_bias and an implicit zero k bias; class token; abs pos embeds;
    final LayerNorm."""
    dtype = dtype or cfg.dtype
    L = cfg.num_layers

    def get(name):
        return _np(sd[name])

    def stack(fmt, transpose=True):
        ws = [get(fmt.format(i=i)) for i in range(L)]
        return jnp.asarray(np.stack([w.T if transpose else w for w in ws]), dtype)

    d3 = get("blocks.0.attn.qkv.weight").shape[0]
    d = d3 // 3
    bqkv = []
    for i in range(L):
        qb = get(f"blocks.{i}.attn.q_bias")
        vb = get(f"blocks.{i}.attn.v_bias")
        bqkv.append(np.concatenate([qb, np.zeros_like(qb), vb]))
    pos = get("pos_embed")
    if pos.ndim == 3:
        pos = pos[0]
    # The vendored EVA model has no final norm (eva_encoder.py:285-287;
    # the checkpoint's norm.* keys are dropped by strict=False at :469) --
    # only attach final-LN weights when the config actually applies them.
    final = ({"final_ln_w": jnp.asarray(get("norm.weight"), dtype),
              "final_ln_b": jnp.asarray(get("norm.bias"), dtype)}
             if cfg.final_norm else {})
    return {
        **final,
        "patch_kernel": jnp.asarray(
            get("patch_embed.proj.weight").transpose(2, 3, 1, 0), dtype),
        "patch_bias": jnp.asarray(get("patch_embed.proj.bias"), dtype),
        "cls_token": jnp.asarray(get("cls_token").reshape(-1), dtype),
        "pos_embed": jnp.asarray(pos, dtype),
        "layers": {
            "ln1_w": stack("blocks.{i}.norm1.weight", False),
            "ln1_b": stack("blocks.{i}.norm1.bias", False),
            "ln2_w": stack("blocks.{i}.norm2.weight", False),
            "ln2_b": stack("blocks.{i}.norm2.bias", False),
            "wqkv": stack("blocks.{i}.attn.qkv.weight"),
            "bqkv": jnp.asarray(np.stack(bqkv), dtype),
            "wo": stack("blocks.{i}.attn.proj.weight"),
            "bo": stack("blocks.{i}.attn.proj.bias", False),
            "w1": stack("blocks.{i}.mlp.fc1.weight"),
            "b1": stack("blocks.{i}.mlp.fc1.bias", False),
            "w2": stack("blocks.{i}.mlp.fc2.weight"),
            "b2": stack("blocks.{i}.mlp.fc2.bias", False),
        },
    }


def timm_siglip_vit_params(
    sd: Mapping[str, Any], cfg: ViTConfig, dtype: Any = None
) -> dict:
    """Convert the timm-style SigLIP trunk DeepSeekVL vendors
    (reference deepseek_vl/models/siglip_vit.py:259): fused qkv, keys like
    ``blocks.{i}.attn.qkv.weight``; attention-pool head ignored."""
    dtype = dtype or cfg.dtype
    L = cfg.num_layers

    def get(name):
        return _np(sd[name])

    def stack(fmt, transpose=True):
        ws = [get(fmt.format(i=i)) for i in range(L)]
        return jnp.asarray(np.stack([w.T if transpose else w for w in ws]), dtype)

    pos = get("pos_embed")
    if pos.ndim == 3:
        pos = pos[0]
    return {
        "patch_kernel": jnp.asarray(
            get("patch_embed.proj.weight").transpose(2, 3, 1, 0), dtype
        ),
        "patch_bias": jnp.asarray(get("patch_embed.proj.bias"), dtype),
        "pos_embed": jnp.asarray(pos, dtype),
        "layers": {
            "ln1_w": stack("blocks.{i}.norm1.weight", False),
            "ln1_b": stack("blocks.{i}.norm1.bias", False),
            "ln2_w": stack("blocks.{i}.norm2.weight", False),
            "ln2_b": stack("blocks.{i}.norm2.bias", False),
            "wqkv": stack("blocks.{i}.attn.qkv.weight"),
            "bqkv": stack("blocks.{i}.attn.qkv.bias", False),
            "wo": stack("blocks.{i}.attn.proj.weight"),
            "bo": stack("blocks.{i}.attn.proj.bias", False),
            "w1": stack("blocks.{i}.mlp.fc1.weight"),
            "b1": stack("blocks.{i}.mlp.fc1.bias", False),
            "w2": stack("blocks.{i}.mlp.fc2.weight"),
            "b2": stack("blocks.{i}.mlp.fc2.bias", False),
        },
        "final_ln_w": jnp.asarray(get("norm.weight"), dtype),
        "final_ln_b": jnp.asarray(get("norm.bias"), dtype),
    }
