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
        "w_gate": stack(prefix + "layers.{i}.mlp.gate_proj.weight"),
        "w_up": stack(prefix + "layers.{i}.mlp.up_proj.weight"),
        "w_down": stack(prefix + "layers.{i}.mlp.down_proj.weight"),
    }
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
