"""SAM two-way transformer (JAX), with optional sparse-token key masking.

Behavioural spec: reference segment_anything/modeling/transformer.py.  Our
addition: every attention that uses the prompt tokens as *keys* accepts a
validity mask so variable-length text-prompt embeddings (reference
mask_refiner.py:100-102 appends them un-padded in a python loop) can be
padded to a static width and batched across masks.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from flmm_tpu.models.sam.common import layer_norm, linear, mlp_block


@dataclasses.dataclass(frozen=True)
class TwoWayConfig:
    depth: int = 2
    embed_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    ln_eps: float = 1e-5  # torch nn.LayerNorm default
    dtype: Any = jnp.float32


def _attn_params(key, d, internal, dtype):
    k1, k2, k3, k4 = jax.random.split(key, 4)

    def w(k, i, o):
        return (jax.random.normal(k, (i, o), jnp.float32) / jnp.sqrt(i)).astype(dtype)

    return {
        "q": {"w": w(k1, d, internal), "b": jnp.zeros((internal,), dtype)},
        "k": {"w": w(k2, d, internal), "b": jnp.zeros((internal,), dtype)},
        "v": {"w": w(k3, d, internal), "b": jnp.zeros((internal,), dtype)},
        "out": {"w": w(k4, internal, d), "b": jnp.zeros((d,), dtype)},
    }


def init_params(cfg: TwoWayConfig, key: jax.Array) -> dict:
    d = cfg.embed_dim
    internal = d // cfg.attention_downsample_rate
    keys = jax.random.split(key, cfg.depth + 1)

    def ln():
        return jnp.ones((d,), cfg.dtype), jnp.zeros((d,), cfg.dtype)

    layers = []
    for i in range(cfg.depth):
        ks = jax.random.split(keys[i], 6)
        ln1w, ln1b = ln()
        ln2w, ln2b = ln()
        ln3w, ln3b = ln()
        ln4w, ln4b = ln()
        layers.append({
            "self_attn": _attn_params(ks[0], d, d, cfg.dtype),
            "cross_t2i": _attn_params(ks[1], d, internal, cfg.dtype),
            "cross_i2t": _attn_params(ks[2], d, internal, cfg.dtype),
            "mlp": {
                "w1": (jax.random.normal(ks[3], (d, cfg.mlp_dim), jnp.float32)
                       / jnp.sqrt(d)).astype(cfg.dtype),
                "b1": jnp.zeros((cfg.mlp_dim,), cfg.dtype),
                "w2": (jax.random.normal(ks[4], (cfg.mlp_dim, d), jnp.float32)
                       / jnp.sqrt(cfg.mlp_dim)).astype(cfg.dtype),
                "b2": jnp.zeros((d,), cfg.dtype),
            },
            "ln1_w": ln1w, "ln1_b": ln1b,
            "ln2_w": ln2w, "ln2_b": ln2b,
            "ln3_w": ln3w, "ln3_b": ln3b,
            "ln4_w": ln4w, "ln4_b": ln4b,
        })
    fw, fb = ln()
    return {
        "layers": layers,
        "final_attn": _attn_params(keys[-1], d, internal, cfg.dtype),
        "final_ln_w": fw, "final_ln_b": fb,
    }


def attention(
    p: dict,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    key_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Reference transformer.Attention with optional boolean key mask.

    q/k/v: ``(B, N, D)``; key_mask: ``(B, Nk)`` True = attend.
    """
    q = linear(q, p["q"])
    k = linear(k, p["k"])
    v = linear(v, p["v"])
    B, Nq, C = q.shape
    hd = C // num_heads
    qh = q.reshape(B, Nq, num_heads, hd)
    kh = k.reshape(B, k.shape[1], num_heads, hd)
    vh = v.reshape(B, v.shape[1], num_heads, hd)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) / jnp.sqrt(float(hd))
    if key_mask is not None:
        bias = jnp.where(key_mask[:, None, None, :], 0.0, jnp.finfo(jnp.float32).min)
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(B, Nq, C)
    return linear(out, p["out"])


def forward(
    params: dict,
    cfg: TwoWayConfig,
    image_embedding: jnp.ndarray,
    image_pe: jnp.ndarray,
    point_embedding: jnp.ndarray,
    token_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run the two-way transformer.

    Args:
      image_embedding: ``(B, N_img, D)`` flattened image tokens (+dense
        prompts already added).
      image_pe: ``(B, N_img, D)``.
      point_embedding: ``(B, N_tok, D)`` output+sparse prompt tokens.
      token_mask: ``(B, N_tok)`` True for real tokens (output tokens and box
        corners are always real; padded text-prompt slots are False).

    Returns (queries, keys) like the reference.
    """
    nh = cfg.num_heads
    queries = point_embedding
    keys = image_embedding
    for i, lp in enumerate(params["layers"]):
        if i == 0:
            q_in = queries
            attn_out = attention(lp["self_attn"], q_in, q_in, queries, nh,
                                 key_mask=token_mask)
            queries = attn_out  # skip_first_layer_pe: queries = self_attn out
        else:
            q = queries + point_embedding
            attn_out = attention(lp["self_attn"], q, q, queries, nh,
                                 key_mask=token_mask)
            queries = queries + attn_out
        queries = layer_norm(queries, lp["ln1_w"], lp["ln1_b"], cfg.ln_eps)

        q = queries + point_embedding
        k = keys + image_pe
        attn_out = attention(lp["cross_t2i"], q, k, keys, nh)
        queries = queries + attn_out
        queries = layer_norm(queries, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)

        queries = queries + mlp_block(queries, lp["mlp"], act="relu")
        queries = layer_norm(queries, lp["ln3_w"], lp["ln3_b"], cfg.ln_eps)

        q = queries + point_embedding
        k = keys + image_pe
        attn_out = attention(lp["cross_i2t"], k, q, queries, nh,
                             key_mask=token_mask)
        keys = keys + attn_out
        keys = layer_norm(keys, lp["ln4_w"], lp["ln4_b"], cfg.ln_eps)

    q = queries + point_embedding
    k = keys + image_pe
    attn_out = attention(params["final_attn"], q, k, keys, nh)
    queries = queries + attn_out
    queries = layer_norm(queries, params["final_ln_w"], params["final_ln_b"],
                         cfg.ln_eps)
    return queries, keys
