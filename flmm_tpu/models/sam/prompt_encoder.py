"""SAM prompt encoder (JAX), batched over prompts.

Behavioural spec: reference segment_anything/modeling/prompt_encoder.py --
box corners through a random-Fourier positional encoding plus learned corner
embeddings; dense mask prompts through a small conv downscaler.  Point
prompts are supported for API completeness (SamPredictor parity) though the
F-LMM path only uses boxes+masks+text.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from flmm_tpu.models.sam.common import channel_norm, conv2d


@dataclasses.dataclass(frozen=True)
class PromptEncoderConfig:
    embed_dim: int = 256
    image_embedding_size: int = 64
    input_image_size: int = 1024
    mask_in_chans: int = 16
    ln_eps: float = 1e-6
    dtype: Any = jnp.float32


def init_params(cfg: PromptEncoderConfig, key: jax.Array) -> dict:
    ks = jax.random.split(key, 6)
    d = cfg.embed_dim
    c = cfg.mask_in_chans

    def w(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) / jnp.sqrt(fan_in)).astype(
            cfg.dtype
        )

    return {
        "pe_gaussian": jax.random.normal(ks[0], (2, d // 2), jnp.float32).astype(
            cfg.dtype
        ),
        # [pos point, neg point, box corner 1, box corner 2]
        "point_embeddings": w(ks[1], (4, d), d),
        "not_a_point": w(ks[2], (1, d), d),
        "no_mask": w(ks[3], (1, d), d),
        "mask_down": {
            "k0": w(ks[4], (2, 2, 1, c // 4), 4),
            "b0": jnp.zeros((c // 4,), cfg.dtype),
            "ln0_w": jnp.ones((c // 4,), cfg.dtype),
            "ln0_b": jnp.zeros((c // 4,), cfg.dtype),
            "k1": w(ks[5], (2, 2, c // 4, c), 4 * c // 4),
            "b1": jnp.zeros((c,), cfg.dtype),
            "ln1_w": jnp.ones((c,), cfg.dtype),
            "ln1_b": jnp.zeros((c,), cfg.dtype),
            "k2": w(ks[5], (1, 1, c, d), c),
            "b2": jnp.zeros((d,), cfg.dtype),
        },
    }


def _pe_encode(params: dict, coords01: jnp.ndarray) -> jnp.ndarray:
    """Random-Fourier encoding of [0,1]-normalised coords ``(..., 2)``.

    ``pe_gaussian`` is a frozen BUFFER in the reference (PromptEncoder
    registers it via register_buffer, prompt_encoder.py:181) -- it must
    receive no gradient and no optimizer update even though it lives in
    the trainable tree for checkpoint-layout convenience (the optimizer
    additionally masks it out of AdamW weight decay; train/loop.py)."""
    coords = 2.0 * coords01.astype(jnp.float32) - 1.0
    proj = coords @ jax.lax.stop_gradient(
        params["pe_gaussian"].astype(jnp.float32))
    proj = 2.0 * jnp.pi * proj
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def dense_pe(params: dict, cfg: PromptEncoderConfig) -> jnp.ndarray:
    """Positional grid ``(S, S, D)`` (reference get_dense_pe, NHWC)."""
    s = cfg.image_embedding_size
    y = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    x = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    grid = jnp.stack(jnp.meshgrid(x, y, indexing="xy"), axis=-1)  # (S, S, 2)
    return _pe_encode(params, grid).astype(cfg.dtype)


def embed_boxes(params: dict, cfg: PromptEncoderConfig, boxes: jnp.ndarray):
    """``(M, 4)`` xyxy boxes in input-image pixels -> ``(M, 2, D)``."""
    pts = (boxes.reshape(-1, 2, 2) + 0.5) / cfg.input_image_size
    emb = _pe_encode(params, pts).astype(cfg.dtype)
    corner = params["point_embeddings"]
    emb = emb.at[:, 0, :].add(corner[2])
    emb = emb.at[:, 1, :].add(corner[3])
    return emb


def embed_points(
    params: dict, cfg: PromptEncoderConfig,
    coords: jnp.ndarray, labels: jnp.ndarray, pad: bool,
) -> jnp.ndarray:
    """``(M, N, 2)`` points + ``(M, N)`` labels -> ``(M, N(+1), D)``.

    Labels: 1 positive, 0 negative, -1 padding (reference _embed_points).
    """
    if pad:
        coords = jnp.concatenate(
            [coords, jnp.zeros((coords.shape[0], 1, 2), coords.dtype)], axis=1
        )
        labels = jnp.concatenate(
            [labels, -jnp.ones((labels.shape[0], 1), labels.dtype)], axis=1
        )
    pts = (coords + 0.5) / cfg.input_image_size
    emb = _pe_encode(params, pts).astype(cfg.dtype)
    pe = params["point_embeddings"]
    lab = labels[..., None]
    emb = jnp.where(lab == -1, params["not_a_point"][0], emb)
    emb = emb + jnp.where(lab == 0, pe[0], 0.0)
    emb = emb + jnp.where(lab == 1, pe[1], 0.0)
    return emb


def embed_masks(params: dict, cfg: PromptEncoderConfig, masks: jnp.ndarray):
    """``(M, 256, 256, 1)`` dense prompts -> ``(M, 64, 64, D)``."""
    p = params["mask_down"]
    x = conv2d(masks.astype(cfg.dtype), p["k0"], p["b0"], stride=2)
    x = channel_norm(x, p["ln0_w"], p["ln0_b"], cfg.ln_eps)
    x = jax.nn.gelu(x, approximate=False)
    x = conv2d(x, p["k1"], p["b1"], stride=2)
    x = channel_norm(x, p["ln1_w"], p["ln1_b"], cfg.ln_eps)
    x = jax.nn.gelu(x, approximate=False)
    return conv2d(x, p["k2"], p["b2"])


def no_mask_dense(params: dict, cfg: PromptEncoderConfig, m: int) -> jnp.ndarray:
    s = cfg.image_embedding_size
    return jnp.broadcast_to(
        params["no_mask"].reshape(1, 1, 1, -1), (m, s, s, cfg.embed_dim)
    )
