"""SAM mask decoder (JAX), batched over prompts with padded text tokens.

Behavioural spec: reference segment_anything/modeling/mask_decoder.py --
IoU + 4 mask tokens, two-way transformer, 4x transposed-conv upscaling,
per-token hypernetwork MLPs, IoU-quality MLP head.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from flmm_tpu.models.sam import transformer as twoway
from flmm_tpu.models.sam.common import channel_norm, conv_transpose2d, mlp


@dataclasses.dataclass(frozen=True)
class MaskDecoderConfig:
    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    ln_eps: float = 1e-6
    dtype: Any = jnp.float32
    transformer: twoway.TwoWayConfig = dataclasses.field(
        default_factory=twoway.TwoWayConfig
    )

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask_outputs + 1


def init_params(cfg: MaskDecoderConfig, key: jax.Array) -> dict:
    ks = jax.random.split(key, 8)
    d = cfg.transformer_dim

    def w(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) / jnp.sqrt(fan_in)).astype(
            cfg.dtype
        )

    def mlp_params(k, dims):
        layers = []
        kk = jax.random.split(k, len(dims) - 1)
        for i in range(len(dims) - 1):
            layers.append({
                "w": w(kk[i], (dims[i], dims[i + 1]), dims[i]),
                "b": jnp.zeros((dims[i + 1],), cfg.dtype),
            })
        return layers

    hyper = [
        mlp_params(k, [d, d, d, d // 8])
        for k in jax.random.split(ks[3], cfg.num_mask_tokens)
    ]
    iou_dims = [d] + [cfg.iou_head_hidden_dim] * (cfg.iou_head_depth - 1) + [
        cfg.num_mask_tokens
    ]
    return {
        "iou_token": w(ks[0], (1, d), d),
        "mask_tokens": w(ks[1], (cfg.num_mask_tokens, d), d),
        "transformer": twoway.init_params(cfg.transformer, ks[2]),
        "upscale": {
            "k0": w(ks[4], (2, 2, d, d // 4), d),
            "b0": jnp.zeros((d // 4,), cfg.dtype),
            "ln_w": jnp.ones((d // 4,), cfg.dtype),
            "ln_b": jnp.zeros((d // 4,), cfg.dtype),
            "k1": w(ks[5], (2, 2, d // 4, d // 8), d // 4),
            "b1": jnp.zeros((d // 8,), cfg.dtype),
        },
        "hyper_mlps": hyper,
        "iou_mlp": mlp_params(ks[6], iou_dims),
    }


def forward(
    params: dict,
    cfg: MaskDecoderConfig,
    image_embeddings: jnp.ndarray,
    image_pe: jnp.ndarray,
    sparse_prompts: jnp.ndarray,
    dense_prompts: jnp.ndarray,
    sparse_valid: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Predict masks for a batch of prompt sets sharing one image.

    Args:
      image_embeddings: ``(S, S, D)`` (single image) or ``(M, S, S, D)``.
      image_pe: ``(S, S, D)`` dense positional grid.
      sparse_prompts: ``(M, Ns, D)`` box-corner + text tokens (padded).
      dense_prompts: ``(M, S, S, D)``.
      sparse_valid: ``(M, Ns)`` bool validity of sparse tokens.

    Returns ``(masks (M, num_mask_tokens, 4S, 4S), iou_pred (M, n))`` --
    callers slice multimask/singlemask like the reference (forward:101-107).
    """
    d = cfg.transformer_dim
    m = sparse_prompts.shape[0]
    out_tokens = jnp.concatenate([params["iou_token"], params["mask_tokens"]], axis=0)
    out_tokens = jnp.broadcast_to(out_tokens[None], (m,) + out_tokens.shape)
    tokens = jnp.concatenate([out_tokens, sparse_prompts.astype(cfg.dtype)], axis=1)
    if sparse_valid is not None:
        token_mask = jnp.concatenate(
            [jnp.ones((m, 1 + cfg.num_mask_tokens), bool), sparse_valid], axis=1
        )
    else:
        token_mask = None

    if image_embeddings.ndim == 3:
        src = jnp.broadcast_to(
            image_embeddings[None], (m,) + image_embeddings.shape
        )
    else:
        src = image_embeddings
    src = src + dense_prompts.astype(cfg.dtype)
    s = src.shape[1]
    src_flat = src.reshape(m, s * s, d)
    pe_flat = jnp.broadcast_to(image_pe.reshape(1, s * s, d), (m, s * s, d))

    hs, src_out = twoway.forward(
        params["transformer"], cfg.transformer, src_flat, pe_flat, tokens,
        token_mask=token_mask,
    )
    iou_token_out = hs[:, 0]
    mask_tokens_out = hs[:, 1:1 + cfg.num_mask_tokens]

    up = params["upscale"]
    x = src_out.reshape(m, s, s, d)
    x = conv_transpose2d(x, up["k0"], up["b0"])
    x = channel_norm(x, up["ln_w"], up["ln_b"], cfg.ln_eps)
    x = jax.nn.gelu(x, approximate=False)
    x = conv_transpose2d(x, up["k1"], up["b1"])
    x = jax.nn.gelu(x, approximate=False)  # (M, 4S, 4S, d//8)

    hyper = jnp.stack(
        [mlp(mask_tokens_out[:, i], params["hyper_mlps"][i])
         for i in range(cfg.num_mask_tokens)],
        axis=1,
    )  # (M, n, d//8)
    masks = jnp.einsum(
        "mnc,myxc->mnyx", hyper, x, preferred_element_type=jnp.float32
    ).astype(cfg.dtype)
    iou_pred = mlp(iou_token_out, params["iou_mlp"])
    return masks, iou_pred
