"""Shared SAM building blocks (JAX).

Mirrors the behaviours of reference segment_anything/modeling/common.py
(MLPBlock, LayerNorm2d) in NHWC layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def channel_norm(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-6):
    """Reference ``LayerNorm2d``: normalise over the channel axis per pixel.

    Our tensors are NHWC so this is the same reduction as ``layer_norm`` but
    the reference computes variance with the biased estimator over C only --
    identical math, kept separate for clarity at call sites.
    """
    return layer_norm(x, w, b, eps)


def mlp_block(x: jnp.ndarray, p: dict, act: str = "gelu") -> jnp.ndarray:
    from flmm_tpu.ops.quant import dense as qdense

    h = qdense(x, p, "w1") + p["b1"]
    if act == "gelu":
        h = jax.nn.gelu(h, approximate=False)
    elif act == "relu":
        h = jax.nn.relu(h)
    else:
        raise ValueError(act)
    return qdense(h, p, "w2") + p["b2"]


def linear(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    return x @ p["w"] + p["b"]


def mlp(x: jnp.ndarray, layers: list, sigmoid_output: bool = False) -> jnp.ndarray:
    """Reference mask_decoder.MLP: ReLU between layers, none at the end."""
    n = len(layers)
    for i, p in enumerate(layers):
        x = linear(x, p)
        if i < n - 1:
            x = jax.nn.relu(x)
    if sigmoid_output:
        x = jax.nn.sigmoid(x)
    return x


def conv2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    stride: int = 1,
    padding: str | int = 0,
) -> jnp.ndarray:
    """NHWC conv with HWIO kernel."""
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        pad = padding
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv_transpose2d(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None,
    stride: int = 2,
) -> jnp.ndarray:
    """NHWC transposed conv matching torch ConvTranspose2d(k=stride, s=stride)."""
    y = jax.lax.conv_transpose(
        x, kernel.astype(x.dtype), (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
