"""Int8 weight quantization for frozen towers.

The v5e MXU runs int8 x int8 -> int32 at twice the bf16 rate, and int8
weights halve the HBM weight traffic.  Frozen towers (the SAM image
encoder, reference mask_refiner.py:30 freezes it) never see gradients, so
their projections can run quantized without touching the training math:

* weights: per-output-channel symmetric int8 (``scale = max|w| / 127``),
  computed once at load time;
* activations: per-token dynamic symmetric int8, computed on the fly —
  a VPU-cheap rowwise max/round that XLA fuses into the surrounding ops.

This is W8A8 dynamic quantization; accuracy is validated against the f32
path in tests/test_quant.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8 quantization of a (in, out) matrix.

    Returns ``(w_q int8 (in, out), scale f32 (out,))``.
    """
    wf = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.abs(wf).max(axis=0), 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def int8_matmul(
    x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray
) -> jnp.ndarray:
    """``x @ dequant(w_q)`` with dynamic per-token activation quantization.

    Args:
      x: ``(..., in)`` activations (any float dtype).
      w_q: ``(in, out)`` int8 weights.
      w_scale: ``(out,)`` f32 per-channel scales.

    Returns ``(..., out)`` in ``x.dtype``.
    """
    xf = x.astype(jnp.float32)
    x_scale = jnp.maximum(jnp.abs(xf).max(axis=-1, keepdims=True), 1e-8) / 127.0
    x_q = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q, w_q,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * x_scale * w_scale).astype(x.dtype)


def dense(x: jnp.ndarray, p: dict, name: str) -> jnp.ndarray:
    """Projection that transparently uses the int8 path when the param dict
    carries quantized weights (``<name>_q`` / ``<name>_s``)."""
    w_q = p.get(name + "_q")
    if w_q is not None:
        return int8_matmul(x, w_q, p[name + "_s"])
    return x @ p[name]
