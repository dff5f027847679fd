"""Whole-block fused GLOBAL layer (ops/global_block.py): interpret-mode
parity against a plain einsum/layernorm composition of the reference
block semantics (segment_anything image_encoder.py Block:119-241 with
global attention, add_decomposed_rel_pos:325)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flmm_tpu.ops.global_block import (
    global_attn_block, global_rel_bias_from_x,
)
from flmm_tpu.ops.window_block import scaled_qkv_weights


def _ln(x, w, b, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def test_global_attn_block_parity_interpret():
    rng = np.random.default_rng(1)
    side, nh, hd = 8, 2, 16
    S, C = side * side, 2 * 16
    B = 2

    def r(*shape, s=0.3):
        return rng.standard_normal(shape).astype(np.float32) * s

    x = r(B, S, C)
    wqkv, bqkv = r(C, 3 * C, s=0.2), r(3 * C, s=0.1)
    wo, bo = r(C, C, s=0.2), r(C, s=0.1)
    ln1w, ln1b = 1 + r(C, s=0.1), r(C, s=0.1)
    rel_h, rel_w = r(2 * side - 1, hd, s=0.1), r(2 * side - 1, hd, s=0.1)

    # reference: LN1 + qkv + global attention with decomposed rel-pos
    # + out-proj + residual, f64 numpy
    y = _ln(x.astype(np.float64), ln1w, ln1b)
    qkv = y @ wqkv + bqkv
    q, k, v = np.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q), heads(k), heads(v)
    s = np.einsum("bhqd,bhkd->bhqk", qh / np.sqrt(hd), kh)
    q_std = q.reshape(B, side, side, nh, hd)
    coords = np.arange(side)[:, None] - np.arange(side)[None, :] + side - 1
    rh, rw = rel_h[coords], rel_w[coords]
    bh = np.einsum("byxhd,ykd->bhyxk", q_std, rh)
    bw = np.einsum("byxhd,xkd->bhyxk", q_std, rw)
    bias_full = (bh[..., :, None] + bw[..., None, :]).reshape(B, nh, S, S)
    s = s + bias_full
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    o = np.einsum("bhqk,bhkd->bhqd", p, vh)
    o = o.transpose(0, 2, 1, 3).reshape(B, S, C)
    want = x + o @ wo + bo  # pre-LN2 residual: what the kernel returns

    # fused path: bias rows from x, then the one-kernel attention block
    w_s, b_s = scaled_qkv_weights(jnp.asarray(wqkv), jnp.asarray(bqkv),
                                  nh, hd)
    bias = global_rel_bias_from_x(
        jnp.asarray(x), jnp.asarray(ln1w), jnp.asarray(ln1b),
        w_s[:, :C], b_s[:C], jnp.asarray(rel_h), jnp.asarray(rel_w),
        side, nh, hd)
    got = global_attn_block(
        jnp.asarray(x), bias, jnp.asarray(ln1w), jnp.asarray(ln1b),
        w_s, b_s, jnp.asarray(wo), jnp.asarray(bo),
        side, nh, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-3, rtol=1e-3)
    corr = np.corrcoef(np.asarray(got).ravel(), want.ravel())[0, 1]
    assert corr > 0.99999


def test_encoder_global_block_fused_parity():
    """Full encoder with side-16 global grid (S=256, the %256 gate):
    _global_block_fused (interpret) == the plain XLA path, across
    window->global->window transitions."""
    from flmm_tpu.models.sam import image_encoder as enc
    from flmm_tpu.ops import global_block as gb
    from flmm_tpu.ops import window_block as wb

    cfg = enc.SamEncoderConfig(
        img_size=128, patch_size=8, embed_dim=128, depth=4, num_heads=2,
        out_chans=32, window_size=7, global_attn_indexes=(1, 3),
        dtype=jnp.float32)
    params = enc.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(3)
    for bp in params["blocks"]:
        for key in ("rel_pos_h", "rel_pos_w"):
            bp[key] = jnp.asarray(
                rng.standard_normal(bp[key].shape).astype(np.float32) * 0.1)
    pixels = jnp.asarray(rng.standard_normal(
        (2, 128, 128, 3)).astype(np.float32) * 0.5)

    want = enc.forward(params, cfg, pixels)
    cfg_wb = dataclasses.replace(cfg, window_block_fused=True,
                                 global_block_fused=True)
    wb.INTERPRET = True
    gb.INTERPRET = True
    try:
        got = enc.forward(params, cfg_wb, pixels)
    finally:
        wb.INTERPRET = False
        gb.INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=1e-3)
    corr = np.corrcoef(np.asarray(got).ravel(),
                       np.asarray(want).ravel())[0, 1]
    assert corr > 0.99999

# heavy (jit compiles / torch oracles) -- excluded from the fast path
# (pytest -m "not slow"; see README Testing strategy)
pytestmark = pytest.mark.slow
