"""Whole-block fused window layer (ops/window_block.py): interpret-mode
parity against a plain einsum/layernorm composition of the reference
block semantics (segment_anything image_encoder.py Block:119-241)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flmm_tpu.ops.window_block import (
    scaled_qkv_weights, window_block, window_rel_bias_from_x,
)


def _ln(x, w, b, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def _gelu(x):
    from scipy.special import erf

    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


def _ref_tail(x, qkv_std, bias_hw_raw, wo, bo, ln2w, ln2b, w1, b1, w2, b2,
              side, nh, hd):
    """Reference block tail from STANDARD-layout qkv: per-window
    attention with decomposed rel-pos + proj + LN2 + MLP, f64 numpy."""
    NW, T, C = x.shape
    q, k, v = np.split(qkv_std, 3, axis=-1)

    def heads(t):
        return t.reshape(NW, T, nh, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    scale = 1.0 / np.sqrt(hd)
    s = np.einsum("whqd,whkd->whqk", q * scale, k)
    s = s + bias_hw_raw  # (NW, nh, T, T)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    o = np.einsum("whqk,whkd->whqd", p, v)
    o = o.transpose(0, 2, 1, 3).reshape(NW, T, C)
    xr = x + o @ wo + bo
    y = _ln(xr, ln2w, ln2b)
    return xr + _gelu(y @ w1 + b1) @ w2 + b2


@pytest.mark.parametrize("bias_padded", [False, True])
def test_window_block_tail_parity_interpret(bias_padded):
    rng = np.random.default_rng(0)
    side, nh, hd = 7, 4, 16
    T, C, F = side * side, 4 * 16, 128
    NW = 3

    def r(*shape, s=0.3):
        return rng.standard_normal(shape).astype(np.float32) * s

    x = r(NW, T, C)
    wqkv, bqkv = r(C, 3 * C, s=0.2), r(3 * C, s=0.1)
    wo, bo = r(C, C, s=0.2), r(C, s=0.1)
    w1, b1 = r(C, F, s=0.2), r(F, s=0.1)
    w2, b2 = r(F, C, s=0.2), r(C, s=0.1)
    ln1w, ln1b = 1 + r(C, s=0.1), r(C, s=0.1)
    ln2w, ln2b = 1 + r(C, s=0.1), r(C, s=0.1)
    rel_h, rel_w = r(2 * side - 1, hd, s=0.1), r(2 * side - 1, hd, s=0.1)

    # reference: standard-layout qkv from LN1
    y = _ln(x, ln1w, ln1b)
    qkv_std = y @ wqkv + bqkv
    q_std = np.split(qkv_std, 3, axis=-1)[0].reshape(NW, side, side, nh, hd)
    coords = np.arange(side)[:, None] - np.arange(side)[None, :] + side - 1
    rh, rw = rel_h[coords], rel_w[coords]
    bh = np.einsum("wyxhd,ykd->whyxk", q_std, rh)
    bw = np.einsum("wyxhd,xkd->whyxk", q_std, rw)
    bias_full = (bh[..., :, None] + bw[..., None, :]).reshape(
        NW, nh, T, T)
    want = _ref_tail(x, qkv_std, bias_full, wo, bo, ln2w, ln2b,
                     w1, b1, w2, b2, side, nh, hd)

    # fused path: whole-block kernel (in-kernel LN1+qkv) + bias from x
    w_s, b_s = scaled_qkv_weights(jnp.asarray(wqkv), jnp.asarray(bqkv),
                                  nh, hd)
    bias = window_rel_bias_from_x(
        jnp.asarray(x), None, jnp.asarray(ln1w), jnp.asarray(ln1b),
        w_s[:, :C], b_s[:C], jnp.asarray(rel_h), jnp.asarray(rel_w),
        side, nh, hd)
    got = window_block(
        jnp.asarray(x), bias, None, jnp.asarray(ln1w), jnp.asarray(ln1b),
        w_s, b_s, jnp.asarray(wo),
        jnp.asarray(bo), jnp.asarray(ln2w), jnp.asarray(ln2b),
        jnp.asarray(w1), jnp.asarray(b1), jnp.asarray(w2), jnp.asarray(b2),
        side, nh, n_f=2, group=1, interpret=True, bias_padded=bias_padded)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-3, rtol=1e-3)
    corr = np.corrcoef(np.asarray(got).ravel(), want.ravel())[0, 1]
    assert corr > 0.99999


@pytest.mark.parametrize("img_size", [64, 112])
def test_encoder_window_block_fused_parity(img_size):
    """Full encoder: window_block_fused path (window-major runs + the
    whole-block kernel through the interpreter) == the plain XLA path.
    img 64: grid 8 with window 7 -> pad to 14 (geometric pad masking);
    img 112: grid 14 divides evenly (maskless fast path).  Both exercise
    the window->global->window transitions."""
    import dataclasses

    from flmm_tpu.models.sam import image_encoder as enc
    from flmm_tpu.ops import window_block as wb

    cfg = enc.SamEncoderConfig(
        img_size=img_size, patch_size=8, embed_dim=128, depth=4,
        num_heads=2,
        out_chans=32, window_size=7, global_attn_indexes=(1, 3),
        dtype=jnp.float32)
    params = enc.init_params(cfg, jax.random.key(0))
    # non-trivial rel-pos tables (init is zeros)
    rng = np.random.default_rng(2)
    for bp in params["blocks"]:
        for k in ("rel_pos_h", "rel_pos_w"):
            bp[k] = jnp.asarray(
                rng.standard_normal(bp[k].shape).astype(np.float32) * 0.1)
    pixels = jnp.asarray(rng.standard_normal(
        (2, img_size, img_size, 3)).astype(np.float32) * 0.5)

    want = enc.forward(params, cfg, pixels)
    cfg_wb = dataclasses.replace(cfg, window_block_fused=True)
    wb.INTERPRET = True
    try:
        got = enc.forward(params, cfg_wb, pixels)
    finally:
        wb.INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=1e-3)
    corr = np.corrcoef(np.asarray(got).ravel(),
                       np.asarray(want).ravel())[0, 1]
    assert corr > 0.99999

# heavy (jit compiles / torch oracles) -- excluded from the fast path
# (pytest -m "not slow"; see README Testing strategy)
pytestmark = pytest.mark.slow
