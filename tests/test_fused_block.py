"""Fused LN+MLP+residual kernel vs the unfused reference path."""

import numpy as np
import jax
import jax.numpy as jnp

from flmm_tpu.models.sam.common import layer_norm, mlp_block
from flmm_tpu.ops.fused_block import fused_ln_mlp


def test_fused_ln_mlp_parity_interpret():
    rng = np.random.default_rng(0)
    N, C, F = 512, 128, 1024
    x = jnp.asarray(rng.standard_normal((2, 16, 16, C)).astype(np.float32))
    lw = jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.1 + 1)
    lb = jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.1)
    p = {
        "w1": jnp.asarray(rng.standard_normal((C, F)).astype(np.float32)
                          / np.sqrt(C)),
        "b1": jnp.asarray(rng.standard_normal((F,)).astype(np.float32) * 0.1),
        "w2": jnp.asarray(rng.standard_normal((F, C)).astype(np.float32)
                          / np.sqrt(F)),
        "b2": jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.1),
    }
    got = fused_ln_mlp(x, lw, lb, p["w1"], p["b1"], p["w2"], p["b2"],
                       block_n=128, block_f=256, interpret=True)
    want = x + mlp_block(layer_norm(x, lw, lb), p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


def test_fused_ln_mlp_acts_and_row_padding():
    rng = np.random.default_rng(1)
    C, F = 128, 512
    # N=312 not a multiple of block_n: exercises zero-row padding
    x = jnp.asarray(rng.standard_normal((312, C)).astype(np.float32))
    lw = jnp.ones((C,))
    lb = jnp.zeros((C,))
    p = {
        "w1": jnp.asarray(rng.standard_normal((C, F)).astype(np.float32)
                          / np.sqrt(C)),
        "b1": jnp.zeros((F,)),
        "w2": jnp.asarray(rng.standard_normal((F, C)).astype(np.float32)
                          / np.sqrt(F)),
        "b2": jnp.zeros((C,)),
    }
    import jax as _jax

    for act, ref in (
        ("gelu", lambda v: _jax.nn.gelu(v, approximate=False)),
        ("gelu_tanh", lambda v: _jax.nn.gelu(v, approximate=True)),
        ("quick_gelu", lambda v: v * _jax.nn.sigmoid(1.702 * v)),
    ):
        got = fused_ln_mlp(x, lw, lb, p["w1"], p["b1"], p["w2"], p["b2"],
                           block_n=128, block_f=256, act=act,
                           interpret=True)
        y = layer_norm(x, lw, lb)
        want = x + ref(y @ p["w1"]) @ p["w2"]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4, rtol=1e-4, err_msg=act)


def test_fused_proj_ln_mlp_parity_interpret():
    """Proj-absorbing tail: shortcut + attn@wo+bo -> LN -> MLP -> +res."""
    from flmm_tpu.ops.fused_block import fused_proj_ln_mlp

    rng = np.random.default_rng(3)
    C, F = 128, 1024
    shortcut = jnp.asarray(
        rng.standard_normal((2, 16, 16, C)).astype(np.float32))
    attn = jnp.asarray(
        rng.standard_normal((2, 16, 16, C)).astype(np.float32))
    wo = jnp.asarray(rng.standard_normal((C, C)).astype(np.float32)
                     / np.sqrt(C))
    bo = jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.1)
    lw = jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.1 + 1)
    lb = jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.1)
    p = {
        "w1": jnp.asarray(rng.standard_normal((C, F)).astype(np.float32)
                          / np.sqrt(C)),
        "b1": jnp.asarray(rng.standard_normal((F,)).astype(np.float32) * .1),
        "w2": jnp.asarray(rng.standard_normal((F, C)).astype(np.float32)
                          / np.sqrt(F)),
        "b2": jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * .1),
    }
    got = fused_proj_ln_mlp(
        shortcut, attn, wo, bo, lw, lb, p["w1"], p["b1"], p["w2"], p["b2"],
        block_n=128, block_f=256, interpret=True)
    x = shortcut + attn @ wo + bo
    want = x + mlp_block(layer_norm(x, lw, lb), p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=1e-4)


def test_fused_ln_qkv_parity_interpret():
    from flmm_tpu.ops.fused_block import fused_ln_qkv

    rng = np.random.default_rng(4)
    C, P = 128, 384
    # N=312 not a multiple of block_n: exercises zero-row padding
    x = jnp.asarray(rng.standard_normal((312, C)).astype(np.float32))
    lw = jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.1 + 1)
    lb = jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.standard_normal((C, P)).astype(np.float32)
                    / np.sqrt(C))
    b = jnp.asarray(rng.standard_normal((P,)).astype(np.float32) * 0.1)
    got = fused_ln_qkv(x, lw, lb, w, b, block_n=128, interpret=True)
    want = layer_norm(x, lw, lb) @ w + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)
