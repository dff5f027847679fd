"""GPipe pipeline parallelism (parallel/pipeline.py) vs single-program."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from flmm_tpu.models.llm.decoder import (
    DecoderConfig, embed_tokens, forward_capture, init_params,
)
from flmm_tpu.parallel.pipeline import pipeline_forward_capture


def _setup():
    cfg = DecoderConfig(
        vocab_size=64, hidden_size=32, num_layers=4, num_heads=4,
        num_kv_heads=2, head_dim=8, intermediate_size=64, dtype=jnp.float32,
    )
    params = init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    B, S, Mk = 4, 12, 3
    ids = jnp.asarray(rng.integers(0, 64, (B, S)), jnp.int32)
    embeds = embed_tokens(params, cfg, ids)
    mask = jnp.asarray(rng.random((B, S)) > 0.1)
    mm = jnp.asarray(rng.random((B, S, Mk)) * (rng.random((B, S, Mk)) > 0.5),
                     jnp.float32)
    w = jax.nn.softmax(jnp.asarray(rng.normal(size=(cfg.num_layers,)),
                                   jnp.float32))
    return cfg, params, embeds, mask, mm, w


def test_pipeline_matches_forward_capture():
    cfg, params, embeds, mask, mm, w = _setup()
    img_start, n_img = 2, 5
    want = forward_capture(params, cfg, embeds, mask, img_start, n_img,
                           merge_matrix=mm, layer_weights=w)

    mesh = Mesh(np.array(jax.devices()[:4]), ("model",))
    for n_mb in (1, 2, 4):
        got = jax.jit(
            lambda p, e, m, t: pipeline_forward_capture(
                p, cfg, e, m, img_start, n_img, mesh=mesh,
                n_microbatches=n_mb, merge_matrix=t, layer_weights=w)
        )(params, embeds, mask, mm)
        for key in ("attn", "hidden", "last_hidden"):
            np.testing.assert_allclose(
                np.asarray(got[key]), np.asarray(want[key]),
                atol=2e-5, err_msg=f"{key} n_mb={n_mb}")


def test_pipeline_raw_capture_and_stages2():
    """merge_matrix=None (raw capture) on a 2-stage pipeline."""
    cfg, params, embeds, mask, _, w = _setup()
    img_start, n_img = 1, 4
    want = forward_capture(params, cfg, embeds, mask, img_start, n_img,
                           layer_weights=w)
    mesh = Mesh(np.array(jax.devices()[:2]), ("model",))
    got = jax.jit(
        lambda p, e, m: pipeline_forward_capture(
            p, cfg, e, m, img_start, n_img, mesh=mesh,
            n_microbatches=2, layer_weights=w)
    )(params, embeds, mask)
    for key in ("attn", "hidden", "last_hidden"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(want[key]), atol=2e-5,
            err_msg=key)


def test_pipeline_moe_stack():
    """Pipeline over a Mixtral-topology (MoE) layer stack."""
    cfg = DecoderConfig(
        vocab_size=64, hidden_size=32, num_layers=4, num_heads=4,
        num_kv_heads=2, head_dim=8, intermediate_size=64,
        num_experts=4, num_experts_per_tok=2, dtype=jnp.float32,
    )
    params = init_params(cfg, jax.random.key(3))
    rng = np.random.default_rng(5)
    B, S = 4, 10
    embeds = embed_tokens(
        params, cfg, jnp.asarray(rng.integers(0, 64, (B, S)), jnp.int32))
    mask = jnp.ones((B, S), bool)
    w = jax.nn.softmax(jnp.asarray(rng.normal(size=(4,)), jnp.float32))
    want = forward_capture(params, cfg, embeds, mask, 1, 4, layer_weights=w)
    mesh = Mesh(np.array(jax.devices()[:2]), ("model",))
    got = jax.jit(
        lambda p, e, m: pipeline_forward_capture(
            p, cfg, e, m, 1, 4, mesh=mesh, n_microbatches=2,
            layer_weights=w)
    )(params, embeds, mask)
    for key in ("attn", "hidden", "last_hidden"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(want[key]), atol=2e-5,
            err_msg=key)

# heavy (jit compiles / torch oracles) -- excluded from the fast path
# (pytest -m "not slow"; see README Testing strategy)
pytestmark = pytest.mark.slow
