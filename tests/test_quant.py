"""Int8 quantization (ops/quant.py) — accuracy vs the f32 path."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from flmm_tpu.ops.quant import dense, int8_matmul, quantize_weight
from flmm_tpu.models.sam import image_encoder as enc


def test_int8_matmul_accuracy():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 128)) * 0.05, jnp.float32)
    w_q, w_s = quantize_weight(w)
    got = np.asarray(int8_matmul(x, w_q, w_s))
    want = np.asarray(x @ w)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.02, rel
    # per-channel scale really is per-channel: scale one output column up
    w2 = w.at[:, 0].mul(100.0)
    w2_q, w2_s = quantize_weight(w2)
    got2 = np.asarray(int8_matmul(x, w2_q, w2_s))
    want2 = np.asarray(x @ w2)
    rel2 = np.linalg.norm(got2 - want2) / np.linalg.norm(want2)
    assert rel2 < 0.02, rel2


def test_dense_dispatch():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 32)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(32, 16)) * 0.1, jnp.float32)
    p_f32 = {"w": w}
    w_q, w_s = quantize_weight(w)
    p_q = {"w_q": w_q, "w_s": w_s}
    a = np.asarray(dense(x, p_f32, "w"))
    b = np.asarray(dense(x, p_q, "w"))
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 0.02, rel


def test_sam_encoder_int8_close_to_f32():
    """quantize_params(encoder) output stays close to the f32 encoder."""
    cfg = enc.SamEncoderConfig(
        img_size=64, patch_size=16, embed_dim=64, depth=3, num_heads=2,
        out_chans=32, window_size=2, global_attn_indexes=(1,),
    )
    params = enc.init_params(cfg, jax.random.key(0))
    # non-trivial rel-pos / pos-embed so the bias paths are exercised
    params["pos_embed"] = 0.02 * jax.random.normal(
        jax.random.key(1), params["pos_embed"].shape)
    for bp in params["blocks"]:
        bp["rel_pos_h"] = 0.02 * jax.random.normal(
            jax.random.key(2), bp["rel_pos_h"].shape)
        bp["rel_pos_w"] = 0.02 * jax.random.normal(
            jax.random.key(3), bp["rel_pos_w"].shape)
    pixels = jax.random.normal(jax.random.key(4), (2, 64, 64, 3))
    want = np.asarray(enc.forward(params, cfg, pixels))
    got = np.asarray(enc.forward(enc.quantize_params(params), cfg, pixels))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.05, rel


def test_pipeline_int8_sam_stability():
    """quantize_frozen_sam barely moves the end-to-end SAM mask probs."""
    from flmm_tpu.configs.deepseek_vl import tiny
    from flmm_tpu.data.synthetic import synthetic_batch
    from flmm_tpu.models.frozen import grounding

    cfg = tiny()
    params = grounding.init_params(cfg, jax.random.key(0))
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg, batch_size=2))
    want = grounding.forward(params, cfg, batch)["sam_logits"]
    got = grounding.forward(
        grounding.quantize_frozen_sam(params), cfg, batch)["sam_logits"]
    dp = np.abs(jax.nn.sigmoid(got) - jax.nn.sigmoid(want))
    assert float(dp.mean()) < 0.02, float(dp.mean())

# heavy (jit compiles / torch oracles) -- excluded from the fast path
# (pytest -m "not slow"; see README Testing strategy)
pytestmark = pytest.mark.slow


def test_decoder_int8_close_to_dense():
    """W8A8 frozen decoder (llm.decoder.quantize_params): the capture
    forward's attention maps and hidden states stay close to the dense
    path -- the serving mode that fits 7B/8B on one 16 GB chip."""
    from flmm_tpu.configs.deepseek_vl import tiny
    from flmm_tpu.models.llm import decoder as llm

    cfg = tiny().llm
    params = llm.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    B, S, M = 2, 24, 2
    embeds = jnp.asarray(
        rng.standard_normal((B, S, cfg.hidden_size)).astype(np.float32) * 0.3)
    mask = jnp.ones((B, S), bool)
    mm = jnp.asarray((rng.random((B, S, M)) > 0.7).astype(np.float32))
    lw = jax.nn.softmax(jnp.asarray(rng.standard_normal(cfg.num_layers)))

    def run(p):
        out = llm.forward_capture(
            p, cfg, embeds, mask, img_start=3, n_img=8,
            merge_matrix=mm, layer_weights=lw)
        return out

    want = run(params)
    got = run(llm.quantize_params(params))
    for k in ("attn", "hidden", "last_hidden"):
        a = np.asarray(want[k], np.float32).ravel()
        b = np.asarray(got[k], np.float32).ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.999, (k, corr)
    # the quantized tree actually halves the layer-weight bytes
    def nbytes(p):
        return sum(x.nbytes for x in jax.tree.leaves(p["layers"]))
    assert nbytes(llm.quantize_params(params)) < 0.6 * nbytes(params)


def test_fabricated_int8_tree_matches_quantize_params_structure():
    """bench._fabricate_int8_llm must return the EXACT tree structure
    llm.decoder.quantize_params produces (the serving forward consumes
    either interchangeably); shapes/dtypes pinned leaf by leaf."""
    import sys
    import pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import bench
    from flmm_tpu.models.llm import decoder as llm_dec

    cfg = llm_dec.DecoderConfig(
        vocab_size=64, hidden_size=16, num_layers=3, num_heads=4,
        num_kv_heads=2, head_dim=4, intermediate_size=32,
        dtype=jnp.float32)
    key = jax.random.key(0)
    real = llm_dec.quantize_params(llm_dec.init_params(cfg, key))
    real.pop("lm_head", None)
    fab = bench._fabricate_int8_llm(cfg, key)

    real_s = jax.tree.map(lambda a: (a.shape, str(a.dtype)), real)
    fab_s = jax.tree.map(lambda a: (a.shape, str(a.dtype)), fab)
    assert real_s == fab_s
