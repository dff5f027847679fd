"""Decoder parity vs HF Llama eager attention (the reference's substrate).

The reference relies on HF ``output_attentions=True`` eager softmax
(flmm/models/frozen_llava.py:110-117).  These tests prove our scan-fused
capture produces the same image-column attention blocks, hidden-state
weighted sums and logits on a tiny random Llama.
"""

import numpy as np
import pytest
import jax.numpy as jnp
import torch

from flmm_tpu.models.llm.decoder import (
    DecoderConfig,
    forward_capture,
    logits as decoder_logits,
)
from flmm_tpu.convert.hf_weights import llama_decoder_params
from flmm_tpu.ops.masks import mean_merge_matrix, segment_matrix


@pytest.fixture(scope="module")
def tiny_llama():
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rms_norm_eps=1e-6,
        attn_implementation="eager",
    )
    model = LlamaForCausalLM(hf_cfg).eval()
    cfg = DecoderConfig(
        vocab_size=128,
        hidden_size=64,
        num_layers=4,
        num_heads=4,
        num_kv_heads=2,
        head_dim=16,
        intermediate_size=128,
        dtype=jnp.float32,
    )
    params = llama_decoder_params(model.state_dict(), cfg)
    return model, cfg, params


def _run_hf(model, embeds):
    with torch.no_grad():
        return model(
            inputs_embeds=torch.from_numpy(embeds),
            attention_mask=torch.ones(embeds.shape[:2], dtype=torch.long),
            output_attentions=True,
            output_hidden_states=True,
            use_cache=False,
        )


IMG_START, N_IMG = 3, 6


def test_raw_attention_and_logits_match_hf(tiny_llama):
    model, cfg, params = tiny_llama
    rng = np.random.default_rng(0)
    embeds = rng.standard_normal((2, 16, 64)).astype(np.float32) * 0.1
    hf = _run_hf(model, embeds)
    out = forward_capture(
        params, cfg, jnp.asarray(embeds), jnp.ones((2, 16), bool),
        img_start=IMG_START, n_img=N_IMG,
    )
    want_attn = np.stack(
        [a.numpy()[:, :, :, IMG_START:IMG_START + N_IMG] for a in hf.attentions],
        axis=1,
    )  # (B, L, H, S, n)
    np.testing.assert_allclose(np.asarray(out["attn"]), want_attn, atol=2e-5)

    got_logits = np.asarray(decoder_logits(params, cfg, out["last_hidden"]))
    np.testing.assert_allclose(got_logits, hf.logits.numpy(), atol=2e-4)


def test_weighted_hidden_matches_hf_convention(tiny_llama):
    model, cfg, params = tiny_llama
    rng = np.random.default_rng(1)
    embeds = rng.standard_normal((1, 12, 64)).astype(np.float32) * 0.1
    hf = _run_hf(model, embeds)
    w = np.asarray(
        torch.softmax(torch.arange(4, dtype=torch.float32), dim=0).numpy()
    )
    # reference convention: hidden_states[-L:], last entry post-final-norm
    hs = [h.numpy() for h in hf.hidden_states[-4:]]
    want = sum(wi * hi for wi, hi in zip(w, hs))
    out = forward_capture(
        params, cfg, jnp.asarray(embeds), jnp.ones((1, 12), bool),
        img_start=IMG_START, n_img=N_IMG, layer_weights=jnp.asarray(w),
    )
    np.testing.assert_allclose(np.asarray(out["hidden"]), want, atol=2e-5)


def test_merged_attention_equals_reference_loop(tiny_llama):
    model, cfg, params = tiny_llama
    rng = np.random.default_rng(2)
    embeds = rng.standard_normal((1, 16, 64)).astype(np.float32) * 0.1
    hf = _run_hf(model, embeds)
    mask_ids = np.array([-1] * 10 + [0, 0, 1, -1, 1, 1])
    for merge in ("mean", "max"):
        if merge == "mean":
            mm = mean_merge_matrix(jnp.asarray(mask_ids), 2)[None]
        else:
            mm = segment_matrix(jnp.asarray(mask_ids), 2)[None]
        out = forward_capture(
            params, cfg, jnp.asarray(embeds), jnp.ones((1, 16), bool),
            img_start=IMG_START, n_img=N_IMG, merge_matrix=mm, merge=merge,
        )
        got = np.asarray(out["attn"])[0]  # (L, H, M, n)
        attns = [a.numpy()[0, :, :, IMG_START:IMG_START + N_IMG]
                 for a in hf.attentions]
        for m in range(2):
            sel = mask_ids == m
            for li, a in enumerate(attns):
                ref = a[:, sel].mean(1) if merge == "mean" else a[:, sel].max(1)
                np.testing.assert_allclose(got[li, :, m], ref, atol=2e-5)


def test_padding_mask_isolation(tiny_llama):
    """Padded tail must not change outputs for the valid prefix."""
    model, cfg, params = tiny_llama
    rng = np.random.default_rng(3)
    embeds = rng.standard_normal((1, 12, 64)).astype(np.float32) * 0.1
    full = forward_capture(
        params, cfg, jnp.asarray(embeds), jnp.ones((1, 12), bool),
        img_start=0, n_img=4,
    )
    padded_embeds = np.concatenate(
        [embeds, rng.standard_normal((1, 4, 64)).astype(np.float32)], axis=1
    )
    mask = np.array([[True] * 12 + [False] * 4])
    padded = forward_capture(
        params, cfg, jnp.asarray(padded_embeds), jnp.asarray(mask),
        img_start=0, n_img=4,
    )
    np.testing.assert_allclose(
        np.asarray(padded["last_hidden"])[:, :12],
        np.asarray(full["last_hidden"]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(padded["attn"])[:, :, :, :12],
        np.asarray(full["attn"]),
        atol=1e-5,
    )


def test_mixtral_moe_parity():
    """MoE decoder vs HF MixtralForCausalLM (eager)."""
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(3)
    hf_cfg = MixtralConfig(
        vocab_size=96, hidden_size=48, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        rms_norm_eps=1e-6, rope_theta=10000.0,
        attn_implementation="eager",
    )
    m = MixtralForCausalLM(hf_cfg).eval()
    cfg = DecoderConfig(
        vocab_size=96, hidden_size=48, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=12, intermediate_size=64,
        num_experts=4, num_experts_per_tok=2, dtype=jnp.float32,
    )
    params = llama_decoder_params(m.state_dict(), cfg)
    rng = np.random.default_rng(5)
    ids = rng.integers(0, 96, (1, 10))
    with torch.no_grad():
        hf = m(input_ids=torch.from_numpy(ids),
               attention_mask=torch.ones((1, 10), dtype=torch.long),
               output_attentions=True)
    from flmm_tpu.models.llm.decoder import embed_tokens
    embeds = embed_tokens(params, cfg, jnp.asarray(ids, jnp.int32))
    out = forward_capture(params, cfg, embeds, jnp.ones((1, 10), bool),
                          img_start=2, n_img=4)
    got = np.asarray(decoder_logits(params, cfg, out["last_hidden"]))
    np.testing.assert_allclose(got, hf.logits.numpy(), atol=5e-4)
