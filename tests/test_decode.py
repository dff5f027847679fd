"""KV-cache decode parity vs the full-sequence forward pass."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from flmm_tpu.models.llm.decoder import (
    DecoderConfig, embed_tokens, forward_capture, init_params,
    logits as lm_logits,
)
from flmm_tpu.generation.decode import DecodeConfig, decode, prefill


def _setup():
    cfg = DecoderConfig(
        vocab_size=64, hidden_size=32, num_layers=3, num_heads=4,
        num_kv_heads=2, head_dim=8, intermediate_size=64, dtype=jnp.float32,
    )
    params = init_params(cfg, jax.random.key(1))
    return cfg, params


IMG_START, N_IMG = 2, 5


def test_decode_matches_full_forward():
    cfg, params = _setup()
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, 64, (10,)), jnp.int32)
    embeds = embed_tokens(params, cfg, prompt)

    T = 6
    state = prefill(params, cfg, embeds, IMG_START, N_IMG, max_new_tokens=T)
    out = decode(params, cfg, state, DecodeConfig(max_new_tokens=T),
                 IMG_START, N_IMG)
    toks = np.asarray(out["tokens"])

    # oracle: grow the sequence token by token through the full forward
    seq = list(np.asarray(prompt))
    for t in range(T):
        full = forward_capture(
            params, cfg,
            embed_tokens(params, cfg, jnp.asarray(seq, jnp.int32))[None],
            jnp.ones((1, len(seq)), bool), IMG_START, N_IMG,
        )
        nxt = int(jnp.argmax(lm_logits(params, cfg, full["last_hidden"])[0, -1]))
        assert toks[t] == nxt, (t, toks, nxt)
        seq.append(nxt)

    # captured attention rows must match the full forward's raw attention
    full = forward_capture(
        params, cfg,
        embed_tokens(params, cfg, jnp.asarray(seq, jnp.int32))[None],
        jnp.ones((1, len(seq)), bool), IMG_START, N_IMG,
    )
    want = np.asarray(full["attn"])[0][:, :, 10:, :]  # (L, H, T, n)
    got = np.asarray(out["attn"]).transpose(1, 2, 0, 3)  # (L, H, T, n)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_stop_token_marks_validity():
    cfg, params = _setup()
    prompt = jnp.asarray([3, 4, 5, 6], jnp.int32)
    embeds = embed_tokens(params, cfg, prompt)
    T = 8
    state = prefill(params, cfg, embeds, 0, 2, max_new_tokens=T)
    out = decode(params, cfg, state, DecodeConfig(max_new_tokens=T),
                 0, 2)
    toks = np.asarray(out["tokens"])
    # force a stop on the 3rd emitted token
    state = prefill(params, cfg, embeds, 0, 2, max_new_tokens=T)
    out2 = decode(params, cfg, state,
                  DecodeConfig(max_new_tokens=T,
                               stop_token_ids=(int(toks[2]),)), 0, 2)
    valid = np.asarray(out2["valid"])
    assert valid[:3].all()
    assert not valid[3:].any() or int(toks[2]) in toks[:3]


def test_prefill_attn_matches_forward_capture():
    cfg, params = _setup()
    rng = np.random.default_rng(2)
    prompt = jnp.asarray(rng.integers(0, 64, (9,)), jnp.int32)
    embeds = embed_tokens(params, cfg, prompt)
    state = prefill(params, cfg, embeds, IMG_START, N_IMG, max_new_tokens=2)
    full = forward_capture(
        params, cfg, embeds[None], jnp.ones((1, 9), bool), IMG_START, N_IMG,
    )
    np.testing.assert_allclose(
        np.asarray(state["attn"]), np.asarray(full["attn"])[0], atol=1e-5
    )
    w = jnp.full((3,), 1.0 / 3)
    full_w = forward_capture(
        params, cfg, embeds[None], jnp.ones((1, 9), bool), IMG_START, N_IMG,
        layer_weights=w,
    )
    np.testing.assert_allclose(
        np.asarray(state["hidden"]), np.asarray(full_w["hidden"])[0],
        atol=1e-5,
    )


def test_decode_matches_full_forward_gemma_and_moe():
    """Decode parity for the Gemma quirks (embed scaling, (1+w) norm, tied
    embeddings) and the MoE MLP."""
    for kwargs in (
        dict(act="gelu_tanh", embed_scale=True, gemma_norm=True,
             tie_embeddings=True, num_kv_heads=1),
        dict(num_experts=4, num_experts_per_tok=2, num_kv_heads=2),
    ):
        cfg = DecoderConfig(
            vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
            head_dim=8, intermediate_size=64, dtype=jnp.float32, **kwargs)
        params = init_params(cfg, jax.random.key(2))
        rng = np.random.default_rng(4)
        prompt = jnp.asarray(rng.integers(0, 64, (8,)), jnp.int32)
        embeds = embed_tokens(params, cfg, prompt)
        T = 4
        state = prefill(params, cfg, embeds, IMG_START, N_IMG,
                        max_new_tokens=T)
        out = decode(params, cfg, state, DecodeConfig(max_new_tokens=T),
                     IMG_START, N_IMG)
        toks = np.asarray(out["tokens"])
        seq = list(np.asarray(prompt))
        for t in range(T):
            full = forward_capture(
                params, cfg,
                embed_tokens(params, cfg, jnp.asarray(seq, jnp.int32))[None],
                jnp.ones((1, len(seq)), bool), IMG_START, N_IMG)
            nxt = int(jnp.argmax(
                lm_logits(params, cfg, full["last_hidden"])[0, -1]))
            assert toks[t] == nxt, (kwargs, t, toks, nxt)
            seq.append(nxt)


def test_decode_masked_pad_prompt_matches_full_forward():
    """Anyres-style prompts: masked pad slots inside the image block
    (block_valid) + position ids that skip pads.  Decode must exclude pad
    keys and continue RoPE from the valid-token count (VERDICT round-1
    item 9)."""
    cfg, params = _setup()
    rng = np.random.default_rng(3)
    S = 12
    prompt = jnp.asarray(rng.integers(0, 64, (S,)), jnp.int32)
    # pads at positions 4:7 (inside an image block starting at 2)
    mask = np.ones((S,), bool)
    mask[4:7] = False
    positions = np.maximum(np.cumsum(mask) - 1, 0).astype(np.int32)
    embeds = embed_tokens(params, cfg, prompt)

    T = 5
    state = prefill(params, cfg, embeds, IMG_START, N_IMG, max_new_tokens=T,
                    attn_mask=jnp.asarray(mask),
                    position_ids=jnp.asarray(positions))
    out = decode(params, cfg, state, DecodeConfig(max_new_tokens=T),
                 IMG_START, N_IMG)
    toks = np.asarray(out["tokens"])

    seq = list(np.asarray(prompt))
    m = list(mask)
    for t in range(T):
        am = jnp.asarray(m, bool)[None]
        pos = jnp.maximum(jnp.cumsum(am[0]) - 1, 0)[None]
        full = forward_capture(
            params, cfg,
            embed_tokens(params, cfg, jnp.asarray(seq, jnp.int32))[None],
            am, IMG_START, N_IMG, position_ids=pos,
        )
        nxt = int(jnp.argmax(
            lm_logits(params, cfg, full["last_hidden"])[0, -1]))
        assert toks[t] == nxt, (t, toks[:t + 1], nxt)
        seq.append(nxt)
        m.append(True)

    # prompt-capture rows also match the masked full forward
    am = jnp.asarray(mask, bool)[None]
    pos = jnp.asarray(positions)[None]
    full = forward_capture(
        params, cfg, embed_tokens(params, cfg, prompt)[None], am,
        IMG_START, N_IMG, position_ids=pos)
    want = np.asarray(full["attn"])[0]  # (L, H, S, n)
    got = np.asarray(state["attn"])
    np.testing.assert_allclose(got, want, atol=2e-5)

# heavy (jit compiles / torch oracles) -- excluded from the fast path
# (pytest -m "not slow"; see README Testing strategy)
pytestmark = pytest.mark.slow
