"""Greedy KV-cache decoding with per-step attention/hidden capture.

Behavioural spec: reference frozen_deepseek_vl.py generation paths --
``answer``:514 (generate while caching each step's text->image attention
and hidden states), ``visual_cot_v1``:271 (<=16 thought tokens with stop
words incl. '.'), ``ground``:568 (mask arbitrary token spans of a finished
generation).  HF ``generate(output_attentions=True)`` is replaced by a
``lax.scan`` decode loop whose per-step side outputs are exactly the
``(L, H, n_img)`` image-attention rows and the layer-weighted hidden state.

Static shapes: the KV cache is pre-allocated to prompt+max_new tokens; a
``done`` flag freezes the sequence after a stop token (emitted steps after
stop are marked invalid rather than shortening the scan).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from flmm_tpu.models.llm.decoder import (
    DecoderConfig, _dense, _mlp, apply_rope, rms_norm, rope_tables,
)


@dataclasses.dataclass(frozen=True)
class DecodeConfig:
    max_new_tokens: int = 64
    stop_token_ids: tuple = ()


def _layer_step(
    lp: dict, cfg: DecoderConfig, h: jnp.ndarray,
    k_cache: jnp.ndarray, v_cache: jnp.ndarray,
    pos: jnp.ndarray, valid_len: jnp.ndarray,
    cos: jnp.ndarray, sin: jnp.ndarray,
    img_start: int, n_img: int,
    key_valid: jnp.ndarray | None = None,
):
    """One decoder layer for one new token (h: (1, D))."""
    S_tot = k_cache.shape[0]
    H, KV, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    x = rms_norm(h, lp["ln1"], cfg.rms_eps, cfg.gemma_norm)
    q = _dense(x, lp, "wq")
    k = _dense(x, lp, "wk")
    v = _dense(x, lp, "wv")
    if cfg.attn_bias:
        q = q + lp["bq"]
        k = k + lp["bk"]
        v = v + lp["bv"]
    q = apply_rope(q.reshape(1, 1, H, hd), cos, sin)[0, 0]  # (H, hd)
    k = apply_rope(k.reshape(1, 1, KV, hd), cos, sin)[0, 0]  # (KV, hd)
    v = v.reshape(KV, hd)
    k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k[None], pos, 0)
    v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v[None], pos, 0)
    if KV != H:
        rep = H // KV
        kk = jnp.repeat(k_cache, rep, axis=1)
        vv = jnp.repeat(v_cache, rep, axis=1)
    else:
        kk, vv = k_cache, v_cache
    logits = jnp.einsum(
        "hd,thd->ht", q, kk, preferred_element_type=jnp.float32
    ) / jnp.sqrt(float(hd))
    mask = jnp.arange(S_tot) <= valid_len
    if key_valid is not None:  # anyres: masked pads inside the prompt
        mask = mask & key_valid
    logits = jnp.where(mask[None, :], logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)  # (H, S_tot)
    out = jnp.einsum("ht,thd->hd", probs.astype(h.dtype), vv).reshape(1, -1)
    h = h + _dense(out, lp, "wo")
    x2 = rms_norm(h, lp["ln2"], cfg.rms_eps, cfg.gemma_norm)
    h = h + _mlp(x2[None], lp, cfg)[0]
    img_probs = jax.lax.dynamic_slice_in_dim(probs, img_start, n_img, axis=1)
    return h, k_cache, v_cache, img_probs  # img: (H, n_img)


def prefill(
    params: dict, cfg: DecoderConfig, embeds: jnp.ndarray,
    img_start: int, n_img: int, max_new_tokens: int,
    layer_weights: jnp.ndarray | None = None,
    attn_mask: jnp.ndarray | None = None,
    position_ids: jnp.ndarray | None = None,
):
    """Run the prompt, building the KV cache.

    Args:
      embeds: ``(S, D)`` prompt embeddings.
      attn_mask: optional ``(S,)`` bool -- False marks masked pad slots
        inside the packed prompt (anyres/MGM-HD image-block padding);
        their keys are excluded for every query, here and in decode.
      position_ids: optional ``(S,)`` RoPE positions (pads skipped), as
        produced by the anyres batch builders.

    Returns dict with 'k_cache'/'v_cache' ``(L, S+max_new, KV, hd)``,
    'last_hidden' ``(D,)`` (post final norm, for the first sampled token),
    'attn' ``(L, H, S, n_img)`` prompt attention rows and 'hidden'
    ``(S, D)`` layer-weighted hidden states.
    """
    S, D = embeds.shape
    L, KV, hd = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    S_tot = S + max_new_tokens
    h = embeds[None].astype(cfg.dtype)
    if cfg.embed_scale:
        h = h * jnp.asarray(jnp.sqrt(float(cfg.hidden_size)), cfg.dtype)
    positions = (jnp.arange(S)[None] if position_ids is None
                 else position_ids[None])
    cos, sin = rope_tables(positions, hd, cfg.rope_theta)
    causal = jnp.tril(jnp.ones((S, S), jnp.bool_))
    allow = causal if attn_mask is None else causal & attn_mask[None, :]
    bias = jnp.where(allow, 0.0, jnp.finfo(jnp.float32).min)[None, None]

    if layer_weights is None:
        layer_weights = jnp.full((L,), 1.0 / L, jnp.float32)
    scan_w = layer_weights.at[L - 1].set(0.0)

    H = cfg.num_heads

    def layer(carry, xs):
        h, acc = carry
        lp, w_l = xs
        x = rms_norm(h, lp["ln1"], cfg.rms_eps, cfg.gemma_norm)
        q = _dense(x, lp, "wq")
        k = _dense(x, lp, "wk")
        v = _dense(x, lp, "wv")
        if cfg.attn_bias:
            q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
        q = apply_rope(q.reshape(1, S, H, hd), cos, sin)
        k = apply_rope(k.reshape(1, S, KV, hd), cos, sin)
        v = v.reshape(1, S, KV, hd)
        if KV != H:
            rep = H // KV
            kfull = jnp.repeat(k, rep, axis=2)
            vfull = jnp.repeat(v, rep, axis=2)
        else:
            kfull, vfull = k, v
        logits = jnp.einsum(
            "bshd,bthd->bhst", q, kfull, preferred_element_type=jnp.float32
        ) / jnp.sqrt(float(hd)) + bias
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum(
            "bhst,bthd->bshd", probs.astype(cfg.dtype), vfull
        ).reshape(1, S, -1)
        h = h + _dense(out, lp, "wo")
        x2 = rms_norm(h, lp["ln2"], cfg.rms_eps, cfg.gemma_norm)
        h = h + _mlp(x2, lp, cfg)
        img = jax.lax.dynamic_slice_in_dim(probs[0], img_start, n_img, axis=2)
        pad = jnp.zeros((max_new_tokens, KV, hd), cfg.dtype)
        kc = jnp.concatenate([k[0], pad], axis=0)
        vc = jnp.concatenate([v[0], pad], axis=0)
        acc = acc + w_l * jax.lax.stop_gradient(h[0]).astype(jnp.float32)
        return (h, acc), (kc, vc, img)

    (h_final, acc), (k_cache, v_cache, attn) = jax.lax.scan(
        layer, (h, jnp.zeros((S, cfg.hidden_size), jnp.float32)),
        (params["layers"], scan_w),
    )
    last = rms_norm(h_final, params["final_norm"], cfg.rms_eps, cfg.gemma_norm)
    hidden = acc + layer_weights[L - 1] * jax.lax.stop_gradient(last[0]).astype(
        jnp.float32
    )
    out = {
        "k_cache": k_cache, "v_cache": v_cache,
        "last_hidden": last[0, -1],
        "attn": attn,  # (L, H, S, n_img)
        "hidden": hidden,  # (S, D) weighted
        "prompt_len": S,
        # RoPE position of the first generated token (== S when dense)
        "next_position": (jnp.asarray(S, jnp.int32) if position_ids is None
                          else position_ids[-1].astype(jnp.int32) + 1),
    }
    if attn_mask is not None:
        out["key_valid"] = jnp.concatenate(
            [attn_mask.astype(bool),
             jnp.ones((max_new_tokens,), bool)])
    return out


def decode(
    params: dict, cfg: DecoderConfig, state: dict, dcfg: DecodeConfig,
    img_start: int, n_img: int,
    layer_weights: jnp.ndarray | None = None,
):
    """Greedy decode with per-step capture.

    Returns dict with 'tokens' ``(T,)``, 'valid' ``(T,)`` bool (False after
    a stop token fired), 'attn' ``(T, L, H, n_img)``, 'hidden' ``(T, D)``.
    The stop token itself is marked valid (the reference keeps it then
    drops the final token, answer:562).
    """
    L = cfg.num_layers
    T = dcfg.max_new_tokens
    if layer_weights is None:
        layer_weights = jnp.full((L,), 1.0 / L, jnp.float32)
    scan_w = layer_weights.at[L - 1].set(0.0)
    head = params["embed"].T if cfg.tie_embeddings else params["lm_head"]
    stop_ids = jnp.asarray(dcfg.stop_token_ids or [-1], jnp.int32)

    first_logits = state["last_hidden"] @ head
    first_token = jnp.argmax(first_logits).astype(jnp.int32)
    prompt_len = state["prompt_len"]
    key_valid = state.get("key_valid")  # anyres masked-pad prompts
    first_rope = state.get("next_position",
                           jnp.asarray(prompt_len, jnp.int32))

    def step(carry, _):
        token, pos, rope_pos, done, k_caches, v_caches = carry
        emb = params["embed"][token][None].astype(cfg.dtype)
        if cfg.embed_scale:
            emb = emb * jnp.asarray(jnp.sqrt(float(cfg.hidden_size)), cfg.dtype)
        cos, sin = rope_tables(rope_pos[None, None], cfg.head_dim,
                               cfg.rope_theta)
        h = emb

        def layer(carry2, xs):
            h, acc = carry2
            lp, w_l, kc, vc = xs
            h, kc, vc, img = _layer_step(
                lp, cfg, h, kc, vc, pos, pos, cos, sin, img_start, n_img,
                key_valid=key_valid,
            )
            acc = acc + w_l * jax.lax.stop_gradient(h[0]).astype(jnp.float32)
            return (h, acc), (kc, vc, img)

        (h, acc), (k_new, v_new, imgs) = jax.lax.scan(
            layer, (h, jnp.zeros((cfg.hidden_size,), jnp.float32)),
            (params["layers"], scan_w, k_caches, v_caches),
        )
        last = rms_norm(h, params["final_norm"], cfg.rms_eps, cfg.gemma_norm)
        hidden = acc + layer_weights[L - 1] * last[0].astype(jnp.float32)
        logits = last[0] @ head
        nxt = jnp.argmax(logits).astype(jnp.int32)
        is_stop = jnp.any(token == stop_ids)
        emit_valid = jnp.logical_not(done)
        done = jnp.logical_or(done, is_stop)
        return (
            (nxt, pos + 1, rope_pos + 1, done, k_new, v_new),
            (token, emit_valid, imgs, hidden),
        )

    init = (first_token, jnp.asarray(prompt_len, jnp.int32),
            first_rope, jnp.asarray(False),
            state["k_cache"], state["v_cache"])
    _, (tokens, valid, attn, hidden) = jax.lax.scan(step, init, None, length=T)
    return {"tokens": tokens, "valid": valid, "attn": attn, "hidden": hidden}
