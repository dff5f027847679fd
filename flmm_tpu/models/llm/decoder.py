"""Unified Llama-family decoder with fused text->image attention capture.

One implementation covers every LLM the reference wraps -- Llama/Vicuna
(LLaVA, MGM), DeepSeek-LLM (DeepSeekVL), Mistral (LLaVA-Next, MGM) and
Gemma (MGM) are all RoPE decoders differing only in dimensions, norms and
activations (SURVEY.md section 7).

TPU-native attention capture
----------------------------
The reference runs HF with ``output_attentions=True`` -- eager attention
materialising the full ``num_layers x heads x S x S`` tensor (the reason it
pins transformers==4.39.1; reference: flmm/models/frozen_llava.py:110-114,
README.md:24-25).  Here each layer:

1. computes attention probabilities for just that layer (transient),
2. statically slices the image-key columns ``[img_start, img_start+n_img)``,
3. immediately contracts them with the per-mask token-merge matrix
   (a ``(S, M)`` one-hot/mean matrix -- an MXU matmul),

inside a single ``lax.scan`` over stacked layer parameters.  The only
side output that survives is ``(L, H, M, n_img)`` -- the exact tensor the
U-Net mask head consumes -- so peak memory is one layer's scores instead of
all layers'.  The layer-weighted hidden-state sum (reference:
frozen_llava.py:122-123) is likewise accumulated in the scan carry.

Weights are stored stacked over layers: scan compiles the layer body once.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

Params = Any  # pytree of jnp.ndarray


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    intermediate_size: int
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6
    act: str = "silu"  # 'silu' (llama/mistral/deepseek) | 'gelu_tanh' (gemma)
    embed_scale: bool = False  # gemma: scale embeds by sqrt(hidden_size)
    gemma_norm: bool = False  # gemma rmsnorm uses (1 + w)
    attn_bias: bool = False
    tie_embeddings: bool = False
    # Mixture-of-experts MLP (Mixtral, for MGM-Mixtral): 0 = dense.  The
    # frozen-capture path computes all experts densely and masks by the
    # top-k router gates -- correct and jit-static (top-k dispatch is an
    # optimisation left to a later pass).
    num_experts: int = 0
    num_experts_per_tok: int = 2
    # Route attention through the Pallas fused-capture flash kernel
    # (ops/flash_attention.py).  Requires S % 128 == 0 and a 128-aligned
    # image block (data-side alignment padding) and mean merge; otherwise
    # the XLA path is used automatically.
    use_flash_capture: bool = False
    dtype: Any = jnp.bfloat16

    @property
    def q_dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim


# ---------------------------------------------------------------------------
# Parameter initialisation (random; real weights come from convert/)
# ---------------------------------------------------------------------------


def init_params(cfg: DecoderConfig, key: jax.Array) -> Params:
    ks = jax.random.split(key, 10)
    d, f = cfg.hidden_size, cfg.intermediate_size
    L = cfg.num_layers

    def norm_init(shape):
        return jnp.zeros(shape, cfg.dtype) if cfg.gemma_norm else jnp.ones(shape, cfg.dtype)

    def w(key, shape, fan_in):
        if math.prod(shape) > 2**28 and len(shape) > 2:
            # 7B-class stacked tensors: a whole-tensor f32 transient is
            # multi-GB (w_gate at 7B: 5.6 GB) and OOMs a 16 GB chip
            # before the bf16 cast; lax.map bounds the transient to one
            # layer slice while still emitting one fused XLA op.
            keys = jax.random.split(key, shape[0])
            return jax.lax.map(
                lambda k: (jax.random.normal(k, shape[1:], jnp.float32)
                           / jnp.sqrt(fan_in)).astype(cfg.dtype), keys)
        return (jax.random.normal(key, shape, jnp.float32) / jnp.sqrt(fan_in)).astype(
            cfg.dtype
        )

    layers = {
        "ln1": norm_init((L, d)),
        "ln2": norm_init((L, d)),
        "wq": w(ks[1], (L, d, cfg.q_dim), d),
        "wk": w(ks[2], (L, d, cfg.kv_dim), d),
        "wv": w(ks[3], (L, d, cfg.kv_dim), d),
        "wo": w(ks[4], (L, cfg.q_dim, d), cfg.q_dim),
    }
    if cfg.num_experts > 0:
        E = cfg.num_experts
        layers.update({
            "router": w(ks[5], (L, d, E), d),
            "w_gate": w(ks[5], (L, E, d, f), d),
            "w_up": w(ks[6], (L, E, d, f), d),
            "w_down": w(ks[7], (L, E, f, d), f),
        })
    else:
        layers.update({
            "w_gate": w(ks[5], (L, d, f), d),
            "w_up": w(ks[6], (L, d, f), d),
            "w_down": w(ks[7], (L, f, d), f),
        })
    params = {
        "embed": w(ks[0], (cfg.vocab_size, d), d),
        "layers": layers,
        "final_norm": norm_init((d,)),
    }
    if cfg.attn_bias:
        params["layers"]["bq"] = jnp.zeros((L, cfg.q_dim), cfg.dtype)
        params["layers"]["bk"] = jnp.zeros((L, cfg.kv_dim), cfg.dtype)
        params["layers"]["bv"] = jnp.zeros((L, cfg.kv_dim), cfg.dtype)
    if not cfg.tie_embeddings:
        params["lm_head"] = w(ks[8], (d, cfg.vocab_size), d)
    return params


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def rms_norm(x: jnp.ndarray, w: jnp.ndarray, eps: float, gemma: bool) -> jnp.ndarray:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    scale = (1.0 + w.astype(jnp.float32)) if gemma else w.astype(jnp.float32)
    return (x * scale).astype(dtype)


def rope_tables(
    positions: jnp.ndarray, head_dim: int, theta: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables, HF (GPT-NeoX, non-interleaved) convention.

    positions: ``(..., S)`` int32.  Returns ``(..., S, head_dim)`` f32 each.
    """
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., S, half)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: (B, S, H, hd); cos/sin: (B, S, hd) or (S, hd)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    if cos.ndim == 2:
        cos = cos[None]
        sin = sin[None]
    cos = cos[:, :, None, :].astype(x.dtype)
    sin = sin[:, :, None, :].astype(x.dtype)
    return x * cos + rotated * sin


def _act(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    if kind == "silu":
        return jax.nn.silu(x)
    if kind == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    raise ValueError(kind)


def _dense(x: jnp.ndarray, lp: dict, name: str) -> jnp.ndarray:
    """Projection that transparently takes the W8A8 int8 path when the
    layer dict carries quantized weights (``<name>_q``/``<name>_s``,
    :func:`quantize_params`) -- the serving mode that fits the 7B/8B
    frozen decoders on one 16 GB chip (13.6 GB bf16 -> 6.9 GB)."""
    w_q = lp.get(name + "_q")
    if w_q is not None:
        from flmm_tpu.ops.quant import int8_matmul

        return int8_matmul(x, w_q, lp[name + "_s"])
    return x @ lp[name]


def _mlp(x2: jnp.ndarray, lp: dict, cfg: "DecoderConfig") -> jnp.ndarray:
    """Dense SwiGLU MLP or Mixtral sparse-MoE (computed densely)."""
    if cfg.num_experts == 0:
        h = _act(_dense(x2, lp, "w_gate"), cfg.act) * _dense(x2, lp, "w_up")
        return _dense(h, lp, "w_down")
    # Mixtral router: softmax over the top-k expert logits per token
    logits = (x2 @ lp["router"]).astype(jnp.float32)  # (..., E)
    top_vals, _ = jax.lax.top_k(logits, cfg.num_experts_per_tok)
    thresh = top_vals[..., -1:]
    masked = jnp.where(logits >= thresh, logits, -jnp.inf)
    gates = jax.nn.softmax(masked, axis=-1).astype(x2.dtype)  # (..., E)
    h = _act(jnp.einsum("bsd,edf->besf", x2, lp["w_gate"]), cfg.act) * \
        jnp.einsum("bsd,edf->besf", x2, lp["w_up"])  # (B, E, S, F)
    out = jnp.einsum("besf,efd->besd", h, lp["w_down"])  # (B, E, S, D)
    return jnp.einsum("besd,bes->bsd", out, jnp.moveaxis(gates, -1, 1))


# ---------------------------------------------------------------------------
# Forward with fused attention-map capture
# ---------------------------------------------------------------------------


def layer_step(
    lp: dict,
    w_l: jnp.ndarray,
    h: jnp.ndarray,
    acc: jnp.ndarray,
    aux: dict,
    cfg: DecoderConfig,
    img_start: int,
    n_img: int,
    merge: str,
    flash_ok: bool,
    shard_constraint=None,
):
    """One decoder layer with fused attention capture.

    Pure function shared by ``forward_capture``'s layer scan and the
    pipeline-parallel schedule (parallel/pipeline.py).

    Args:
      lp: one layer's parameters (un-stacked leaves).
      w_l: this layer's hidden-sum weight (scalar).
      h, acc: residual stream ``(B, S, D)`` and f32 weighted-hidden
        accumulator.
      aux: dict with ``cos``/``sin`` RoPE tables, ``bias`` additive
        attention bias ``(B, 1, S, S)``, ``valid`` ``(B, S)`` bool and
        optional ``merge_matrix`` ``(B, S, M)`` (None -> raw capture).

    Returns ``(h, acc, side)``.
    """
    B, S, _ = h.shape
    H, KV, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    scale = 1.0 / jnp.sqrt(float(hd))
    cos, sin = aux["cos"], aux["sin"]
    merge_matrix = aux.get("merge_matrix")

    if shard_constraint is not None:
        h = shard_constraint(h)
    x = rms_norm(h, lp["ln1"], cfg.rms_eps, cfg.gemma_norm)
    q = _dense(x, lp, "wq")
    k = _dense(x, lp, "wk")
    v = _dense(x, lp, "wv")
    if cfg.attn_bias:
        q = q + lp["bq"]
        k = k + lp["bk"]
        v = v + lp["bv"]
    q = q.reshape(B, S, H, hd)
    k = k.reshape(B, S, KV, hd)
    v = v.reshape(B, S, KV, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    if KV != H:
        rep = H // KV
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    if flash_ok:
        from flmm_tpu.ops.flash_attention import (
            flash_attention_with_merged_capture,
        )

        out4, side = flash_attention_with_merged_capture(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), aux["valid"], merge_matrix,
            img_start, n_img,
        )
        out = out4.transpose(0, 2, 1, 3).astype(cfg.dtype)
    else:
        logits = (
            jnp.einsum("bshd,bthd->bhst", q, k,
                       preferred_element_type=jnp.float32)
            * scale
            + aux["bias"]
        )
        probs = jax.nn.softmax(logits, axis=-1)  # f32
        out = jnp.einsum(
            "bhst,bthd->bshd", probs.astype(cfg.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(cfg.dtype)
    attn_out = _dense(out.reshape(B, S, H * hd), lp, "wo")
    h = h + attn_out

    x2 = rms_norm(h, lp["ln2"], cfg.rms_eps, cfg.gemma_norm)
    h = h + _mlp(x2, lp, cfg)

    if not flash_ok:
        img_probs = jax.lax.dynamic_slice_in_dim(
            probs, img_start, n_img, axis=3)
        # (B, H, S, n_img)
        if merge_matrix is None:
            side = img_probs
        elif merge == "mean":
            side = jnp.einsum(
                "bhsn,bsm->bhmn", img_probs, merge_matrix,
                preferred_element_type=jnp.float32,
            )
        elif merge == "max":
            member = merge_matrix > 0  # (B, S, M)
            masked = jnp.where(
                member[:, None, :, :, None],
                img_probs[:, :, :, None, :],
                jnp.finfo(jnp.float32).min,
            )
            side = masked.max(axis=2)  # (B, H, M, n_img)
            side = jnp.where(
                side <= jnp.finfo(jnp.float32).min / 2, 0.0, side)
        else:
            raise ValueError(merge)

    acc = acc + w_l * jax.lax.stop_gradient(h).astype(jnp.float32)
    return h, acc, side


def capture_aux(
    cfg: DecoderConfig,
    attention_mask: jnp.ndarray,
    position_ids: jnp.ndarray | None,
    seq_len: int,
    merge_matrix: jnp.ndarray | None,
) -> dict:
    """Precompute the per-batch tensors ``layer_step`` consumes."""
    if position_ids is None:
        positions = jnp.arange(seq_len)[None, :]  # left-aligned sequences
    else:
        positions = position_ids
    cos, sin = rope_tables(positions, cfg.head_dim, cfg.rope_theta)
    valid = attention_mask.astype(jnp.bool_)
    causal = jnp.tril(jnp.ones((seq_len, seq_len), jnp.bool_))
    allow = causal[None] & valid[:, None, :]  # (B, S, S) keys last
    bias = jnp.where(allow, 0.0, jnp.finfo(jnp.float32).min)[:, None]
    aux = {"cos": cos, "sin": sin, "bias": bias, "valid": valid}
    if merge_matrix is not None:
        aux["merge_matrix"] = merge_matrix
    return aux


def flash_capture_ok(
    cfg: DecoderConfig, merge_matrix, merge: str, seq_len: int,
    img_start: int, n_img: int,
) -> bool:
    return bool(
        cfg.use_flash_capture and merge_matrix is not None
        and merge == "mean" and seq_len % 128 == 0 and img_start % 128 == 0
        and img_start + ((n_img + 127) // 128) * 128 <= seq_len
    )


def forward_capture(
    params: Params,
    cfg: DecoderConfig,
    inputs_embeds: jnp.ndarray,
    attention_mask: jnp.ndarray,
    img_start: int,
    n_img: int,
    merge_matrix: jnp.ndarray | None = None,
    merge: str = "mean",
    layer_weights: jnp.ndarray | None = None,
    position_ids: jnp.ndarray | None = None,
    shard_constraint=None,
) -> dict:
    """Run the frozen decoder, capturing merged text->image attention.

    Args:
      inputs_embeds: ``(B, S, D)`` already-merged text+image embeddings.
      attention_mask: ``(B, S)`` bool; False positions are padding.
      img_start, n_img: static location of the image-token block in the
        packed sequence (contiguous for every supported family).
      merge_matrix: ``(B, S, M)``.  For 'mean' merge rows must already be
        normalised per mask (see ops.masks.mean_merge_matrix); for 'max' it
        is interpreted as a boolean membership matrix.  If None, raw
        ``(B, L, H, S, n_img)`` attention is returned instead (generation /
        analysis path).
      shard_constraint: optional callable applied to the residual stream
        each layer (e.g. ``lambda h: jax.lax.with_sharding_constraint(h,
        P('data', 'model', None))`` for sequence parallelism under a mesh).
      position_ids: optional ``(B, S)`` explicit RoPE positions.  Used by
        anyres families to keep relative positions identical to the
        reference's dynamically-sized packed sequence while padding the
        image block to a static width (masked pad slots are skipped in the
        position count).
      layer_weights: ``(L,)`` f32 softmax weights; if given, the returned
        ``hidden`` is the layer-weighted sum matching the reference's
        ``hidden_states[-L:]`` convention (embedding excluded, final entry
        post-final-norm; reference: frozen_llava.py:118-123).  Hidden states
        are stop-gradient; the weights are not.

    Returns dict with ``attn`` (merged ``(B, L, H, M, n_img)`` or raw),
    ``hidden`` (``(B, S, D)`` weighted sum, f32) and ``last_hidden``
    (``(B, S, D)`` post-norm).
    """
    B, S, D = inputs_embeds.shape
    L = cfg.num_layers

    h = inputs_embeds.astype(cfg.dtype)
    if cfg.embed_scale:
        h = h * jnp.asarray(jnp.sqrt(float(cfg.hidden_size)), cfg.dtype)

    aux = capture_aux(cfg, attention_mask, position_ids, S, merge_matrix)

    if layer_weights is None:
        layer_weights = jnp.zeros((L,), jnp.float32)
    # The reference's per-layer hidden states are HF's tuple[-L:]: outputs of
    # layers 1..L where the last one is post-final-norm.  Accumulate all but
    # the last layer inside the scan; the final (normed) term is added after.
    scan_weights = layer_weights.at[L - 1].set(0.0)

    flash_ok = flash_capture_ok(cfg, merge_matrix, merge, S, img_start, n_img)

    def layer(carry, xs):
        h, acc = carry
        lp, w_l = xs
        h, acc, side = layer_step(
            lp, w_l, h, acc, aux, cfg, img_start, n_img, merge, flash_ok,
            shard_constraint,
        )
        return (h, acc), side

    stacked = params["layers"]
    (h_final, acc), sides = jax.lax.scan(
        layer, (h, jnp.zeros((B, S, D), jnp.float32)), (stacked, scan_weights)
    )
    last_hidden = rms_norm(h_final, params["final_norm"], cfg.rms_eps, cfg.gemma_norm)
    hidden = acc + layer_weights[L - 1] * jax.lax.stop_gradient(last_hidden).astype(
        jnp.float32
    )
    attn = jnp.moveaxis(sides, 0, 1)  # (B, L, ...)
    return {"attn": attn, "hidden": hidden, "last_hidden": last_hidden}


def logits(params: Params, cfg: DecoderConfig, last_hidden: jnp.ndarray) -> jnp.ndarray:
    head = params["embed"].T if cfg.tie_embeddings else params["lm_head"]
    return last_hidden @ head


def embed_tokens(params: Params, cfg: DecoderConfig, ids: jnp.ndarray) -> jnp.ndarray:
    return params["embed"][ids]


def quantize_params(params: Params, consume: bool = False) -> Params:
    """Int8-quantize the frozen decoder's layer projections (W8A8).

    Per-(layer, output-channel) symmetric scales over the stacked
    ``(L, in, out)`` weights; activations quantize dynamically inside
    ``ops.quant.int8_matmul``.  Halves the dominant HBM cost of 7B/8B
    serving (13.6 GB bf16 -> 6.9 GB) so those flagships fit ONE 16 GB
    chip; on v5e the MXU int8 rate equals bf16 (measured round 2), so
    this buys memory, not FLOPs.  ``embed``/``final_norm``/``lm_head``
    stay in the original dtype.  Mixtral MoE expert stacks are left
    unquantized (the dense-capture einsum path reads them directly, and
    8x7B is a tp-only model regardless of precision).

    Memory discipline: quantizing IN PLACE of a resident 7B bf16 tree
    must not double peak HBM -- each stacked weight is processed with a
    per-layer ``lax.map`` (the f32 transient is one layer slice, not
    5.6 GB) and, with ``consume=True``, the bf16 original is DONATED and
    its buffer explicitly deleted so HBM frees before the next leaf
    (without this, bf16 + int8 co-resident OOM a 16 GB chip at every
    batch size; measured).  ``consume=True`` MUTATES the input tree --
    the caller must hold the only reference (donation silently degrades
    to a copy when another reference pins the buffer).
    """
    import functools

    @functools.partial(jax.jit, donate_argnums=0)
    def qleaf(w):
        def one(wl):
            wf = wl.astype(jnp.float32)
            s = jnp.maximum(jnp.abs(wf).max(axis=-2), 1e-8) / 127.0
            q = jnp.clip(jnp.round(wf / s[..., None, :]), -127,
                         127).astype(jnp.int8)
            return q, s
        return jax.lax.map(one, w)

    out = {k: v for k, v in params.items() if k != "layers"}
    layers = params["layers"] if consume else dict(params["layers"])
    for name in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        w = layers.get(name)
        if w is None or w.ndim != 3:  # absent, or (L, E, ...) MoE stack
            continue
        layers.pop(name)
        w_q, scale = qleaf(w)
        jax.block_until_ready(w_q)  # serialise so donation frees promptly
        if consume and hasattr(w, "delete"):
            try:
                w.delete()  # belt-and-braces if donation copied
            except Exception:
                pass
        del w
        layers[name + "_q"] = w_q
        layers[name + "_s"] = scale
    if consume:
        new = dict(params)
        new["layers"] = layers
        return new
    out["layers"] = layers
    return out
