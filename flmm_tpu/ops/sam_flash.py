"""Pallas flash attention for SAM ViTDet blocks -- production kernels.

The reference's eager path (segment_anything/modeling/image_encoder.py:
224-240) materialises the (B*heads, 4096, 4096) score tensor plus two
decomposed rel-pos bias tensors -- the dominant cost of the whole F-LMM
pipeline on TPU (~60% of SAM encoder time measured on v5e).  The kernels
here replace it:

* :func:`sam_window_attention_v9` -- windowed blocks (default): scores
  AND the decomposed rel-pos bias from ONE augmented-K matmul per window
  ``[q*scale | bias_h | bias_w] @ [k ; sel_h ; sel_w]^T`` with the
  one-hot selection columns pre-added to the lane-padded keys by XLA,
  base-2 softmax (exp2 is the native VPU transcendental).
* :func:`sam_global_attention_v8` -- global blocks (default): the same
  augmented-K trick with software-pipelined softmax chunks so the MXU
  score matmuls overlap the (dominant) VPU exp work; non-128-multiple
  grids are lane-padded with in-kernel key masking.
* :func:`plain_flash_attention` -- bias-free non-causal attention for
  the ViT towers (SigLIP/CLIP/EVA).

Nine window and eight global kernel designs were measured to get here;
the superseded variants live in :mod:`flmm_tpu.ops.sam_flash_experiments`
with their measured numbers -- kept as tested negative results, not
production surface.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LOG2E = 1.4426950408889634


def _pick_block_q(S: int, want: int, chunks: int = 1) -> tuple[int, int]:
    """Largest query-tile size <= ``want`` that divides S, shrinking
    ``chunks`` if needed so each softmax chunk keeps 8-row alignment
    (non-64 grids, e.g. the reduced-resolution SAM schedule)."""
    for c in (chunks, chunks // 2, chunks // 4, 1):
        if c < 1:
            continue
        for bq in range(min(want, S), 0, -8):
            if S % bq == 0 and bq % c == 0 and (bq // c) % 8 == 0:
                return bq, c
    # No aligned tiling found: fall back to one whole-row tile, which
    # still honours the contract (S % block_q == 0 and 8-row sublane
    # alignment) only when S itself is 8-aligned -- direct callers with
    # odd S (e.g. 729) must pad first, as the encoder's lane-pad path
    # does.
    assert S % 8 == 0, (
        f"no 8-aligned query tiling for S={S}; pad S to a multiple of 8")
    return S, 1

def _window_kernel_v9(q_ref, k_ref, v_ref, o_ref, *,
                      valid: int, group: int):
    """v8 with a base-2 softmax (operands pre-scaled by log2(e))."""
    tp = q_ref.shape[1]
    col_ok = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1) < valid
    for w in range(group):
        s = jnp.dot(q_ref[w], k_ref[w].T, preferred_element_type=jnp.float32)
        s = jnp.where(col_ok, s, -1e30)
        m = s.max(axis=1, keepdims=True)
        p = jnp.exp2(s - m)
        l = p.sum(axis=1, keepdims=True)
        o_ref[w] = (
            jnp.dot(p.astype(v_ref.dtype), v_ref[w],
                    preferred_element_type=jnp.float32)
            / jnp.maximum(l, 1e-30)
        ).astype(o_ref.dtype)


def sam_window_attention_v9(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    rel_pos_h: jnp.ndarray, rel_pos_w: jnp.ndarray,
    side: int, interpret: bool = False, group: int | None = None,
) -> jnp.ndarray:
    """Windowed ViTDet attention, v9: v8's pure augmented-K matmul with a
    base-2 softmax.  Same contract as :func:`sam_window_attention`."""
    G, T, hd = q.shape
    assert T == side * side
    tp = ((T + 15) // 16) * 16
    ka = hd + 2 * side
    kp = ((ka + 127) // 128) * 128
    scale = 1.0 / math.sqrt(hd)

    coords = jnp.arange(side)[:, None] - jnp.arange(side)[None, :] + side - 1
    rh = rel_pos_h[coords].astype(q.dtype)
    rw = rel_pos_w[coords].astype(q.dtype)
    qg = q.reshape(G, side, side, hd)
    bias_h = (jnp.einsum("gyxd,ykd->gyxk", qg, rh,
                         preferred_element_type=jnp.float32)
              * _LOG2E).reshape(G, T, side)
    bias_w = (jnp.einsum("gyxd,xkd->gyxk", qg, rw,
                         preferred_element_type=jnp.float32)
              * _LOG2E).reshape(G, T, side)

    qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    a = jnp.concatenate(
        [qs, bias_h.astype(q.dtype), bias_w.astype(q.dtype)], axis=-1)
    a = jnp.pad(a, ((0, 0), (0, tp - T), (0, kp - ka)))

    j = jnp.arange(T)
    r = jnp.arange(side)
    selh = (r[:, None] == (j // side)[None, :]).astype(q.dtype)
    selw = (r[:, None] == (j % side)[None, :]).astype(q.dtype)
    sel = jnp.concatenate([selh, selw], axis=0).T  # (T, 2*side); the bias
    # lanes of ``a`` already carry log2(e), so the selection stays exactly 1
    sel = jnp.pad(sel.astype(q.dtype), ((0, tp - T), (hd, kp - ka)))
    kaug = jnp.pad(k, ((0, 0), (0, tp - T), (0, kp - hd)))
    kaug = kaug + sel[None]
    vp = jnp.pad(v, ((0, 0), (0, tp - T), (0, 0)))

    if group is None:  # 25 = one image x head of 64-grid windows; group 32
        # overflows the 16 MB VMEM scoped allocation
        group = next((g for g in (25, 16, 8) if G % g == 0), 1)
    assert G % group == 0, (G, group)
    kernel = functools.partial(_window_kernel_v9, valid=T, group=group)
    out = pl.pallas_call(
        kernel,
        grid=(G // group,),
        in_specs=[
            pl.BlockSpec((group, tp, kp), lambda g: (g, 0, 0)),
            pl.BlockSpec((group, tp, kp), lambda g: (g, 0, 0)),
            pl.BlockSpec((group, tp, hd), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((group, tp, hd), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, tp, hd), q.dtype),
        interpret=interpret,
    )(a, kaug, vp)
    return out[:, :T]

def _plain_kernel(a_ref, b_ref, v_ref, o_ref):
    """One (g, i) step of bias-free non-causal attention: one-shot
    softmax over the full (padded) key row; the pad-flag lane of ``a``
    pairs with a -1e30 mask row in ``b`` to kill padded key columns, and
    the ones-column of ``v`` emits the softmax denominator."""
    s = jnp.dot(a_ref[0], b_ref[0], preferred_element_type=jnp.float32)
    m = s.max(axis=1, keepdims=True)
    p = jnp.exp(s - m)
    ol = jnp.dot(p.astype(v_ref.dtype), v_ref[0],
                 preferred_element_type=jnp.float32)
    o_ref[0] = (ol[:, :-1] / jnp.maximum(ol[:, -1:], 1e-30)).astype(
        o_ref.dtype)


def plain_flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    interpret: bool = False, block_q: int = 256,
) -> jnp.ndarray:
    """Non-causal, bias-free attention for ViT towers: ``(G, S, hd)``
    inputs with any S (padded internally to a 128 multiple); never
    materialises the (G, S, S) probabilities in HBM (the XLA tower path
    does, ~40% of SigLIP-L tower time at bs8 on v5e)."""
    G, S, hd = q.shape
    sp = ((S + 127) // 128) * 128
    kp = ((hd + 1 + 127) // 128) * 128
    scale = 1.0 / math.sqrt(hd)

    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    ones = jnp.ones((G, S, 1), q.dtype)
    a = jnp.concatenate([qs, ones], axis=-1)
    a = jnp.pad(a, ((0, 0), (0, sp - S), (0, kp - hd - 1)))

    kt = jnp.swapaxes(k, 1, 2)  # (G, hd, S)
    maskrow = jnp.zeros((G, 1, S), q.dtype)
    b = jnp.concatenate([kt, maskrow], axis=1)
    b = jnp.pad(b, ((0, 0), (0, kp - hd - 1), (0, 0)))
    if sp > S:
        pen = jnp.concatenate([
            jnp.zeros((G, hd, sp - S), q.dtype),
            jnp.full((G, 1, sp - S), -1e30, q.dtype),
            jnp.zeros((G, kp - hd - 1, sp - S), q.dtype)], axis=1)
        b = jnp.concatenate([b, pen], axis=2)

    va = jnp.concatenate([v, jnp.ones((G, S, 1), v.dtype)], axis=-1)
    va = jnp.pad(va, ((0, 0), (0, sp - S), (0, 0)))

    block_q = min(block_q, sp)
    if sp % block_q:
        block_q = 128  # sp is always a multiple of 128
    out = pl.pallas_call(
        _plain_kernel,
        grid=(G, sp // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, kp), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, kp, sp), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, sp, hd + 1), lambda g, i: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda g, i: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct((G, sp, hd), q.dtype),
        interpret=interpret,
    )(a, b, va)
    return out[:, :S]

def _global_kernel_v8(a_ref, b_ref, v_ref, o_ref, *, chunks: int,
                      valid: int):
    """v6's software-pipelined chunks with the v7 base-2 softmax.
    ``valid`` masks lane-padded key columns (non-128-multiple grids,
    e.g. the reduced-resolution SAM schedules)."""
    a = a_ref[0]
    b = b_ref[0]
    vv = v_ref[0]
    n = a.shape[0] // chunks
    Sp = b.shape[1]
    col_ok = (jax.lax.broadcasted_iota(jnp.int32, (n, Sp), 1) < valid
              if valid < Sp else None)

    def score(i):
        return jnp.dot(a[i * n:(i + 1) * n], b,
                       preferred_element_type=jnp.float32)

    s_next = score(0)
    outs = []
    for i in range(chunks):
        s = s_next
        if i + 1 < chunks:
            s_next = score(i + 1)
        if col_ok is not None:
            s = jnp.where(col_ok, s, -1e30)
        m = s.max(axis=1, keepdims=True)
        p = jnp.exp2(s - m)
        l = p.sum(axis=1, keepdims=True)
        o = jnp.dot(p.astype(vv.dtype), vv,
                    preferred_element_type=jnp.float32)
        outs.append((o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=0)

def _global_augmented_operands(q, k, v, rel_pos_h, rel_pos_w, side,
                               log2_domain: bool):
    """Shared XLA-side prep for the augmented-K global kernels: returns
    ``a = [q*scale | bias_h | bias_w]`` (lane-padded) and
    ``b = [k^T ; sel_h ; sel_w]``; with ``log2_domain`` every score term
    is additionally scaled by log2(e) for base-2 softmax kernels."""
    G, S, hd = q.shape
    ka = hd + 2 * side
    kp = ((ka + 127) // 128) * 128
    scale = 1.0 / math.sqrt(hd)
    mult = _LOG2E if log2_domain else 1.0

    coords = jnp.arange(side)[:, None] - jnp.arange(side)[None, :] + side - 1
    rh = rel_pos_h[coords].astype(q.dtype)
    rw = rel_pos_w[coords].astype(q.dtype)
    qg = q.reshape(G, side, side, hd)
    bias_h = (jnp.einsum("gyxd,ykd->gyxk", qg, rh,
                         preferred_element_type=jnp.float32)
              * mult).reshape(G, S, side)
    bias_w = (jnp.einsum("gyxd,xkd->gyxk", qg, rw,
                         preferred_element_type=jnp.float32)
              * mult).reshape(G, S, side)

    qs = (q.astype(jnp.float32) * (scale * mult)).astype(q.dtype)
    a = jnp.concatenate(
        [qs, bias_h.astype(q.dtype), bias_w.astype(q.dtype)], axis=-1)
    a = jnp.pad(a, ((0, 0), (0, 0), (0, kp - ka)))

    kt = jnp.swapaxes(k, 1, 2)
    j = jnp.arange(S)
    r = jnp.arange(side)
    selh = (r[:, None] == (j // side)[None, :]).astype(q.dtype)
    selw = (r[:, None] == (j % side)[None, :]).astype(q.dtype)
    sel = jnp.broadcast_to(
        jnp.concatenate([selh, selw], axis=0)[None], (G, 2 * side, S))
    b = jnp.concatenate([kt, sel], axis=1)
    b = jnp.pad(b, ((0, 0), (0, kp - ka), (0, 0)))
    return a, b, kp

def sam_global_attention_v8(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    rel_pos_h: jnp.ndarray, rel_pos_w: jnp.ndarray,
    side: int, interpret: bool = False, block_q: int = 512,
    chunks: int = 8,
) -> jnp.ndarray:
    """Global ViTDet attention, v8: v6's pipelined chunks + base-2
    softmax.  Same contract as :func:`sam_global_attention`; token counts
    that are not 128-multiples (e.g. 28^2 = 784 for SAM-448) are padded
    to the next lane tile with in-kernel key masking."""
    G, S, hd = q.shape
    assert S == side * side
    Sp = ((S + 127) // 128) * 128
    a, b, kp = _global_augmented_operands(
        q, k, v, rel_pos_h, rel_pos_w, side, log2_domain=True)
    if Sp != S:
        a = jnp.pad(a, ((0, 0), (0, Sp - S), (0, 0)))
        b = jnp.pad(b, ((0, 0), (0, 0), (0, Sp - S)))
        v = jnp.pad(v, ((0, 0), (0, Sp - S), (0, 0)))
    block_q, chunks = _pick_block_q(Sp, block_q, chunks)
    kernel = functools.partial(_global_kernel_v8, chunks=chunks, valid=S)
    out = pl.pallas_call(
        kernel,
        grid=(G, Sp // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, kp), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, kp, Sp), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, Sp, hd), lambda g, i: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda g, i: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct((G, Sp, hd), q.dtype),
        interpret=interpret,
    )(a, b, v)
    return out[:, :S]
