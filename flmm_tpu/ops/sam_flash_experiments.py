"""Superseded SAM attention kernel variants -- measured negative results.

Every function here is a real, interpret-mode-tested kernel that LOST a
measured v5e bake-off to the production kernels in
:mod:`flmm_tpu.ops.sam_flash` (window v9, global v8, plain).  They are
kept -- with their measured numbers, see README "kernel log" -- so future
rounds do not re-explore settled design space:

window (3200 windows x 196 tokens, ms/layer, v5e bs8):
  v1 8.9, v2 (dense bias) ~, v3 (augmented-K, XLA transposes) ~,
  v4 8.9, v5 (sw-pipelined) ~, v6 13.7, v7 8.3, v8 9.2 -> v9 8.1 wins.
global (4096 tokens + decomposed rel-pos, ms/layer):
  v1 21.1 (streamed online-softmax), v2 21.3, v3 19.4, v4 19.9,
  v6 19.8, v7 23.5 -> v8 18.5 wins.
v10 (spatial head-major whole-layer experiment): kills ~6 ms/layer of
XLA-side partition/transpose prep but in-kernel lane-slice relayouts give
most of it back (~0.6 ms/layer net); its VMEM analysis (head groups > 4
exceed the 16 MB scoped limit) is the design input for the whole-block
kernel work.

Not imported by any production path; the model dispatches here only when
a non-default kernel version is explicitly configured.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flmm_tpu.ops.sam_flash import (
    _LOG2E,
    _global_augmented_operands,
    _pick_block_q,
)

def _kernel(q_ref, k_ref, v_ref, bh_ref, bw_ref, o_ref,
            acc_ref, m_ref, l_ref, *, scale: float, side: int,
            block_q: int, block_k: int):
    """One (g, qi, kj) grid step: process key tile kj for query tile qi.

    TPU grid execution is sequential with the last axis innermost, so the
    VMEM scratch accumulators carry across the kj sweep; they are reset at
    kj == 0 and flushed to the output at the final key tile.
    """
    kj = pl.program_id(2)
    n_k = pl.num_programs(2)
    rows_per_tile = block_k // side  # key-grid rows covered by one key tile

    @pl.when(kj == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[...]  # keep bf16: MXU-native (scale folded in after matmul)
    bh = bh_ref[...]
    bw = bw_ref[...]

    # key j in tile kj sits at grid cell (kj*rows_per_tile + j//side,
    # j%side).  Expand the thin biases over the key tile with one-hot
    # selection matmuls (dynamic lane slicing is not Mosaic-friendly).
    row_of = jax.lax.broadcasted_iota(jnp.int32, (side, block_k), 0)
    j_of = jax.lax.broadcasted_iota(jnp.int32, (side, block_k), 1)
    sel_w = (row_of == j_of % side).astype(q.dtype)  # (side, BLOCK_K)
    sel_h = (row_of == kj * rows_per_tile + j_of // side).astype(q.dtype)

    k = k_ref[...]
    v = v_ref[...]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    s = s + jnp.dot(bh, sel_h, preferred_element_type=jnp.float32)
    s = s + jnp.dot(bw, sel_w, preferred_element_type=jnp.float32)

    m_prev = m_ref[...]
    m_new = jnp.maximum(m_prev, s.max(axis=1, keepdims=True))
    m_ref[...] = m_new
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_ref[...] = l_ref[...] * alpha + p.sum(axis=1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(kj == n_k - 1)
    def _():
        o_ref[...] = (
            acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)
        ).astype(o_ref.dtype)

def _window_kernel(q_ref, k_ref, v_ref, bh_ref, bw_ref, o_ref, *,
                   scale: float, side: int, valid: int, group: int):
    """A group of windows per grid step (statically unrolled) to amortise
    grid overhead: one-shot softmax over <=256 tokens per window with the
    decomposed rel-pos bias expanded by one-hot selection matmuls."""
    tp = q_ref.shape[1]
    row_of = jax.lax.broadcasted_iota(jnp.int32, (side, tp), 0)
    j_of = jax.lax.broadcasted_iota(jnp.int32, (side, tp), 1)
    in_win = j_of < valid
    sel_h = ((row_of == j_of // side) & in_win).astype(q_ref.dtype)
    sel_w = ((row_of == j_of % side) & in_win).astype(q_ref.dtype)
    col_ok = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1) < valid

    for w in range(group):
        q = q_ref[w]
        k = k_ref[w]
        v = v_ref[w]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        s = s + jnp.dot(bh_ref[w], sel_h, preferred_element_type=jnp.float32)
        s = s + jnp.dot(bw_ref[w], sel_w, preferred_element_type=jnp.float32)
        s = jnp.where(col_ok, s, -1e30)
        m = s.max(axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = p.sum(axis=1, keepdims=True)
        o_ref[w] = (
            jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
            / jnp.maximum(l, 1e-30)
        ).astype(o_ref.dtype)

def _window_kernel_v6(q_ref, k_ref, v_ref, bhw_ref, o_ref, *,
                      scale: float, side: int, valid: int, group: int):
    """v1 structure (in-kernel k.T, no XLA-side transposes) with the two
    bias expansions fused into ONE one-hot matmul: [bias_h | bias_w] @
    sel_hw, cutting MXU passes per window from 16 to 12."""
    tp = q_ref.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (2 * side, tp), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (2 * side, tp), 1)
    in_win = j < valid
    top = row < side
    sel = (top & (row == j // side)) | (
        jnp.logical_not(top) & ((row - side) == (j % side)))
    sel = (sel & in_win).astype(q_ref.dtype)
    col_ok = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1) < valid

    for w in range(group):
        q = q_ref[w]
        k = k_ref[w]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        s = s + jnp.dot(bhw_ref[w], sel, preferred_element_type=jnp.float32)
        s = jnp.where(col_ok, s, -1e30)
        m = s.max(axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = p.sum(axis=1, keepdims=True)
        o_ref[w] = (
            jnp.dot(p.astype(v_ref.dtype), v_ref[w],
                    preferred_element_type=jnp.float32)
            / jnp.maximum(l, 1e-30)
        ).astype(o_ref.dtype)


def sam_window_attention_v6(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    rel_pos_h: jnp.ndarray, rel_pos_w: jnp.ndarray,
    side: int, interpret: bool = False, group: int | None = None,
) -> jnp.ndarray:
    """Windowed ViTDet attention, v6 (see :func:`_window_kernel_v6`).
    Same contract as :func:`sam_window_attention`."""
    G, T, hd = q.shape
    assert T == side * side
    tp = ((T + 15) // 16) * 16
    scale = 1.0 / math.sqrt(hd)

    coords = jnp.arange(side)[:, None] - jnp.arange(side)[None, :] + side - 1
    rh = rel_pos_h[coords].astype(q.dtype)
    rw = rel_pos_w[coords].astype(q.dtype)
    qg = q.reshape(G, side, side, hd)
    bias_h = jnp.einsum("gyxd,ykd->gyxk", qg, rh,
                        preferred_element_type=jnp.float32).reshape(G, T, side)
    bias_w = jnp.einsum("gyxd,xkd->gyxk", qg, rw,
                        preferred_element_type=jnp.float32).reshape(G, T, side)
    bhw = jnp.concatenate([bias_h, bias_w], axis=-1).astype(jnp.bfloat16)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, tp - T), (0, 0)))

    qp, kp, vp, bhwp = pad(q), pad(k), pad(v), pad(bhw)

    if group is None:
        group = 16 if G % 16 == 0 else (8 if G % 8 == 0 else 1)
    assert G % group == 0, (G, group)
    kernel = functools.partial(_window_kernel_v6, scale=scale, side=side,
                               valid=T, group=group)
    out = pl.pallas_call(
        kernel,
        grid=(G // group,),
        in_specs=[
            pl.BlockSpec((group, tp, hd), lambda g: (g, 0, 0)),
            pl.BlockSpec((group, tp, hd), lambda g: (g, 0, 0)),
            pl.BlockSpec((group, tp, hd), lambda g: (g, 0, 0)),
            pl.BlockSpec((group, tp, 2 * side), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((group, tp, hd), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, tp, hd), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, bhwp)
    return out[:, :T]

def _window_kernel_v7(q_ref, k_ref, v_ref, o_ref, *,
                      side: int, hd: int, valid: int, group: int):
    """v6's layout discipline (no XLA-side transposes, in-kernel ``.T``)
    with the bias expansion folded INTO the score matmul: the augmented
    key matrix ``b = [k | sel_h | sel_w]`` is assembled in VMEM by adding
    an iota-built one-hot mask to the zero-lane-padded keys, so scores and
    both decomposed rel-pos biases come out of ONE ``a @ b.T`` with a
    single 128-wide K tile -- 8 MXU passes/window vs v6's 12.  Unlike v3
    (which measured slower than v6), no operand is transposed by XLA and
    ``k`` rides to VMEM in its natural layout."""
    tp = q_ref.shape[1]
    kp = q_ref.shape[2]
    j = jax.lax.broadcasted_iota(jnp.int32, (tp, kp), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (tp, kp), 1)
    in_win = j < valid
    sel_h = (c >= hd) & (c < hd + side) & ((c - hd) == j // side)
    sel_w = (c >= hd + side) & (c < hd + 2 * side) & \
        ((c - hd - side) == (j % side))
    sel = ((sel_h | sel_w) & in_win).astype(k_ref.dtype)
    col_ok = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1) < valid

    for w in range(group):
        b = k_ref[w] + sel
        s = jnp.dot(q_ref[w], b.T, preferred_element_type=jnp.float32)
        s = jnp.where(col_ok, s, -1e30)
        m = s.max(axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = p.sum(axis=1, keepdims=True)
        o_ref[w] = (
            jnp.dot(p.astype(v_ref.dtype), v_ref[w],
                    preferred_element_type=jnp.float32)
            / jnp.maximum(l, 1e-30)
        ).astype(o_ref.dtype)


def sam_window_attention_v7(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    rel_pos_h: jnp.ndarray, rel_pos_w: jnp.ndarray,
    side: int, interpret: bool = False, group: int | None = None,
) -> jnp.ndarray:
    """Windowed ViTDet attention, v7 (see :func:`_window_kernel_v7`).
    Same contract as :func:`sam_window_attention`."""
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
    bias_h = jnp.einsum("gyxd,ykd->gyxk", qg, rh,
                        preferred_element_type=jnp.float32).reshape(G, T, side)
    bias_w = jnp.einsum("gyxd,xkd->gyxk", qg, rw,
                        preferred_element_type=jnp.float32).reshape(G, T, side)

    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    a = jnp.concatenate(
        [qs, bias_h.astype(q.dtype), bias_w.astype(q.dtype)], axis=-1)
    a = jnp.pad(a, ((0, 0), (0, tp - T), (0, kp - ka)))
    kpad = jnp.pad(k, ((0, 0), (0, tp - T), (0, kp - hd)))
    vp = jnp.pad(v, ((0, 0), (0, tp - T), (0, 0)))

    if group is None:
        group = 16 if G % 16 == 0 else (8 if G % 8 == 0 else 1)
    assert G % group == 0, (G, group)
    kernel = functools.partial(_window_kernel_v7, side=side, hd=hd,
                               valid=T, group=group)
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
    )(a, kpad, vp)
    return out[:, :T]

def _window_kernel_v8(q_ref, k_ref, v_ref, o_ref, *,
                      valid: int, group: int):
    """v7 with the one-hot selection columns pre-added to the keys by XLA
    (an elementwise add fused into the lane pad -- still no transposes),
    so the body is one pure augmented-K matmul + softmax + pv."""
    tp = q_ref.shape[1]
    col_ok = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1) < valid
    for w in range(group):
        s = jnp.dot(q_ref[w], k_ref[w].T, preferred_element_type=jnp.float32)
        s = jnp.where(col_ok, s, -1e30)
        m = s.max(axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = p.sum(axis=1, keepdims=True)
        o_ref[w] = (
            jnp.dot(p.astype(v_ref.dtype), v_ref[w],
                    preferred_element_type=jnp.float32)
            / jnp.maximum(l, 1e-30)
        ).astype(o_ref.dtype)


def sam_window_attention_v8(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    rel_pos_h: jnp.ndarray, rel_pos_w: jnp.ndarray,
    side: int, interpret: bool = False, group: int | None = None,
) -> jnp.ndarray:
    """Windowed ViTDet attention, v8 (see :func:`_window_kernel_v8`).
    Same contract as :func:`sam_window_attention`."""
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
    bias_h = jnp.einsum("gyxd,ykd->gyxk", qg, rh,
                        preferred_element_type=jnp.float32).reshape(G, T, side)
    bias_w = jnp.einsum("gyxd,xkd->gyxk", qg, rw,
                        preferred_element_type=jnp.float32).reshape(G, T, side)

    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    a = jnp.concatenate(
        [qs, bias_h.astype(q.dtype), bias_w.astype(q.dtype)], axis=-1)
    a = jnp.pad(a, ((0, 0), (0, tp - T), (0, kp - ka)))

    j = jnp.arange(T)
    r = jnp.arange(side)
    selh = (r[:, None] == (j // side)[None, :]).astype(q.dtype)  # (side, T)
    selw = (r[:, None] == (j % side)[None, :]).astype(q.dtype)
    sel = jnp.concatenate([selh, selw], axis=0).T  # (T, 2*side)
    sel = jnp.pad(sel, ((0, tp - T), (hd, kp - ka)))  # lanes hd..hd+2*side
    kaug = jnp.pad(k, ((0, 0), (0, tp - T), (0, kp - hd)))
    kaug = kaug + sel[None]
    vp = jnp.pad(v, ((0, 0), (0, tp - T), (0, 0)))

    if group is None:
        group = 16 if G % 16 == 0 else (8 if G % 8 == 0 else 1)
    assert G % group == 0, (G, group)
    kernel = functools.partial(_window_kernel_v8, valid=T, group=group)
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

def _window_kernel_v2(q_ref, kt_ref, v_ref, bias_ref, o_ref, *,
                      group: int):
    """A group of windows per grid step; bias arrives pre-expanded
    (tp, tp) per window, keys pre-transposed (hd, tp)."""
    for w in range(group):
        s = jnp.dot(q_ref[w], kt_ref[w], preferred_element_type=jnp.float32)
        s = s + bias_ref[w].astype(jnp.float32)
        m = s.max(axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = p.sum(axis=1, keepdims=True)
        o = jnp.dot(p.astype(v_ref.dtype), v_ref[w],
                    preferred_element_type=jnp.float32)
        o_ref[w] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def sam_window_attention_v2(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    rel_pos_h: jnp.ndarray, rel_pos_w: jnp.ndarray,
    side: int, interpret: bool = False, group: int | None = None,
) -> jnp.ndarray:
    """Windowed ViTDet attention, v2: the decomposed rel-pos bias (plus the
    -inf padding-column mask) is expanded to a dense (G, tp, tp) bf16 tensor
    by XLA *outside* the kernel -- for the 14x14 windows the one-hot
    selection matmuls of v1 contract over K=14, the worst possible MXU
    shape, and cost ~4x the actual attention matmuls.  Dense bias is ~2
    extra HBM passes instead.  Keys are delivered pre-transposed; q is
    pre-scaled.

    Same contract as :func:`sam_window_attention`.
    """
    G, T, hd = q.shape
    assert T == side * side
    tp = ((T + 15) // 16) * 16
    scale = 1.0 / math.sqrt(hd)

    coords = jnp.arange(side)[:, None] - jnp.arange(side)[None, :] + side - 1
    rh = rel_pos_h[coords].astype(q.dtype)
    rw = rel_pos_w[coords].astype(q.dtype)
    qg = q.reshape(G, side, side, hd)
    bias_h = jnp.einsum("gyxd,ykd->gyxk", qg, rh,
                        preferred_element_type=jnp.float32)
    bias_w = jnp.einsum("gyxd,xkd->gyxk", qg, rw,
                        preferred_element_type=jnp.float32)
    # (G, y, x, yk, xk) -> (G, T, T) row-major over the key grid, padded
    # with -inf key columns so the softmax ignores them
    bias = (bias_h[:, :, :, :, None] + bias_w[:, :, :, None, :]).reshape(
        G, T, T)
    bias = jnp.pad(bias, ((0, 0), (0, tp - T), (0, tp - T)),
                   constant_values=-1e30)
    bias = bias.astype(jnp.bfloat16)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, tp - T), (0, 0)))

    qp = pad((q.astype(jnp.float32) * scale).astype(q.dtype))
    kt = jnp.swapaxes(pad(k), 1, 2)  # (G, hd, tp)
    vp = pad(v)

    if group is None:
        group = 16 if G % 16 == 0 else (8 if G % 8 == 0 else 1)
    assert G % group == 0, (G, group)
    kernel = functools.partial(_window_kernel_v2, group=group)
    out = pl.pallas_call(
        kernel,
        grid=(G // group,),
        in_specs=[
            pl.BlockSpec((group, tp, hd), lambda g: (g, 0, 0)),
            pl.BlockSpec((group, hd, tp), lambda g: (g, 0, 0)),
            pl.BlockSpec((group, tp, hd), lambda g: (g, 0, 0)),
            pl.BlockSpec((group, tp, tp), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((group, tp, hd), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, tp, hd), q.dtype),
        interpret=interpret,
    )(qp, kt, vp, bias)
    return out[:, :T]

def _window_kernel_v4(a_ref, b_ref, v_ref, o_ref, *, group: int):
    """Unrolled per-window loop (faster than batched dot_general on
    Mosaic) with the v4 economies: augmented-K fused scores+bias, bf16
    scores, matmul-fused softmax denominator."""
    for w in range(group):
        s = jnp.dot(a_ref[w], b_ref[w],
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        m = s.max(axis=1, keepdims=True)
        p = jnp.exp(s - m)
        ol = jnp.dot(p, v_ref[w], preferred_element_type=jnp.float32)
        o_ref[w] = (ol[:, :-1] / jnp.maximum(ol[:, -1:], 1e-30)).astype(
            o_ref.dtype)


def sam_window_attention_v4(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    rel_pos_h: jnp.ndarray, rel_pos_w: jnp.ndarray,
    side: int, interpret: bool = False, group: int | None = None,
) -> jnp.ndarray:
    """Windowed ViTDet attention, v4 (see :func:`_window_kernel_v4`).
    Same contract as :func:`sam_window_attention`."""
    return _window_attention_augmented(
        q, k, v, rel_pos_h, rel_pos_w, side, interpret=interpret,
        group=group, kernel_fn=_window_kernel_v4)

def _window_kernel_v5(a_ref, b_ref, v_ref, o_ref, *, group: int):
    """Software-pipelined unrolled loop: window w+1's score matmul (MXU)
    is issued before window w's softmax (VPU), so the two units overlap
    instead of serialising within each iteration."""

    def score(w):
        return jnp.dot(a_ref[w], b_ref[w],
                       preferred_element_type=jnp.float32)

    s_next = score(0)
    for w in range(group):
        s = s_next
        if w + 1 < group:
            s_next = score(w + 1)
        m = s.max(axis=1, keepdims=True)
        p = jnp.exp(s - m)
        ol = jnp.dot(p.astype(v_ref.dtype), v_ref[w],
                     preferred_element_type=jnp.float32)
        o_ref[w] = (ol[:, :-1] / jnp.maximum(ol[:, -1:], 1e-30)).astype(
            o_ref.dtype)


def sam_window_attention_v5(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    rel_pos_h: jnp.ndarray, rel_pos_w: jnp.ndarray,
    side: int, interpret: bool = False, group: int | None = None,
) -> jnp.ndarray:
    """Windowed ViTDet attention, v5: v4's augmented-K operands with a
    software-pipelined kernel body.  Same contract as
    :func:`sam_window_attention`."""
    return _window_attention_augmented(
        q, k, v, rel_pos_h, rel_pos_w, side, interpret=interpret,
        group=group, kernel_fn=_window_kernel_v5)

def _window_attention_augmented(
    q, k, v, rel_pos_h, rel_pos_w, side, interpret, group, kernel_fn,
):
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
    bias_h = jnp.einsum("gyxd,ykd->gyxk", qg, rh,
                        preferred_element_type=jnp.float32).reshape(G, T, side)
    bias_w = jnp.einsum("gyxd,xkd->gyxk", qg, rw,
                        preferred_element_type=jnp.float32).reshape(G, T, side)

    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    ones = jnp.ones((G, T, 1), q.dtype)
    a = jnp.concatenate(
        [qs, bias_h.astype(q.dtype), bias_w.astype(q.dtype), ones], axis=-1)
    a = jnp.pad(a, ((0, 0), (0, tp - T), (0, kp - ka - 1)))

    kt = jnp.swapaxes(k, 1, 2)
    j = jnp.arange(T)
    r = jnp.arange(side)
    selh = (r[:, None] == (j // side)[None, :]).astype(q.dtype)
    selw = (r[:, None] == (j % side)[None, :]).astype(q.dtype)
    sel = jnp.broadcast_to(
        jnp.concatenate([selh, selw], axis=0)[None], (G, 2 * side, T))
    maskrow = jnp.zeros((G, 1, T), q.dtype)
    b = jnp.concatenate([kt, sel, maskrow], axis=1)
    b = jnp.pad(b, ((0, 0), (0, kp - ka - 1), (0, tp - T)))
    if tp > T:
        pen = jnp.concatenate([
            jnp.zeros((G, ka, tp - T), q.dtype),
            jnp.full((G, 1, tp - T), -1e4, q.dtype),
            jnp.zeros((G, kp - ka - 1, tp - T), q.dtype)], axis=1)
        b = b.at[:, :, T:].set(pen)

    va = jnp.concatenate([v, jnp.ones((G, T, 1), v.dtype)], axis=-1)
    va = jnp.pad(va, ((0, 0), (0, tp - T), (0, 0)))

    if group is None:
        group = 16 if G % 16 == 0 else (8 if G % 8 == 0 else 1)
    assert G % group == 0, (G, group)
    kernel = functools.partial(kernel_fn, group=group)
    out = pl.pallas_call(
        kernel,
        grid=(G // group,),
        in_specs=[
            pl.BlockSpec((group, tp, kp), lambda g: (g, 0, 0)),
            pl.BlockSpec((group, kp, tp), lambda g: (g, 0, 0)),
            pl.BlockSpec((group, tp, hd + 1), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((group, tp, hd), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, tp, hd), q.dtype),
        interpret=interpret,
    )(a, b, va)
    return out[:, :T]

def _window_kernel_v3(a_ref, b_ref, v_ref, o_ref):
    """Batched one-shot softmax over a group of windows.

    ``a`` = [q*scale | bias_h | bias_w] and ``b`` = [k^T ; sel_h ; sel_w]
    concatenated along the contraction dim (zero-padded to 128), so scores
    *and* the decomposed rel-pos bias come out of ONE batched matmul --
    K=hd+2*side stays within a single 128-wide MXU K-tile for 14x14
    windows, halving the MXU passes vs separate bias matmuls.  Padded key
    columns carry a -1e30 contribution via the sel columns of ``a``/``b``
    (see builder), padded q rows are sliced off outside.
    """
    a = a_ref[...]
    b = b_ref[...]
    s = jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (group, tp, tp)
    m = s.max(axis=2, keepdims=True)
    p = jnp.exp(s - m)
    l = p.sum(axis=2, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[...], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[...] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def sam_window_attention_v3(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    rel_pos_h: jnp.ndarray, rel_pos_w: jnp.ndarray,
    side: int, interpret: bool = False, group: int | None = None,
) -> jnp.ndarray:
    """Windowed ViTDet attention via a single augmented-K matmul per
    window group (see :func:`_window_kernel_v3`).  Same contract as
    :func:`sam_window_attention`."""
    G, T, hd = q.shape
    assert T == side * side
    tp = ((T + 15) // 16) * 16
    ka = hd + 2 * side  # augmented contraction width
    kp = ((ka + 127) // 128) * 128
    scale = 1.0 / math.sqrt(hd)

    coords = jnp.arange(side)[:, None] - jnp.arange(side)[None, :] + side - 1
    rh = rel_pos_h[coords].astype(q.dtype)
    rw = rel_pos_w[coords].astype(q.dtype)
    qg = q.reshape(G, side, side, hd)
    bias_h = jnp.einsum("gyxd,ykd->gyxk", qg, rh,
                        preferred_element_type=jnp.float32).reshape(G, T, side)
    bias_w = jnp.einsum("gyxd,xkd->gyxk", qg, rw,
                        preferred_element_type=jnp.float32).reshape(G, T, side)

    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    # a: (G, tp, kp) = [q*scale | bias_h | bias_w | pad-flag | 0...]
    # the pad-flag column (=1 for every real q row) pairs with a -1e30 row
    # in b at padded key columns, masking them inside the fused matmul
    ones = jnp.ones((G, T, 1), q.dtype)
    a = jnp.concatenate(
        [qs, bias_h.astype(q.dtype), bias_w.astype(q.dtype), ones], axis=-1)
    a = jnp.pad(a, ((0, 0), (0, tp - T), (0, kp - ka - 1)))

    # b: (G, kp, tp) = [k^T ; sel_h ; sel_w ; pad-mask row ; 0...]
    kt = jnp.swapaxes(k, 1, 2)  # (G, hd, T)
    j = jnp.arange(T)
    r = jnp.arange(side)
    selh = (r[:, None] == (j // side)[None, :]).astype(q.dtype)
    selw = (r[:, None] == (j % side)[None, :]).astype(q.dtype)
    sel = jnp.broadcast_to(
        jnp.concatenate([selh, selw], axis=0)[None], (G, 2 * side, T))
    maskrow = jnp.zeros((G, 1, T), q.dtype)  # real keys: no penalty
    b = jnp.concatenate([kt, sel, maskrow], axis=1)  # (G, ka+1, T)
    b = jnp.pad(b, ((0, 0), (0, kp - ka - 1), (0, tp - T)))
    if tp > T:  # padded key columns: -1e30 via the pad-flag lane
        pen = jnp.concatenate([
            jnp.zeros((G, ka, tp - T), q.dtype),
            jnp.full((G, 1, tp - T), -1e30, q.dtype),
            jnp.zeros((G, kp - ka - 1, tp - T), q.dtype)], axis=1)
        b = b.at[:, :, T:].set(pen)

    vp = jnp.pad(v, ((0, 0), (0, tp - T), (0, 0)))

    if group is None:
        group = 16 if G % 16 == 0 else (8 if G % 8 == 0 else 1)
    assert G % group == 0, (G, group)
    out = pl.pallas_call(
        _window_kernel_v3,
        grid=(G // group,),
        in_specs=[
            pl.BlockSpec((group, tp, kp), lambda g: (g, 0, 0)),
            pl.BlockSpec((group, kp, tp), lambda g: (g, 0, 0)),
            pl.BlockSpec((group, tp, hd), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((group, tp, hd), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, tp, hd), q.dtype),
        interpret=interpret,
    )(a, b, vp)
    return out[:, :T]

def sam_window_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    rel_pos_h: jnp.ndarray, rel_pos_w: jnp.ndarray,
    side: int, interpret: bool = False, group: int | None = None,
) -> jnp.ndarray:
    """Windowed ViTDet attention (reference image_encoder windowed blocks).

    Args:
      q, k, v: ``(G, T, hd)`` per-window tokens, ``T = side*side`` (padded
        internally to a sublane multiple).
      rel_pos_h/w: ``(2*side-1, hd)``.

    Returns ``(G, T, hd)``.
    """
    G, T, hd = q.shape
    assert T == side * side
    tp = ((T + 15) // 16) * 16
    scale = 1.0 / math.sqrt(hd)

    coords = jnp.arange(side)[:, None] - jnp.arange(side)[None, :] + side - 1
    rh = rel_pos_h[coords].astype(q.dtype)
    rw = rel_pos_w[coords].astype(q.dtype)
    qg = q.reshape(G, side, side, hd)
    bias_h = jnp.einsum("gyxd,ykd->gyxk", qg, rh,
                        preferred_element_type=jnp.float32).reshape(G, T, side)
    bias_w = jnp.einsum("gyxd,xkd->gyxk", qg, rw,
                        preferred_element_type=jnp.float32).reshape(G, T, side)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, tp - T), (0, 0)))

    qp, kp, vp = pad(q), pad(k), pad(v)
    bh = pad(bias_h).astype(jnp.bfloat16)
    bw = pad(bias_w).astype(jnp.bfloat16)

    if group is None:
        group = 16 if G % 16 == 0 else (8 if G % 8 == 0 else 1)
    assert G % group == 0, (G, group)
    kernel = functools.partial(_window_kernel, scale=scale, side=side,
                               valid=T, group=group)

    out = pl.pallas_call(
        kernel,
        grid=(G // group,),
        in_specs=[
            pl.BlockSpec((group, tp, hd), lambda g: (g, 0, 0)),
            pl.BlockSpec((group, tp, hd), lambda g: (g, 0, 0)),
            pl.BlockSpec((group, tp, hd), lambda g: (g, 0, 0)),
            pl.BlockSpec((group, tp, side), lambda g: (g, 0, 0)),
            pl.BlockSpec((group, tp, side), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((group, tp, hd), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, tp, hd), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, bh, bw)
    return out[:, :T]

def _oneshot_kernel(q_ref, kt_ref, v_ref, bh_ref, bw_ref, selh_ref,
                    selw_ref, o_ref, *, bias_mode: str, side: int):
    """One (g, i) step: full-row softmax over all S keys at once.

    ``q`` arrives pre-scaled in f32 then cast (one extra bf16 rounding,
    same order as storing q itself).  ``kt`` is (hd, S) -- pre-transposed
    outside so the kernel never relayouts.  The decomposed rel-pos bias is
    expanded either with precomputed one-hot selection matmuls (MXU) or a
    reshape-broadcast add (VPU).
    """
    q = q_ref[0]
    s = jnp.dot(q, kt_ref[0], preferred_element_type=jnp.float32)
    if bias_mode == "matmul":
        s = s + jnp.dot(bh_ref[0], selh_ref[...],
                        preferred_element_type=jnp.float32)
        s = s + jnp.dot(bw_ref[0], selw_ref[...],
                        preferred_element_type=jnp.float32)
    else:  # broadcast: s rows are (yk, xk) row-major over the key grid
        bq = s.shape[0]
        s3 = s.reshape(bq, s.shape[1] // side, side)
        s3 = s3 + bh_ref[0].astype(jnp.float32)[:, :, None]
        s3 = s3 + bw_ref[0].astype(jnp.float32)[:, None, :]
        s = s3.reshape(bq, s.shape[1])
    m = s.max(axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = p.sum(axis=1, keepdims=True)
    o = jnp.dot(p.astype(v_ref.dtype), v_ref[0],
                preferred_element_type=jnp.float32)
    o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def sam_global_attention_v2(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    rel_pos_h: jnp.ndarray, rel_pos_w: jnp.ndarray,
    side: int, interpret: bool = False,
    block_q: int = 256, bias_mode: str = "matmul",
) -> jnp.ndarray:
    """Rewritten global ViTDet attention: one-shot softmax over the full
    key row (S f32 scores fit VMEM for SAM's S=4096), pre-transposed keys,
    q pre-scaled, selection matrices hoisted out of the kernel.

    Same contract as :func:`sam_global_attention`.
    """
    G, S, hd = q.shape
    block_q = min(block_q, S)
    assert S == side * side and S % block_q == 0
    scale = 1.0 / math.sqrt(hd)

    coords = jnp.arange(side)[:, None] - jnp.arange(side)[None, :] + side - 1
    rh = rel_pos_h[coords].astype(q.dtype)
    rw = rel_pos_w[coords].astype(q.dtype)
    qg = q.reshape(G, side, side, hd)
    bias_h = jnp.einsum("gyxd,ykd->gyxk", qg, rh,
                        preferred_element_type=jnp.float32).reshape(G, S, side)
    bias_w = jnp.einsum("gyxd,xkd->gyxk", qg, rw,
                        preferred_element_type=jnp.float32).reshape(G, S, side)
    bias_h = bias_h.astype(jnp.bfloat16)
    bias_w = bias_w.astype(jnp.bfloat16)

    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    kt = jnp.swapaxes(k, 1, 2)  # (G, hd, S): XLA transpose, once
    # one-hot selection matrices over the full key row (shared across g,
    # index map is constant so Mosaic keeps them resident)
    j = jnp.arange(S)
    r = jnp.arange(side)
    selh = (r[:, None] == (j // side)[None, :]).astype(q.dtype)
    selw = (r[:, None] == (j % side)[None, :]).astype(q.dtype)

    kernel = functools.partial(_oneshot_kernel, bias_mode=bias_mode,
                               side=side)
    out = pl.pallas_call(
        kernel,
        grid=(G, S // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, hd, S), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, S, hd), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, block_q, side), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, block_q, side), lambda g, i: (g, i, 0)),
            pl.BlockSpec((side, S), lambda g, i: (0, 0)),
            pl.BlockSpec((side, S), lambda g, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda g, i: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct((G, S, hd), q.dtype),
        interpret=interpret,
    )(qs, kt, v, bias_h, bias_w, selh, selw)
    return out

def _global_kernel_v4(a_ref, b_ref, v_ref, o_ref):
    """v3 + two VMEM-pass cuts: scores stored bf16 (MXU still accumulates
    f32 internally) and the softmax denominator comes out of the PV matmul
    via a ones-column appended to v (l = p @ 1), removing the separate sum
    pass over the (block_q, S) tensor."""
    # Mosaic requires 32-bit matmul accumulation; cast once, then every
    # softmax pass runs on half-width bf16
    s = jnp.dot(a_ref[0], b_ref[0],
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    m = s.max(axis=1, keepdims=True)
    p = jnp.exp(s - m)  # bf16 in, bf16 out
    ol = jnp.dot(p, v_ref[0], preferred_element_type=jnp.float32)
    o = ol[:, :-1]
    l = ol[:, -1:]
    o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def sam_global_attention_v4(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    rel_pos_h: jnp.ndarray, rel_pos_w: jnp.ndarray,
    side: int, interpret: bool = False, block_q: int = 256,
) -> jnp.ndarray:
    """Global ViTDet attention, v4: augmented-K fused scores+bias matmul
    (v3) with bf16 scores and matmul-fused softmax denominator.  Same
    contract as :func:`sam_global_attention`; softmax weights carry bf16
    (~0.4%) rounding, in line with the bf16 tower itself."""
    G, S, hd = q.shape
    assert S == side * side
    block_q, _ = _pick_block_q(S, block_q)
    ka = hd + 2 * side
    kp = ((ka + 127) // 128) * 128
    scale = 1.0 / math.sqrt(hd)

    coords = jnp.arange(side)[:, None] - jnp.arange(side)[None, :] + side - 1
    rh = rel_pos_h[coords].astype(q.dtype)
    rw = rel_pos_w[coords].astype(q.dtype)
    qg = q.reshape(G, side, side, hd)
    bias_h = jnp.einsum("gyxd,ykd->gyxk", qg, rh,
                        preferred_element_type=jnp.float32).reshape(G, S, side)
    bias_w = jnp.einsum("gyxd,xkd->gyxk", qg, rw,
                        preferred_element_type=jnp.float32).reshape(G, S, side)

    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    a = jnp.concatenate(
        [qs, bias_h.astype(q.dtype), bias_w.astype(q.dtype)], axis=-1)
    a = jnp.pad(a, ((0, 0), (0, 0), (0, kp - ka)))

    kt = jnp.swapaxes(k, 1, 2)  # (G, hd, S)
    j = jnp.arange(S)
    r = jnp.arange(side)
    selh = (r[:, None] == (j // side)[None, :]).astype(q.dtype)
    selw = (r[:, None] == (j % side)[None, :]).astype(q.dtype)
    sel = jnp.broadcast_to(
        jnp.concatenate([selh, selw], axis=0)[None], (G, 2 * side, S))
    b = jnp.concatenate([kt, sel], axis=1)
    b = jnp.pad(b, ((0, 0), (0, kp - ka), (0, 0)))

    # v with a ones-column: PV matmul emits [o | l]
    va = jnp.concatenate([v, jnp.ones((G, S, 1), v.dtype)], axis=-1)

    out = pl.pallas_call(
        _global_kernel_v4,
        grid=(G, S // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, kp), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, kp, S), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, S, hd + 1), lambda g, i: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda g, i: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct((G, S, hd), q.dtype),
        interpret=interpret,
    )(a, b, va)
    return out

def _global_kernel_v6(a_ref, b_ref, v_ref, o_ref, *, chunks: int):
    """v3 with the q-tile split into chunks whose score matmuls are
    issued ahead of the previous chunk's softmax, letting the MXU and the
    (dominant) VPU exp work overlap."""
    a = a_ref[0]
    b = b_ref[0]
    vv = v_ref[0]
    n = a.shape[0] // chunks

    def score(i):
        return jnp.dot(a[i * n:(i + 1) * n], b,
                       preferred_element_type=jnp.float32)

    s_next = score(0)
    outs = []
    for i in range(chunks):
        s = s_next
        if i + 1 < chunks:
            s_next = score(i + 1)
        m = s.max(axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = p.sum(axis=1, keepdims=True)
        o = jnp.dot(p.astype(vv.dtype), vv,
                    preferred_element_type=jnp.float32)
        outs.append((o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=0)


def sam_global_attention_v6(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    rel_pos_h: jnp.ndarray, rel_pos_w: jnp.ndarray,
    side: int, interpret: bool = False, block_q: int = 512,
    chunks: int = 8,
) -> jnp.ndarray:
    """Global ViTDet attention, v6: augmented-K fused bias (v3) +
    software-pipelined softmax chunks.  Same contract as
    :func:`sam_global_attention`."""
    G, S, hd = q.shape
    assert S == side * side
    block_q, chunks = _pick_block_q(S, block_q, chunks)
    ka = hd + 2 * side
    kp = ((ka + 127) // 128) * 128
    scale = 1.0 / math.sqrt(hd)

    coords = jnp.arange(side)[:, None] - jnp.arange(side)[None, :] + side - 1
    rh = rel_pos_h[coords].astype(q.dtype)
    rw = rel_pos_w[coords].astype(q.dtype)
    qg = q.reshape(G, side, side, hd)
    bias_h = jnp.einsum("gyxd,ykd->gyxk", qg, rh,
                        preferred_element_type=jnp.float32).reshape(G, S, side)
    bias_w = jnp.einsum("gyxd,xkd->gyxk", qg, rw,
                        preferred_element_type=jnp.float32).reshape(G, S, side)

    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
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

    kernel = functools.partial(_global_kernel_v6, chunks=chunks)
    out = pl.pallas_call(
        kernel,
        grid=(G, S // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, kp), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, kp, S), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, S, hd), lambda g, i: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda g, i: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct((G, S, hd), q.dtype),
        interpret=interpret,
    )(a, b, v)
    return out

def _global_kernel_v7(a_ref, b_ref, v_ref, o_ref):
    """v3 with a base-2 softmax: operands arrive pre-scaled by log2(e), so
    ``exp2`` (the native VPU transcendental) replaces ``exp`` (~6 VPU ops).
    softmax(s) == exp2-softmax(s*log2e) exactly."""
    s = jnp.dot(a_ref[0], b_ref[0], preferred_element_type=jnp.float32)
    m = s.max(axis=1, keepdims=True)
    p = jnp.exp2(s - m)
    l = p.sum(axis=1, keepdims=True)
    o = jnp.dot(p.astype(v_ref.dtype), v_ref[0],
                preferred_element_type=jnp.float32)
    o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

def sam_global_attention_v7(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    rel_pos_h: jnp.ndarray, rel_pos_w: jnp.ndarray,
    side: int, interpret: bool = False, block_q: int = 256,
) -> jnp.ndarray:
    """Global ViTDet attention, v7: augmented-K fused scores+bias with a
    base-2 softmax (see :func:`_global_kernel_v7`).  Same contract as
    :func:`sam_global_attention`."""
    G, S, hd = q.shape
    assert S == side * side
    block_q, _ = _pick_block_q(S, block_q)
    a, b, kp = _global_augmented_operands(
        q, k, v, rel_pos_h, rel_pos_w, side, log2_domain=True)
    out = pl.pallas_call(
        _global_kernel_v7,
        grid=(G, S // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, kp), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, kp, S), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, S, hd), lambda g, i: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda g, i: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct((G, S, hd), q.dtype),
        interpret=interpret,
    )(a, b, v)
    return out

def _global_kernel_v3(a_ref, b_ref, v_ref, o_ref):
    """One (g, i) step: scores + decomposed bias from ONE augmented-K
    matmul (see _window_kernel_v3), one-shot softmax over the full row."""
    s = jnp.dot(a_ref[0], b_ref[0], preferred_element_type=jnp.float32)
    m = s.max(axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = p.sum(axis=1, keepdims=True)
    o = jnp.dot(p.astype(v_ref.dtype), v_ref[0],
                preferred_element_type=jnp.float32)
    o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def sam_global_attention_v3(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    rel_pos_h: jnp.ndarray, rel_pos_w: jnp.ndarray,
    side: int, interpret: bool = False, block_q: int = 256,
) -> jnp.ndarray:
    """Global ViTDet attention: augmented-K fused scores+bias matmul,
    one-shot full-row softmax.  Same contract as
    :func:`sam_global_attention`."""
    G, S, hd = q.shape
    assert S == side * side
    block_q, _ = _pick_block_q(S, block_q)
    ka = hd + 2 * side
    kp = ((ka + 127) // 128) * 128
    scale = 1.0 / math.sqrt(hd)

    coords = jnp.arange(side)[:, None] - jnp.arange(side)[None, :] + side - 1
    rh = rel_pos_h[coords].astype(q.dtype)
    rw = rel_pos_w[coords].astype(q.dtype)
    qg = q.reshape(G, side, side, hd)
    bias_h = jnp.einsum("gyxd,ykd->gyxk", qg, rh,
                        preferred_element_type=jnp.float32).reshape(G, S, side)
    bias_w = jnp.einsum("gyxd,xkd->gyxk", qg, rw,
                        preferred_element_type=jnp.float32).reshape(G, S, side)

    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    a = jnp.concatenate(
        [qs, bias_h.astype(q.dtype), bias_w.astype(q.dtype)], axis=-1)
    a = jnp.pad(a, ((0, 0), (0, 0), (0, kp - ka)))

    kt = jnp.swapaxes(k, 1, 2)  # (G, hd, S)
    j = jnp.arange(S)
    r = jnp.arange(side)
    selh = (r[:, None] == (j // side)[None, :]).astype(q.dtype)
    selw = (r[:, None] == (j % side)[None, :]).astype(q.dtype)
    sel = jnp.broadcast_to(
        jnp.concatenate([selh, selw], axis=0)[None], (G, 2 * side, S))
    b = jnp.concatenate([kt, sel], axis=1)
    b = jnp.pad(b, ((0, 0), (0, kp - ka), (0, 0)))

    out = pl.pallas_call(
        _global_kernel_v3,
        grid=(G, S // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, kp), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, kp, S), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, S, hd), lambda g, i: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda g, i: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct((G, S, hd), q.dtype),
        interpret=interpret,
    )(a, b, v)
    return out

def sam_global_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    rel_pos_h: jnp.ndarray, rel_pos_w: jnp.ndarray,
    side: int, interpret: bool = False,
    block_q: int | None = None, block_k: int | None = None,
) -> jnp.ndarray:
    """Full (non-windowed) ViTDet attention with decomposed rel-pos bias.

    Args:
      q, k, v: ``(G, S, hd)`` with ``S = side*side`` (G = batch*heads).
      rel_pos_h, rel_pos_w: ``(2*side-1, hd)`` tables (q==k geometry).
      side: grid side (64 for SAM@1024).

    Returns ``(G, S, hd)``.
    """
    G, S, hd = q.shape
    # measured on v5e (bs8 SAM-B geometry): (512, 1024) 43 ms vs
    # (512, 512) 56 ms -- wider key tiles amortise the online-softmax
    # rescale; larger query tiles gain nothing (K=hd=64 bounds the MXU)
    block_q = block_q or min(512, S)
    block_k = block_k or min(1024, S)
    assert S == side * side and S % block_q == 0 and S % block_k == 0
    assert block_k % side == 0
    scale = 1.0 / math.sqrt(hd)

    # static rel-pos gathers: (side, side, hd)
    coords = jnp.arange(side)[:, None] - jnp.arange(side)[None, :] + side - 1
    rh = rel_pos_h[coords].astype(q.dtype)
    rw = rel_pos_w[coords].astype(q.dtype)
    qg = q.reshape(G, side, side, hd)
    # thin bias projections: (G, S, side)
    bias_h = jnp.einsum("gyxd,ykd->gyxk", qg, rh,
                        preferred_element_type=jnp.float32).reshape(G, S, side)
    bias_w = jnp.einsum("gyxd,xkd->gyxk", qg, rw,
                        preferred_element_type=jnp.float32).reshape(G, S, side)
    # the bias is applied to *scaled* scores in the reference AFTER the
    # q*scale matmul (attn = q*scale @ k.T; attn += rel terms with raw q)
    bias_h = bias_h.astype(jnp.bfloat16)
    bias_w = bias_w.astype(jnp.bfloat16)

    kernel = functools.partial(_kernel, scale=scale, side=side,
                               block_q=block_q, block_k=block_k)

    def squeezed(q_r, k_r, v_r, bh_r, bw_r, o_r, acc, m, l):
        kernel(q_r.at[0], k_r.at[0], v_r.at[0], bh_r.at[0], bw_r.at[0],
               o_r.at[0], acc, m, l)

    out = pl.pallas_call(
        squeezed,
        grid=(G, S // block_q, S // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, block_k, hd), lambda g, i, j: (g, j, 0)),
            pl.BlockSpec((1, block_k, hd), lambda g, i, j: (g, j, 0)),
            pl.BlockSpec((1, block_q, side), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, block_q, side), lambda g, i, j: (g, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda g, i, j: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct((G, S, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, hd), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, bias_h, bias_w)
    return out

def _window_kernel_v10(qkv_ref, bias_ref, o_ref, *,
                       hg: int, hd: int, side: int, grid_hw: int,
                       nwx: int, scale2: float):
    """One (window-row x head-group) grid step over HEAD-MAJOR spatial
    qkv ``[..., h0:q|k|v, h1:q|k|v, ...]``.

    The BlockSpec does both the window partition (row blocks of a padded
    (B, Hp, Wp, nh*3*hd) tensor) and the head grouping (lane blocks);
    per-head q/k/v are static lane slices, and the output is written back
    spatially -- no XLA-side window partition, head transposes, or
    operand re-materialisation.  Thin rel-pos bias arrives per
    (window, head) and rides the augmented-K matmul (base-2 softmax).
    """
    wy = pl.program_id(1)
    T = side * side
    row = qkv_ref[0]  # (side, Wp, hg*3*hd)

    jr = jax.lax.broadcasted_iota(jnp.int32, (T, hd), 0)
    jc = jax.lax.broadcasted_iota(jnp.int32, (T, hd), 1)
    sel = ((jc == jr // side) | (jc == side + jr % side)) & (jc < 2 * side)
    sel = sel.astype(row.dtype)
    r_of = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1) // side
    c_of = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1) % side

    for wx in range(nwx):
        qkv = row[:, wx * side:(wx + 1) * side].reshape(T, hg * 3 * hd)
        bias = bias_ref[0, 0, wx]  # (hg, T, 2*side) f32
        col_ok = ((wy * side + r_of) < grid_hw) & \
            ((wx * side + c_of) < grid_hw)
        outs = []
        for h in range(hg):
            base = 3 * hd * h
            q = qkv[:, base:base + hd]
            k = qkv[:, base + hd:base + 2 * hd]
            v = qkv[:, base + 2 * hd:base + 3 * hd]
            bpad = jnp.pad(
                bias[h], ((0, 0), (0, hd - 2 * side))).astype(row.dtype)
            a = jnp.concatenate(
                [(q.astype(jnp.float32) * scale2).astype(row.dtype), bpad],
                axis=1)  # (T, 2*hd)
            b = jnp.concatenate([k, sel], axis=1)
            s = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
            s = jnp.where(col_ok, s, -1e30)
            m = s.max(axis=1, keepdims=True)
            p = jnp.exp2(s - m)
            l = p.sum(axis=1, keepdims=True)
            outs.append(
                (jnp.dot(p.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
                 / jnp.maximum(l, 1e-30)).astype(o_ref.dtype))
        o_ref[0, :, wx * side:(wx + 1) * side] = jnp.concatenate(
            outs, axis=1).reshape(side, side, hg * hd)


def sam_window_attention_v10(
    qkv: jnp.ndarray, rel_pos_h: jnp.ndarray, rel_pos_w: jnp.ndarray,
    side: int, grid_hw: int, interpret: bool = False,
    head_group: int = 4,
) -> jnp.ndarray:
    """Windowed ViTDet attention over SPATIAL, HEAD-MAJOR qkv.

    Args:
      qkv: ``(B, Hp, Wp, nh*3*hd)`` with ``Hp``/``Wp`` multiples of
        ``side`` (zero-padded beyond ``grid_hw``); per-token layout
        ``[q_h | k_h | v_h]`` per head (column-permuted wqkv).
      grid_hw: valid spatial extent (e.g. 64 for SAM-1024).

    Returns ``(B, Hp, Wp, nh*hd)`` (pad region garbage; slice outside).
    """
    B, Hp, Wp, C3 = qkv.shape
    assert Hp % side == 0 and Wp % side == 0
    nwy, nwx = Hp // side, Wp // side
    T = side * side
    hd = rel_pos_h.shape[-1]
    nh = C3 // (3 * hd)
    C = nh * hd
    assert 2 * side <= hd, (side, hd)
    hg = head_group if nh % head_group == 0 else nh
    scale2 = (1.0 / math.sqrt(hd)) * _LOG2E

    coords = jnp.arange(side)[:, None] - jnp.arange(side)[None, :] + side - 1
    rh = rel_pos_h[coords].astype(qkv.dtype)  # (side, side, hd)
    rw = rel_pos_w[coords].astype(qkv.dtype)
    q_sp = qkv.reshape(B, nwy, side, nwx, side, nh, 3 * hd)[..., :hd]
    bias_h = jnp.einsum("bYyXxhd,ykd->bYXhyxk", q_sp, rh,
                        preferred_element_type=jnp.float32)
    bias_w = jnp.einsum("bYyXxhd,xkd->bYXhyxk", q_sp, rw,
                        preferred_element_type=jnp.float32)
    bias = jnp.concatenate([bias_h, bias_w], axis=-1) * _LOG2E
    bias = bias.reshape(B, nwy, nwx, nh, T, 2 * side)

    kernel = functools.partial(
        _window_kernel_v10, hg=hg, hd=hd, side=side, grid_hw=grid_hw,
        nwx=nwx, scale2=scale2)
    out = pl.pallas_call(
        kernel,
        grid=(B, nwy, nh // hg),
        in_specs=[
            pl.BlockSpec((1, side, Wp, hg * 3 * hd),
                         lambda b, wy, g: (b, wy, 0, g)),
            pl.BlockSpec((1, 1, nwx, hg, T, 2 * side),
                         lambda b, wy, g: (b, wy, 0, g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, side, Wp, hg * hd),
                               lambda b, wy, g: (b, wy, 0, g)),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp, C), qkv.dtype),
        interpret=interpret,
    )(qkv, bias)
    return out

def qkv_head_major_perm(nh: int, hd: int) -> "jnp.ndarray":
    """Column permutation taking a standard ``[q all | k all | v all]``
    qkv projection to the head-major ``[q_h|k_h|v_h]`` layout v10 wants:
    ``w_hm = w[:, perm]``."""
    C = nh * hd
    idx = []
    for h in range(nh):
        for t in range(3):
            idx.extend(range(t * C + h * hd, t * C + (h + 1) * hd))
    return jnp.asarray(idx, jnp.int32)


def _global_kernel_v11(a_ref, b_ref, v_ref, o_ref, *, chunks: int,
                       valid: int):
    """v8 WITHOUT the running-max subtraction: with the full key range in
    one score matrix the max pass is overflow protection only, not a
    correctness requirement.  Scores are f32 in the log2 domain; exp2
    overflows at 128, i.e. the scheme is exact whenever every attention
    logit stays below ~88.7 nats (LN-bounded SAM activations measure
    |logit| < 40).  Saves one full VPU reduce + subtract pass over the
    S^2 scores."""
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
        p = jnp.exp2(s)
        l = p.sum(axis=1, keepdims=True)
        o = jnp.dot(p.astype(vv.dtype), vv,
                    preferred_element_type=jnp.float32)
        outs.append((o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=0)


def sam_global_attention_v11(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    rel_pos_h: jnp.ndarray, rel_pos_w: jnp.ndarray,
    side: int, interpret: bool = False, block_q: int = 512,
    chunks: int = 8,
) -> jnp.ndarray:
    """v8 minus the softmax max pass (see :func:`_global_kernel_v11`).
    EXPERIMENT: requires attention logits < ~88 nats; production keeps
    v8 unless the measured win justifies the boundedness contract."""
    from flmm_tpu.ops import sam_flash as sf

    G, S, hd = q.shape
    assert S == side * side
    Sp = ((S + 127) // 128) * 128
    a, b, kp = sf._global_augmented_operands(
        q, k, v, rel_pos_h, rel_pos_w, side, log2_domain=True)
    if Sp != S:
        a = jnp.pad(a, ((0, 0), (0, Sp - S), (0, 0)))
        b = jnp.pad(b, ((0, 0), (0, 0), (0, Sp - S)))
        v = jnp.pad(v, ((0, 0), (0, Sp - S), (0, 0)))
    block_q, chunks = sf._pick_block_q(Sp, block_q, chunks)
    kernel = functools.partial(_global_kernel_v11, chunks=chunks, valid=S)
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
