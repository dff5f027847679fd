"""Pallas flash attention for SAM ViTDet global blocks.

The reference's eager path (segment_anything/modeling/image_encoder.py:
224-240) materialises the (B*heads, 4096, 4096) score tensor plus two
decomposed rel-pos bias tensors -- the dominant cost of the whole F-LMM
pipeline on TPU (~60% of SAM encoder time measured on v5e).  This kernel
streams key tiles with online softmax and reconstructs the decomposed
bias *inside* the kernel from the per-query projections::

    bias[i, j] = bias_h[i, yk_j] + bias_w[i, xk_j]

where ``bias_h = einsum(q, Rh)`` / ``bias_w = einsum(q, Rw)`` are thin
``(tokens, side)`` tensors computed outside (134 MB vs 8.6 GB).  Keys are
row-major over the (side, side) grid, so a 128-wide key tile covers
``128/side`` consecutive rows -- the bias tile is a cheap broadcast-add.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
