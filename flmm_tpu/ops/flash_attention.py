"""Pallas flash attention with fused text->image probability capture.

The TPU-native replacement for HF ``output_attentions=True`` (SURVEY.md
section 2.6): a causal flash-attention kernel that, besides the attention
output, emits the *normalised probabilities of every query row over the
image-key block* ``[img_start, img_start + n_img)`` -- the only slice of
the score matrix F-LMM needs -- without ever materialising ``S x S``.

Alignment contract: ``img_start`` and the sequence length must be
multiples of the 128-lane block; the data pipeline guarantees this by
padding the prompt prefix (masked pads with explicit position ids keep
RoPE semantics identical).  ``n_img`` is padded up to a block multiple in
the side output; callers slice ``[..., :n_img]``.

Grid: ``(B * H, S // BLOCK)`` -- one program per query block, scanning key
blocks causally with online softmax; the image-block partial sums live in
a VMEM scratch rescaled together with the accumulator.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128
NEG_INF = -1e30


def _kernel(
    len_ref,  # (B*H,) SMEM: valid sequence lengths (indexed by program 0)
    q_ref,  # (BLOCK, hd)
    k_ref,  # (S, hd)
    v_ref,  # (S, hd)
    o_ref,  # (BLOCK, hd)
    img_ref,  # (BLOCK, n_img_pad)
    acc_ref,  # VMEM (BLOCK, hd) f32
    m_ref,  # VMEM (BLOCK, 1) f32
    l_ref,  # VMEM (BLOCK, 1) f32
    img_acc_ref,  # VMEM (BLOCK, n_img_pad) f32
    *,
    scale: float,
    img_start: int,
    n_img_pad: int,
    seq_len: int,
):
    qi = pl.program_id(1)
    valid_len = len_ref[pl.program_id(0)]

    acc_ref[...] = jnp.zeros_like(acc_ref)
    m_ref[...] = jnp.full_like(m_ref, NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)
    img_acc_ref[...] = jnp.zeros_like(img_acc_ref)

    q = q_ref[...]  # native dtype into the MXU; scale folded in post-matmul
    q_pos = qi * BLOCK + jax.lax.broadcasted_iota(
        jnp.int32, (BLOCK, BLOCK), 0
    )

    num_kb = seq_len // BLOCK
    img_b0 = img_start // BLOCK
    img_b1 = (img_start + n_img_pad) // BLOCK

    def body(kj, _):
        @pl.when(kj <= qi)
        def _():
            k = k_ref[pl.ds(kj * BLOCK, BLOCK), :]
            v = v_ref[pl.ds(kj * BLOCK, BLOCK), :]
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
            k_pos = kj * BLOCK + jax.lax.broadcasted_iota(
                jnp.int32, (BLOCK, BLOCK), 1
            )
            mask = (k_pos <= q_pos) & (k_pos < valid_len)
            s = jnp.where(mask, s, NEG_INF)

            m_prev = m_ref[...]
            m_new = jnp.maximum(m_prev, s.max(axis=1, keepdims=True))
            m_ref[...] = m_new
            alpha = jnp.exp(m_prev - m_new)
            # guard fully-masked rows: s - m_new == 0 would give p == 1
            p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
            l_ref[...] = l_ref[...] * alpha + p.sum(axis=1, keepdims=True)
            acc_ref[...] = acc_ref[...] * alpha + jnp.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
            img_acc_ref[...] = img_acc_ref[...] * alpha

            @pl.when((kj >= img_b0) & (kj < img_b1))
            def _():
                col = (kj - img_b0) * BLOCK
                img_acc_ref[:, pl.ds(col, BLOCK)] = (
                    img_acc_ref[:, pl.ds(col, BLOCK)] * 0.0 + p
                )

        return ()

    jax.lax.fori_loop(0, num_kb, body, ())

    l = jnp.maximum(l_ref[...], 1e-30)
    o_ref[...] = (acc_ref[...] / l).astype(o_ref.dtype)
    img_ref[...] = (img_acc_ref[...] / l).astype(img_ref.dtype)


def _merged_kernel(
    len_ref, q_ref, k_ref, v_ref, valid_ref, mm_ref, o_ref, img_ref,
    acc_ref, m_ref, l_ref, img_acc_ref,
    *, scale: float, img_start: int, n_img_pad: int, seq_len: int,
):
    """Like ``_kernel`` but the image-probability rows are contracted with
    the per-mask merge matrix *inside* the kernel: the side output is the
    ``(M, n_img)`` per-mask attention image directly, accumulated across
    query blocks (sequential TPU grid; reset at qi == 0).

    The memory-optimal form for long anyres sequences: nothing of size
    ``S x n_img`` ever exists.
    """
    qi = pl.program_id(1)

    @pl.when(qi == 0)
    def _():
        img_ref[...] = jnp.zeros_like(img_ref)

    acc_ref[...] = jnp.zeros_like(acc_ref)
    m_ref[...] = jnp.full_like(m_ref, NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)
    img_acc_ref[...] = jnp.zeros_like(img_acc_ref)

    q = q_ref[...]
    q_pos = qi * BLOCK + jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)
    num_kb = seq_len // BLOCK
    img_b0 = img_start // BLOCK
    img_b1 = (img_start + n_img_pad) // BLOCK

    def body(kj, _):
        @pl.when(kj <= qi)
        def _():
            k = k_ref[pl.ds(kj * BLOCK, BLOCK), :]
            v = v_ref[pl.ds(kj * BLOCK, BLOCK), :]
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
            k_pos = kj * BLOCK + jax.lax.broadcasted_iota(
                jnp.int32, (BLOCK, BLOCK), 1)
            k_ok = valid_ref[0, 0, pl.ds(kj * BLOCK, BLOCK)] > 0  # (BLOCK,)
            mask = (k_pos <= q_pos) & k_ok[None, :]
            s = jnp.where(mask, s, NEG_INF)
            m_prev = m_ref[...]
            m_new = jnp.maximum(m_prev, s.max(axis=1, keepdims=True))
            m_ref[...] = m_new
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
            l_ref[...] = l_ref[...] * alpha + p.sum(axis=1, keepdims=True)
            acc_ref[...] = acc_ref[...] * alpha + jnp.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32)
            img_acc_ref[...] = img_acc_ref[...] * alpha

            @pl.when((kj >= img_b0) & (kj < img_b1))
            def _():
                col = (kj - img_b0) * BLOCK
                img_acc_ref[:, pl.ds(col, BLOCK)] = (
                    img_acc_ref[:, pl.ds(col, BLOCK)] * 0.0 + p)

        return ()

    jax.lax.fori_loop(0, num_kb, body, ())
    l = jnp.maximum(l_ref[...], 1e-30)
    o_ref[...] = (acc_ref[...] / l).astype(o_ref.dtype)
    # merged epilogue: (M, n_img) += mm_block^T @ (img_rows / l)
    mm = mm_ref[...].astype(jnp.float32)  # (BLOCK, M_pad)
    img_rows = img_acc_ref[...] / l  # (BLOCK, n_img_pad) f32
    img_ref[...] = img_ref[...] + jnp.dot(
        mm.T.astype(jnp.bfloat16), img_rows.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def flash_attention_with_merged_capture(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_valid: jnp.ndarray,
    merge_matrix: jnp.ndarray,
    img_start: int,
    n_img: int,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Causal flash attention emitting per-mask merged attention images.

    Args:
      key_valid: ``(B, S)`` bool key validity (supports mid-sequence holes,
        e.g. anyres image-pad slots).
      merge_matrix: ``(B, S, M)`` mean-merge matrix (rows pre-normalised).

    Returns ``(out (B, H, S, hd), merged (B, H, M, n_img) f32)``.
    """
    B, H, S, hd = q.shape
    M = merge_matrix.shape[-1]
    assert S % BLOCK == 0 and img_start % BLOCK == 0
    n_img_pad = math.ceil(n_img / BLOCK) * BLOCK
    m_pad = max(8, math.ceil(M / 8) * 8)
    assert img_start + n_img_pad <= S
    scale = 1.0 / math.sqrt(hd)

    qf = q.reshape(B * H, S, hd)
    kf = k.reshape(B * H, S, hd)
    vf = v.reshape(B * H, S, hd)
    lens = jnp.zeros((B * H,), jnp.int32)  # unused scalar prefetch slot
    valid = key_valid.astype(jnp.int32).reshape(B, 1, S)
    mm = jnp.pad(merge_matrix.astype(jnp.float32),
                 ((0, 0), (0, 0), (0, m_pad - M)))

    def kern(len_all, q_r, k_r, v_r, valid_r, mm_r, o_r, img_r,
             acc, m, l, img_acc):
        _merged_kernel(
            len_all, q_r.at[0], k_r.at[0], v_r.at[0], valid_r,
            mm_r.at[0],
            o_r.at[0], img_r.at[0], acc, m, l, img_acc,
            scale=scale, img_start=img_start, n_img_pad=n_img_pad,
            seq_len=S,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * H, S // BLOCK),
        in_specs=[
            pl.BlockSpec((1, BLOCK, hd), lambda b, i, lens: (b, i, 0)),
            pl.BlockSpec((1, S, hd), lambda b, i, lens: (b, 0, 0)),
            pl.BlockSpec((1, S, hd), lambda b, i, lens: (b, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda b, i, lens: (b // H, 0, 0)),
            pl.BlockSpec((1, BLOCK, m_pad),
                         lambda b, i, lens: (b // H, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK, hd), lambda b, i, lens: (b, i, 0)),
            pl.BlockSpec((1, m_pad, n_img_pad), lambda b, i, lens: (b, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((BLOCK, hd), jnp.float32),
            pltpu.VMEM((BLOCK, 1), jnp.float32),
            pltpu.VMEM((BLOCK, 1), jnp.float32),
            pltpu.VMEM((BLOCK, n_img_pad), jnp.float32),
        ],
    )
    out, img = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * H, S, hd), q.dtype),
            jax.ShapeDtypeStruct((B * H, m_pad, n_img_pad), jnp.float32),
        ],
        interpret=interpret,
    )(lens, qf, kf, vf, valid, mm)
    return (
        out.reshape(B, H, S, hd),
        img.reshape(B, H, m_pad, n_img_pad)[:, :, :M, :n_img],
    )


def flash_attention_with_capture(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lengths: jnp.ndarray,
    img_start: int,
    n_img: int,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Causal attention + image-block probability side output.

    Args:
      q, k, v: ``(B, H, S, hd)`` (k/v already head-repeated for GQA).
      lengths: ``(B,)`` int32 valid sequence lengths (left-aligned).
      img_start: static, multiple of 128.
      n_img: static image-block width.

    Returns ``(out (B, H, S, hd), img_probs (B, H, S, n_img) f32)``.
    """
    B, H, S, hd = q.shape
    assert S % BLOCK == 0, S
    assert img_start % BLOCK == 0, img_start
    n_img_pad = math.ceil(n_img / BLOCK) * BLOCK
    assert img_start + n_img_pad <= S
    scale = 1.0 / math.sqrt(hd)

    qf = q.reshape(B * H, S, hd)
    kf = k.reshape(B * H, S, hd)
    vf = v.reshape(B * H, S, hd)
    lens = jnp.repeat(lengths.astype(jnp.int32), H)

    kernel = functools.partial(
        _kernel, scale=scale, img_start=img_start, n_img_pad=n_img_pad,
        seq_len=S,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * H, S // BLOCK),
        in_specs=[
            pl.BlockSpec((1, BLOCK, hd), lambda b, i, lens: (b, i, 0)),
            pl.BlockSpec((1, S, hd), lambda b, i, lens: (b, 0, 0)),
            pl.BlockSpec((1, S, hd), lambda b, i, lens: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK, hd), lambda b, i, lens: (b, i, 0)),
            pl.BlockSpec((1, BLOCK, n_img_pad), lambda b, i, lens: (b, i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((BLOCK, hd), jnp.float32),
            pltpu.VMEM((BLOCK, 1), jnp.float32),
            pltpu.VMEM((BLOCK, 1), jnp.float32),
            pltpu.VMEM((BLOCK, n_img_pad), jnp.float32),
        ],
    )

    def squeezed_kernel(len_all, q_r, k_r, v_r, o_r, img_r, acc, m, l, img_acc):
        _kernel(
            len_all, q_r.at[0], k_r.at[0], v_r.at[0],
            o_r.at[0], img_r.at[0], acc, m, l, img_acc,
            scale=scale, img_start=img_start, n_img_pad=n_img_pad,
            seq_len=S,
        )

    out, img = pl.pallas_call(
        squeezed_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * H, S, hd), q.dtype),
            jax.ShapeDtypeStruct((B * H, S, n_img_pad), jnp.float32),
        ],
        interpret=interpret,
    )(lens, qf, kf, vf)
    return (
        out.reshape(B, H, S, hd),
        img.reshape(B, H, S, n_img_pad)[..., :n_img],
    )
