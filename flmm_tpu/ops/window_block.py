"""Whole-block fused window layer for the SAM ViTDet encoder.

Round-2 measurements pinned the per-window-layer cost at 16.5 ms in situ
(v5e bs8, SAM-L 1024) against a ~7 ms floor: ~9 ms/layer of XLA glue
(window partition transposes, per-head q/k/v transposes, augmented-K
operand staging) survives *between* the three fused kernels.  This module
removes that glue structurally:

* the encoder keeps tokens in WINDOW-MAJOR layout ``(NW, T, C)`` across
  each run of consecutive window blocks (the partition transpose happens
  once per run, not once per layer) -- LN/qkv/proj/MLP are per-token, so
  the layout is free for them;
* :func:`window_block` fuses the ENTIRE block -- LN1 + qkv projection +
  per-head augmented-K attention (base-2 softmax, the production v9
  scheme) + output projection + residual + LN2 + MLP + residual -- into
  ONE kernel with every weight resident in VMEM (~25 MB; legal: the
  16 MB VMEM budget is only Mosaic's default scoped limit, raised via
  ``vmem_limit_bytes``, probed on v5e round 3).  The qkv tensor never
  touches HBM: per-layer traffic drops from ~1.5 GB to ~0.4 GB, which
  round-3 decomposition measured as the dominant non-matmul cost (a
  no-compute kernel shell moving x+qkv+bias+out ran 3.8 ms vs a 1.05 ms
  bandwidth floor).
* the per-head score matmuls and the MLP hidden chunks are
  software-pipelined (head h+1's score matmul issues before head h's
  softmax) -- measured -4 ms/layer on v5e;
* ``group`` windows are processed per grid step to amortise step
  overhead (measured -0.6 ms/layer at group 4).

Measured negatives (round 3, kept so they are not re-explored): a
per-head-128-lane padded qkv layout (alignment-perfect in-kernel slices
at 2x qkv/proj lanes) is ~2 ms/layer SLOWER -- concat relayouts are
cheap, extra matmul lanes are not; splitting the MLP back out to the
dense ``fused_ln_mlp`` kernel loses ~3 ms/layer to the extra activation
round-trip.

The thin decomposed rel-pos bias still rides the augmented-K matmul and
is computed OUTSIDE by one batched einsum over all windows
(:func:`window_rel_bias_from_x`) -- per-window in-kernel bias einsums
would be y-batched 14x14 matmuls per step, MXU-latency-bound.

Reference semantics: segment_anything/modeling/image_encoder.py Block
(:119-241) -- pre-norm attention with decomposed rel-pos
(add_decomposed_rel_pos:325), zero-padded window partition.  The
reference pads the *normed* activations with zeros before the qkv
projection, so geometric pad tokens carry ``k = b_k``: the kernel
reproduces that exactly by zeroing pad rows of ``LN(x)`` (``valid``
mask) before the in-kernel projection.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flmm_tpu.ops.fused_block import _gelu_erf
from flmm_tpu.ops.sam_flash import _LOG2E

# Tests flip this to run the kernels through the Pallas interpreter on
# CPU (the encoder gates the whole-block path on backend=="tpu" or
# INTERPRET).
INTERPRET = False


def scaled_qkv_weights(wqkv: jnp.ndarray, bqkv: jnp.ndarray, nh: int,
                       hd: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fold ``scale * log2(e)`` (base-2 softmax domain) into the q
    columns of a standard ``(C, 3C)`` qkv projection."""
    C = nh * hd
    scale2 = (1.0 / math.sqrt(hd)) * _LOG2E
    colscale = jnp.concatenate([
        jnp.full((C,), scale2, jnp.float32), jnp.ones((2 * C,), jnp.float32)])
    return ((wqkv.astype(jnp.float32) * colscale).astype(wqkv.dtype),
            (bqkv.astype(jnp.float32) * colscale).astype(bqkv.dtype))


def _masked_ln(x, ln_w, ln_b, valid, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * ln_w.astype(jnp.float32) + ln_b.astype(jnp.float32)
    if valid is not None:  # pre-broadcast mask (..., 1)
        y = jnp.where(valid, y, 0.0)
    return y


def window_rel_bias_from_x(
    x: jnp.ndarray, valid, ln_w: jnp.ndarray, ln_b: jnp.ndarray,
    wq_s: jnp.ndarray, bq_s: jnp.ndarray,
    rel_pos_h: jnp.ndarray, rel_pos_w: jnp.ndarray,
    side: int, nh: int, hd: int, eps: float = 1e-6,
) -> jnp.ndarray:
    """Thin decomposed rel-pos bias rows for every (window, head),
    computed from the residual stream (the q projection is recomputed
    here -- ~0.5 ms of MXU -- so the full qkv tensor never round-trips
    HBM between the projection and the attention kernel).

    Args:
      x: ``(NW, T, C)`` window-major residual stream.
      valid: ``(NW, T)`` bool or None -- geometric pad slots.
      wq_s, bq_s: the q-third of :func:`scaled_qkv_weights` output.

    Returns ``(NW, nh, T, 2*side)`` in the log2 softmax domain.
    """
    NW, T, C = x.shape
    assert T == side * side
    y = _masked_ln(x, ln_w, ln_b,
                   None if valid is None else valid[..., None],
                   eps).astype(x.dtype)
    q = (jnp.einsum("wtc,cd->wtd", y, wq_s,
                    preferred_element_type=jnp.float32)
         + bq_s.astype(jnp.float32)).astype(x.dtype)
    q = q.reshape(NW, side, side, nh, hd)
    coords = jnp.arange(side)[:, None] - jnp.arange(side)[None, :] + side - 1
    # q carries scale*log2e; the bias contract is log2e * (q_raw . r),
    # so fold the residual sqrt(hd) into the gathered tables
    mult = math.sqrt(hd)
    rh = (rel_pos_h[coords] * mult).astype(x.dtype)  # (side, side, hd)
    rw = (rel_pos_w[coords] * mult).astype(x.dtype)
    bias_h = jnp.einsum("wyxhd,ykd->whyxk", q, rh,
                        preferred_element_type=jnp.float32)
    bias_w = jnp.einsum("wyxhd,xkd->whyxk", q, rw,
                        preferred_element_type=jnp.float32)
    bias = jnp.concatenate([bias_h, bias_w], axis=-1)
    return bias.reshape(NW, nh, T, 2 * side).astype(x.dtype)


def _block_kernel(x_ref, bias_ref, valid_ref, ln1w_ref, ln1b_ref,
                  wqkv_ref, bqkv_ref, wo_ref, bo_ref, ln2w_ref, ln2b_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                  side: int, nh: int, hd: int, eps: float, n_f: int,
                  kp: int, group: int, masked: bool, bias_padded: bool):
    """``group`` windows per grid step, whole block per window."""
    T = side * side
    C = nh * hd
    dt = x_ref.dtype

    jr = jax.lax.broadcasted_iota(jnp.int32, (T, 2 * side), 0)
    jc = jax.lax.broadcasted_iota(jnp.int32, (T, 2 * side), 1)
    sel = (((jc < side) & (jc == jr // side))
           | ((jc >= side) & (jc - side == jr % side))).astype(dt)
    zpad = jnp.zeros((T, kp - hd - 2 * side), dt)
    F = w1_ref.shape[1]
    bf = F // n_f

    for w in range(group):
        x = x_ref[w]
        # int32 cast first: Mosaic only supports non-no-op minor-dim
        # insertion for 32-bit types (i1 (T,) -> (T, 1) fails)
        valid = ((valid_ref[w, 0].astype(jnp.int32)[:, None]) != 0
                 if masked else None)
        y1 = _masked_ln(x, ln1w_ref[...], ln1b_ref[...],
                        valid, eps).astype(dt)
        qkv = jnp.dot(y1, wqkv_ref[...], preferred_element_type=jnp.float32)
        qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(dt)

        def score(h):
            if bias_padded:
                # bias rows arrive lane-aligned at kp with q's lanes
                # zeroed: one aligned concat + VPU add replaces the
                # 3-way concat (the HBM rows are contiguous 2*kp bytes
                # instead of strided 2*(2*side))
                a = jnp.concatenate(
                    [qkv[:, h * hd:(h + 1) * hd],
                     jnp.zeros((T, kp - hd), dt)], axis=1) + bias_ref[w, h]
            else:
                a = jnp.concatenate(
                    [qkv[:, h * hd:(h + 1) * hd], bias_ref[w, h], zpad],
                    axis=1)
            b = jnp.concatenate(
                [qkv[:, C + h * hd:C + (h + 1) * hd], sel, zpad], axis=1)
            return jnp.dot(a, b.T, preferred_element_type=jnp.float32)

        outs = []
        s_next = score(0)
        for h in range(nh):
            s = s_next
            if h + 1 < nh:
                s_next = score(h + 1)
            m = s.max(axis=1, keepdims=True)
            p = jnp.exp2(s - m)
            l = p.sum(axis=1, keepdims=True)
            v = qkv[:, 2 * C + h * hd:2 * C + (h + 1) * hd]
            outs.append((jnp.dot(p.astype(dt), v,
                                 preferred_element_type=jnp.float32)
                         / jnp.maximum(l, 1e-30)).astype(dt))
        attn = jnp.concatenate(outs, axis=1)  # (T, C)

        xr = x.astype(jnp.float32)
        xr = xr + jnp.dot(attn, wo_ref[...],
                          preferred_element_type=jnp.float32)
        xr = xr + bo_ref[...].astype(jnp.float32)
        mu = xr.mean(axis=1, keepdims=True)
        var = ((xr - mu) ** 2).mean(axis=1, keepdims=True)
        y2 = (xr - mu) * jax.lax.rsqrt(var + eps)
        y2 = (y2 * ln2w_ref[...].astype(jnp.float32)
              + ln2b_ref[...].astype(jnp.float32)).astype(dt)

        def hchunk(f):
            h1 = jnp.dot(y2, w1_ref[:, f * bf:(f + 1) * bf],
                         preferred_element_type=jnp.float32)
            return h1 + b1_ref[0, f * bf:(f + 1) * bf].astype(jnp.float32)

        h_next = hchunk(0)
        for f in range(n_f):
            h1 = h_next
            if f + 1 < n_f:
                h_next = hchunk(f + 1)
            g = _gelu_erf(h1).astype(dt)
            xr = xr + jnp.dot(g, w2_ref[f * bf:(f + 1) * bf, :],
                              preferred_element_type=jnp.float32)
        out = xr + b2_ref[...].astype(jnp.float32)
        o_ref[w] = out.astype(o_ref.dtype)


def window_block(
    x: jnp.ndarray, bias: jnp.ndarray, valid,
    ln1_w: jnp.ndarray, ln1_b: jnp.ndarray,
    wqkv_s: jnp.ndarray, bqkv_s: jnp.ndarray,
    wo: jnp.ndarray, bo: jnp.ndarray,
    ln2_w: jnp.ndarray, ln2_b: jnp.ndarray,
    w1: jnp.ndarray, b1: jnp.ndarray, w2: jnp.ndarray, b2: jnp.ndarray,
    side: int, num_heads: int,
    eps: float = 1e-6, n_f: int = 4, group: int | None = None,
    interpret: bool | None = None, vmem_mb: int = 64,
    bias_padded: bool | None = None,
) -> jnp.ndarray:
    """One whole window block (LN1+qkv+attention+proj+LN2+MLP, both
    residuals) over window-major tokens; weights resident, qkv never in
    HBM.

    Args:
      x: ``(NW, T, C)`` window-major residual stream (``T = side*side``).
      bias: ``(NW, nh, T, 2*side)`` log2-domain rel-pos rows
        (:func:`window_rel_bias_from_x`).
      valid: ``(NW, T)`` bool geometric-pad mask, or None when the grid
        divides evenly.
      wqkv_s, bqkv_s: :func:`scaled_qkv_weights` output.

    Returns ``(NW, T, C)``.
    """
    if interpret is None:
        interpret = INTERPRET
    NW, T, C = x.shape
    nh = num_heads
    hd = C // nh
    assert T == side * side and wqkv_s.shape == (C, 3 * C)
    assert bias.shape == (NW, nh, T, 2 * side), bias.shape
    kp = ((hd + 2 * side + 127) // 128) * 128
    F = w1.shape[1]
    # experiment knobs for scripts/kernel_bench.py sweeps (trace-time)
    env_nf = os.environ.get("WB_NF")
    if env_nf:
        n_f = int(env_nf)
    assert F % n_f == 0, (F, n_f)
    if group is None:
        env_g = os.environ.get("WB_GROUP")
        # group=10 measured best in situ at the SAM-1024 geometry
        # (6.93 vs 7.03 ms/layer for group=4; 25/100 flat at 6.94/6.99)
        group = (int(env_g) if env_g
                 else next((g for g in (10, 4, 2) if NW % g == 0), 1))
    assert NW % group == 0, (NW, group)
    if bias_padded is None:
        bias_padded = os.environ.get("WB_BIAS_PAD", "0") == "1"
    if bias_padded:
        # lane-align the thin bias rows in XLA (the pad may or may not fuse
        # into the producing einsum's epilogue -- if it does not, bias HBM
        # traffic grows kp/(2*side)x; measure on-device before defaulting
        # this on): (NW, nh, T, 2*side) -> (NW, nh, T, kp) with
        # the bias at lanes [hd, hd+2*side) and zeros elsewhere, so the
        # kernel's DMA rows are contiguous kp-lane tiles instead of
        # 2*side-element strided slivers
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, 0),
                              (hd, kp - hd - 2 * side)))
    bias_lanes = kp if bias_padded else 2 * side
    masked = valid is not None
    if not masked:  # uniform dummy so the spec list is static
        valid = jnp.ones((NW, 1, T), jnp.int8)
    else:
        # (NW, 1, T): Mosaic requires the last two block dims to divide
        # (8, 128) or equal the array dims; (group, T) would not
        valid = valid.astype(jnp.int8).reshape(NW, 1, T)

    kernel = functools.partial(
        _block_kernel, side=side, nh=nh, hd=hd, eps=eps, n_f=n_f, kp=kp,
        group=group, masked=masked, bias_padded=bias_padded)
    return pl.pallas_call(
        kernel,
        grid=(NW // group,),
        in_specs=[
            pl.BlockSpec((group, T, C), lambda g: (g, 0, 0)),
            pl.BlockSpec((group, nh, T, bias_lanes),
                         lambda g: (g, 0, 0, 0)),
            pl.BlockSpec((group, 1, T), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, C), lambda g: (0, 0)),
            pl.BlockSpec((1, C), lambda g: (0, 0)),
            pl.BlockSpec((C, 3 * C), lambda g: (0, 0)),
            pl.BlockSpec((1, 3 * C), lambda g: (0, 0)),
            pl.BlockSpec((C, C), lambda g: (0, 0)),
            pl.BlockSpec((1, C), lambda g: (0, 0)),
            pl.BlockSpec((1, C), lambda g: (0, 0)),
            pl.BlockSpec((1, C), lambda g: (0, 0)),
            pl.BlockSpec((C, F), lambda g: (0, 0)),
            pl.BlockSpec((1, F), lambda g: (0, 0)),
            pl.BlockSpec((F, C), lambda g: (0, 0)),
            pl.BlockSpec((1, C), lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((group, T, C), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NW, T, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
        interpret=interpret,
    )(x, bias, valid, ln1_w.reshape(1, C), ln1_b.reshape(1, C),
      wqkv_s, bqkv_s.reshape(1, 3 * C), wo, bo.reshape(1, C),
      ln2_w.reshape(1, C), ln2_b.reshape(1, C), w1, b1.reshape(1, F),
      w2, b2.reshape(1, C))
