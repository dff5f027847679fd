"""Window-major <-> spatial boundary relayout as Pallas DMA kernels.

The SAM ViTDet encoder keeps tokens WINDOW-MAJOR ``(NW, T, C)`` across
runs of window blocks (ops/window_block.py) and must return to spatial
``(B, H, W, C)`` around each of the 4 global layers (reference
segment_anything/modeling/image_encoder.py:17-105 -- window partition /
unpartition).  XLA lowers the permutation as a generic transpose that
measures ~105 GB/s effective on v5e (1.53 ms per dewindowize+windowize
pair at bs 4, ~8x off HBM bandwidth), ~6 ms of every SAM-1024 batch.

The trick here: with ``C`` folded into the minor dimension the
permutation moves whole ``(ws, ws*C)`` tiles between

    window-major   (NW, ws, ws*C)            [(NW, T, C) viewed]
    spatial-padded (B, nwy, ws, nwx, ws*C)   [(B, Hp, Wp, C) viewed]

and both views are FREE reshapes (row-major contiguous splits of the
minor dims).  Each kernel grid step then DMAs one window row -- a
``(ws, nwx, ws*C)`` block -- and performs a single in-register
minor-preserving swap; there is no vector relayout because the lane
dimension (``ws*C``, 128-multiple for C=1024) is untouched.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tests flip this to run through the Pallas interpreter on CPU.
INTERPRET = False


def _dewin_kernel(xw_ref, o_ref, *, nwx: int):
    # xw block: (nwx, ws, ws*C) -- the nwx windows of one window row
    # o  block: (1, 1, ws, nwx, ws*C)
    for wx in range(nwx):
        o_ref[0, 0, :, wx, :] = xw_ref[wx]


def _win_kernel(x_ref, o_ref, *, nwx: int):
    # x block: (1, 1, ws, nwx, ws*C); o block: (nwx, ws, ws*C)
    for wx in range(nwx):
        o_ref[wx] = x_ref[0, 0, :, wx, :]


def dewindowize(xw: jnp.ndarray, geom: tuple, ws: int,
                interpret: bool | None = None) -> jnp.ndarray:
    """``(NW, T, C)`` window-major -> ``(B, H, W, C)`` spatial (cropped)."""
    if interpret is None:
        interpret = INTERPRET
    B, H, W, Hp, Wp = geom
    C = xw.shape[-1]
    nwy, nwx = Hp // ws, Wp // ws
    xr = xw.reshape(B * nwy * nwx, ws, ws * C)  # free view
    out = pl.pallas_call(
        functools.partial(_dewin_kernel, nwx=nwx),
        grid=(B, nwy),
        in_specs=[pl.BlockSpec((nwx, ws, ws * C),
                               lambda b, wy: (b * nwy + wy, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, ws, nwx, ws * C),
                               lambda b, wy: (b, wy, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, nwy, ws, nwx, ws * C), xw.dtype),
        interpret=interpret,
    )(xr)
    return out.reshape(B, Hp, Wp, C)[:, :H, :W]


def windowize(x: jnp.ndarray, ws: int,
              interpret: bool | None = None):
    """``(B, H, W, C)`` spatial -> window-major ``(NW, T, C)`` + geometry
    (drop-in for image_encoder._windowize)."""
    if interpret is None:
        interpret = INTERPRET
    B, H, W, C = x.shape
    pad_h = (ws - H % ws) % ws
    pad_w = (ws - W % ws) % ws
    Hp, Wp = H + pad_h, W + pad_w
    nwy, nwx = Hp // ws, Wp // ws
    xp = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    xr = xp.reshape(B, nwy, ws, nwx, ws * C)  # free view
    out = pl.pallas_call(
        functools.partial(_win_kernel, nwx=nwx),
        grid=(B, nwy),
        in_specs=[pl.BlockSpec((1, 1, ws, nwx, ws * C),
                               lambda b, wy: (b, wy, 0, 0, 0))],
        out_specs=pl.BlockSpec((nwx, ws, ws * C),
                               lambda b, wy: (b * nwy + wy, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * nwy * nwx, ws, ws * C), x.dtype),
        interpret=interpret,
    )(xr)
    return out.reshape(B * nwy * nwx, ws * ws, C), (B, H, W, Hp, Wp)
