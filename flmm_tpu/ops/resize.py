"""Resize primitives with PyTorch-compatible sampling conventions.

The reference pipeline leans on ``F.interpolate`` in three flavours:

* bilinear, ``align_corners=False`` (mask upsampling, SAM postprocess --
  reference: segment_anything/modeling/sam.py:158-165, flmm/models/mask_head/
  mask_decoder.py:10-17)
* nearest (GT mask resizing -- reference: flmm/models/frozen_llava.py:184)
* bicubic (position-embedding interpolation for HPT towers)

``jax.image.resize`` already implements the half-pixel (align_corners=False)
convention for linear/cubic.  Torch's *nearest* however uses the legacy
asymmetric convention ``src = floor(dst * in/out)``, which we reproduce
exactly with a gather so GT-mask parity tests hold bit-for-bit.

Everything here is shape-static and jit/vmap friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_nearest_torch(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Torch-style ``F.interpolate(mode='nearest')`` over the last two dims."""
    h, w = x.shape[-2], x.shape[-1]
    oh, ow = out_hw
    rows = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    x = jnp.take(x, rows, axis=-2)
    x = jnp.take(x, cols, axis=-1)
    return x


def resize_bilinear(
    x: jnp.ndarray, out_hw: tuple[int, int],
    scale: tuple[float, float] | None = None,
) -> jnp.ndarray:
    """``F.interpolate(mode='bilinear', align_corners=False)`` over last 2 dims.

    Computed in float32 regardless of input dtype (the reference forces f32
    upsampling for bf16 safety -- mask_decoder.py:10-17), cast back on exit.

    ``scale``: when given, reproduces torch's ``scale_factor=`` coordinate
    convention ``src = (dst + 0.5) / scale - 0.5`` (the mapping uses the
    GIVEN scale, not ``out/in``) -- these differ whenever
    ``int(dim * scale) != dim * scale``, e.g. the U-Net input upsample of
    non-square attention grids (reference mask_decoder.py:49 uses
    ``F.interpolate(scale_factor=...)``; pinned by
    tests/test_grad_parity.py::test_unet_grad_parity_vs_torch).
    """
    dtype = x.dtype
    if scale is None:
        out_shape = x.shape[:-2] + tuple(out_hw)
        y = jax.image.resize(
            x.astype(jnp.float32), out_shape, method="bilinear",
            antialias=False
        )
        return y.astype(dtype)
    y = x.astype(jnp.float32)
    y = _linear_1d(y, out_hw[0], axis=y.ndim - 2, scale=scale[0])
    y = _linear_1d(y, out_hw[1], axis=y.ndim - 1, scale=scale[1])
    return y.astype(dtype)


def _linear_1d(x: jnp.ndarray, out_size: int, axis: int,
               scale: float) -> jnp.ndarray:
    """1-D linear resample with the torch scale_factor coordinate map."""
    n = x.shape[axis]
    pos = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / scale - 0.5
    i0 = jnp.floor(pos)
    t = jnp.clip(pos - i0, 0.0, 1.0)
    taps = jnp.stack([i0, i0 + 1.0], axis=-1)
    taps = jnp.clip(taps, 0, n - 1).astype(jnp.int32)  # (out, 2)
    g = jnp.take(x, taps.reshape(-1), axis=axis)
    g = jnp.moveaxis(g, axis, -1)
    g = g.reshape(g.shape[:-1] + (out_size, 2))
    w = jnp.stack([1.0 - t, t], axis=-1)
    y = (g * w).sum(-1)
    return jnp.moveaxis(y, -1, axis)


def _cubic_weights(t: jnp.ndarray, a: float = -0.75) -> jnp.ndarray:
    """Keys cubic convolution weights for the 4 taps around fractional ``t``.

    Torch's bicubic uses a = -0.75 (jax.image uses -0.5, hence a custom
    implementation).  Returns shape ``t.shape + (4,)``.
    """
    # distances of the 4 taps (floor-1, floor, floor+1, floor+2) from sample
    d = jnp.stack([t + 1.0, t, 1.0 - t, 2.0 - t], axis=-1)
    ad = jnp.abs(d)
    w_near = (a + 2.0) * ad**3 - (a + 3.0) * ad**2 + 1.0
    w_far = a * ad**3 - 5.0 * a * ad**2 + 8.0 * a * ad - 4.0 * a
    return jnp.where(ad <= 1.0, w_near, w_far)


def _cubic_1d(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    """Torch-compatible cubic resample along one axis (border-replicated)."""
    n = x.shape[axis]
    pos = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * (n / out_size) - 0.5
    i0 = jnp.floor(pos)
    t = pos - i0
    w = _cubic_weights(t)  # (out, 4)
    taps = i0[:, None] + jnp.arange(-1, 3, dtype=jnp.float32)[None, :]
    taps = jnp.clip(taps, 0, n - 1).astype(jnp.int32)  # (out, 4)
    g = jnp.take(x, taps.reshape(-1), axis=axis)
    g = jnp.moveaxis(g, axis, -1)
    g = g.reshape(g.shape[:-1] + (out_size, 4))
    y = (g * w).sum(-1)
    return jnp.moveaxis(y, -1, axis)


def resize_bicubic(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """``F.interpolate(mode='bicubic', align_corners=False)`` over last 2 dims."""
    dtype = x.dtype
    y = x.astype(jnp.float32)
    y = _cubic_1d(y, out_hw[0], axis=y.ndim - 2)
    y = _cubic_1d(y, out_hw[1], axis=y.ndim - 1)
    return y.astype(dtype)


def affine_grid_sample(
    img: jnp.ndarray,
    scale: jnp.ndarray,
    offset: jnp.ndarray,
    out_hw: tuple[int, int],
    fill: jnp.ndarray | float = 0.0,
    src_lo: jnp.ndarray | None = None,
    src_hi: jnp.ndarray | None = None,
    mode: str = "fill",
    canvas_hi: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Bilinear sampling of ``img`` on an axis-aligned affine grid.

    Output pixel ``(i, j)`` samples source coordinate (half-pixel centres)::

        src_y = (i + 0.5) * scale[0] + offset[0] - 0.5
        src_x = (j + 0.5) * scale[1] + offset[1] - 0.5

    ``scale``/``offset`` may be traced values: this one primitive replaces
    every dynamic crop -> resize -> pad chain in the reference (unpadding via
    processor meta, SAM prompt-mask construction, postprocess_masks) with a
    static-shape program.

    The region-of-interest ``[src_lo, src_hi]`` (inclusive pixel-index float
    bounds, default full image) defines the virtual source:

    * ``mode='clamp'``: coordinates are clamped into the ROI -- exactly the
      semantics of cropping the ROI out and bilinear-resizing it
      (``F.interpolate(x[crop], size, align_corners=False)``).
    * ``mode='fill'``: taps outside the ROI read ``fill`` -- the semantics of
      padding the ROI with ``fill`` and resizing.

    Args:
      img: ``(..., H, W)`` source.
      scale, offset: shape ``(2,)`` (y, x) traced or concrete floats.
      out_hw: static output size.

    Returns ``(..., out_h, out_w)`` with ``img.dtype``.
    """
    dtype = img.dtype
    img = img.astype(jnp.float32)
    h, w = img.shape[-2], img.shape[-1]
    oh, ow = out_hw
    lo = jnp.zeros((2,), jnp.float32) if src_lo is None else src_lo.astype(jnp.float32)
    hi = (
        jnp.array([h - 1, w - 1], jnp.float32)
        if src_hi is None
        else src_hi.astype(jnp.float32)
    )
    ys = (jnp.arange(oh, dtype=jnp.float32) + 0.5) * scale[0] + offset[0] - 0.5
    xs = (jnp.arange(ow, dtype=jnp.float32) + 0.5) * scale[1] + offset[1] - 0.5
    if mode == "clamp":
        ys = jnp.clip(ys, lo[0], hi[0])
        xs = jnp.clip(xs, lo[1], hi[1])
    elif mode == "fill":
        if canvas_hi is not None:
            # Emulate a virtual fill-padded canvas: torch resize replicates
            # at the canvas border, while taps beyond the ROI read ``fill``.
            ch = canvas_hi.astype(jnp.float32)
            ys = jnp.clip(ys, 0.0, ch[0])
            xs = jnp.clip(xs, 0.0, ch[1])
    else:
        raise ValueError(f"unknown mode {mode!r}")

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0

    def gather_rows(iy: jnp.ndarray):
        valid = (iy >= lo[0]) & (iy <= hi[0])
        idx = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        return jnp.take(img, idx, axis=-2), valid

    def gather_cols(rows: jnp.ndarray, ix: jnp.ndarray):
        valid = (ix >= lo[1]) & (ix <= hi[1])
        idx = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        return jnp.take(rows, idx, axis=-1), valid

    r0, vy0 = gather_rows(y0)
    r1, vy1 = gather_rows(y0 + 1)
    v00, vx0 = gather_cols(r0, x0)
    v01, vx1 = gather_cols(r0, x0 + 1)
    v10, _ = gather_cols(r1, x0)
    v11, _ = gather_cols(r1, x0 + 1)

    wy = wy.reshape((-1, 1))
    vy0 = vy0.reshape((-1, 1))
    vy1 = vy1.reshape((-1, 1))

    if mode == "fill":
        fillv = jnp.asarray(fill, jnp.float32)
        m00 = (vy0 & vx0).astype(jnp.float32)
        m01 = (vy0 & vx1).astype(jnp.float32)
        m10 = (vy1 & vx0).astype(jnp.float32)
        m11 = (vy1 & vx1).astype(jnp.float32)
        v00 = v00 * m00 + fillv * (1.0 - m00)
        v01 = v01 * m01 + fillv * (1.0 - m01)
        v10 = v10 * m10 + fillv * (1.0 - m10)
        v11 = v11 * m11 + fillv * (1.0 - m11)

    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    out = top * (1.0 - wy) + bot * wy
    return out.astype(dtype)
