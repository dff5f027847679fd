"""SAM ViTDet image encoder in JAX (frozen).

Behavioural spec: reference segment_anything/modeling/image_encoder.py --
windowed attention (window 14) with 4 global-attention blocks, decomposed
relative position bias (get_rel_pos:292, add_decomposed_rel_pos:325), conv
neck to 256 channels.  Re-designed for TPU:

* NHWC throughout; window partition/unpartition are static
  reshape/transposes (XLA fuses them into the attention).
* The relative-position gather tables are precomputed per config (static
  ``q==k`` geometry), so the bias add is two einsums feeding the MXU.
* All blocks scan-stacked per kind is impossible (window/global interleave),
  but the per-block python loop unrolls into a single XLA program; weights
  stay per-block.

The encoder is always frozen (reference mask_refiner.py:30); no grads.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from flmm_tpu.models.sam.common import channel_norm, conv2d, layer_norm, mlp_block
from flmm_tpu.ops.quant import dense as qdense


@dataclasses.dataclass(frozen=True)
class SamEncoderConfig:
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 1024  # vit_l
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: tuple = (5, 11, 17, 23)
    ln_eps: float = 1e-6
    # Use the Pallas flash kernels (ops/sam_flash.py): global blocks fuse
    # the decomposed rel-pos bias and never materialise SxS scores; window
    # blocks run one window per grid step with one-shot softmax.
    flash_global: bool = False
    flash_window: bool = False
    # global-attention kernel variant (ops/sam_flash.py).  v5e bs8,
    # in-graph chained timing (host-loop timing over-reports the relay
    # backend; scripts/kernel_bench.py), ms/call incl. XLA-side prep:
    # v1 21.1, v2 21.3, v3 19.4, v4 19.9, v6 19.8, v7 23.5,
    # v8 (pipelined chunks + base-2 softmax) 18.5 -- near the measured
    # compute floor (~7 ms MXU + ~9 ms VPU softmax passes).
    global_kernel: str = "v8"
    # window kernel variant, same methodology, ms/call: v9 (ONE
    # augmented-K matmul with the one-hot bias columns pre-added to the
    # lane-padded keys by XLA + base-2 softmax; 8 MXU passes/window)
    # 8.06, v7 8.31, v8 9.23, v1 8.93, v6 13.7, others 13-21.
    window_kernel: str = "v9"
    # fuse LN2 + MLP + residual into one Pallas kernel (the (N, F)
    # activation tensor never touches HBM); used when the flash kernels
    # are on and shapes tile cleanly
    fused_mlp: bool = True
    # whole-block window layers (ops/window_block.py): tokens stay
    # window-major across each run of consecutive window blocks and one
    # kernel fuses attention + proj + LN2 + MLP with all weights VMEM-
    # resident -- removes the ~9 ms/layer of XLA partition/head-transpose
    # glue measured in round 2
    window_block_fused: bool = False
    # whole-block GLOBAL layers (ops/global_block.py): LN1 + per-head qkv
    # + augmented-K global attention + out-proj + residual in one kernel
    # with head-major streamed weights.  Measured a TIE with the v8-flash
    # + fused-skeleton production path on v5e (global-only depth-6
    # encoder, `kernel_bench --what gb`: 27.07 vs 27.32 ms/layer at bs 8,
    # 16.53 vs 16.26 at bs 4) -- unlike the window case there is no
    # partition/transpose glue to remove, and the in-kernel qkv matmul
    # merely relocates MXU work.  Kept as a tested experiment, off by
    # default.
    global_block_fused: bool = False
    dtype: Any = jnp.float32

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


def init_params(cfg: SamEncoderConfig, key: jax.Array) -> dict:
    ks = jax.random.split(key, cfg.depth + 4)
    d = cfg.embed_dim
    f = int(d * cfg.mlp_ratio)

    def w(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32) / jnp.sqrt(fan_in)).astype(
            cfg.dtype
        )

    blocks = []
    for i in range(cfg.depth):
        size = cfg.grid if i in cfg.global_attn_indexes else cfg.window_size
        k1, k2, k3 = jax.random.split(ks[i], 3)
        blocks.append({
            "ln1_w": jnp.ones((d,), cfg.dtype), "ln1_b": jnp.zeros((d,), cfg.dtype),
            "ln2_w": jnp.ones((d,), cfg.dtype), "ln2_b": jnp.zeros((d,), cfg.dtype),
            "wqkv": w(k1, (d, 3 * d), d), "bqkv": jnp.zeros((3 * d,), cfg.dtype),
            "wo": w(k2, (d, d), d), "bo": jnp.zeros((d,), cfg.dtype),
            "mlp": {
                "w1": w(k3, (d, f), d), "b1": jnp.zeros((f,), cfg.dtype),
                "w2": w(k3, (f, d), f), "b2": jnp.zeros((d,), cfg.dtype),
            },
            "rel_pos_h": jnp.zeros((2 * size - 1, cfg.head_dim), cfg.dtype),
            "rel_pos_w": jnp.zeros((2 * size - 1, cfg.head_dim), cfg.dtype),
        })
    return {
        "patch_kernel": w(ks[-4], (cfg.patch_size, cfg.patch_size, 3, d),
                          3 * cfg.patch_size**2),
        "patch_bias": jnp.zeros((d,), cfg.dtype),
        "pos_embed": jnp.zeros((cfg.grid, cfg.grid, d), cfg.dtype),
        "neck0_kernel": w(ks[-3], (1, 1, d, cfg.out_chans), d),
        "neck0_ln_w": jnp.ones((cfg.out_chans,), cfg.dtype),
        "neck0_ln_b": jnp.zeros((cfg.out_chans,), cfg.dtype),
        "neck1_kernel": w(ks[-2], (3, 3, cfg.out_chans, cfg.out_chans),
                          9 * cfg.out_chans),
        "neck1_ln_w": jnp.ones((cfg.out_chans,), cfg.dtype),
        "neck1_ln_b": jnp.zeros((cfg.out_chans,), cfg.dtype),
        "blocks": blocks,
    }


def _rel_pos_table(rel_pos: jnp.ndarray, size: int) -> jnp.ndarray:
    """Static gather of (size, size, head_dim) rel-pos embeddings (q==k)."""
    coords = jnp.arange(size)[:, None] - jnp.arange(size)[None, :] + (size - 1)
    return rel_pos[coords]  # (q, k, hd)


def _attention(x: jnp.ndarray, bp: dict, cfg: SamEncoderConfig) -> jnp.ndarray:
    """Windowless attention over an (B', H', W', C) tile with decomposed
    rel-pos bias (reference image_encoder.py:224-240).

    For the global blocks (64x64 grid = 4096 tokens) the score tensor is
    chunked over query rows so peak memory stays bounded -- the reference's
    eager path materialises the full (B*heads, 4096, 4096) tensor.
    """
    B, H, W, C = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    qkv = qdense(x.reshape(B, H * W, C), bp, "wqkv") + bp["bqkv"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, H * W, nh, hd)
    k = k.reshape(B, H * W, nh, hd)
    v = v.reshape(B, H * W, nh, hd)
    scale = 1.0 / jnp.sqrt(float(hd))
    rh = _rel_pos_table(bp["rel_pos_h"].astype(jnp.float32), H)  # (H, H, hd)
    rw = _rel_pos_table(bp["rel_pos_w"].astype(jnp.float32), W)

    def attend(q_rows, rh_rows):
        """q_rows: (B, h', W, nh, hd); rh_rows: (h', H, hd)."""
        hq = q_rows.shape[1]
        qf = q_rows.reshape(B, hq * W, nh, hd)
        logits = (
            jnp.einsum("bqhd,bkhd->bhqk", qf, k,
                       preferred_element_type=jnp.float32) * scale
        )
        rqf = q_rows.astype(jnp.float32)
        bias_h = jnp.einsum("byxhd,ykd->bhyxk", rqf, rh_rows)
        bias_w = jnp.einsum("byxhd,xkd->bhyxk", rqf, rw)
        logits = logits.reshape(B, nh, hq, W, H, W)
        logits = logits + bias_h[..., :, None] + bias_w[..., None, :]
        logits = logits.reshape(B, nh, hq * W, H * W)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, hq * W, C)

    q_grid = q.reshape(B, H, W, nh, hd)
    # chunk query rows so each chunk's scores stay ~O(64 MB)
    rows_per_chunk = max(1, min(H, (1 << 21) // max(1, H * W * W)))
    if H % rows_per_chunk != 0 or H * W <= 4096 // 2:
        out = attend(q_grid, rh)
    else:
        n_chunks = H // rows_per_chunk
        qc = q_grid.reshape(B, n_chunks, rows_per_chunk, W, nh, hd)
        rc = rh.reshape(n_chunks, rows_per_chunk, H, hd)
        outs = jax.lax.map(
            lambda args: attend(args[0], args[1]),
            (qc.transpose(1, 0, 2, 3, 4, 5), rc),
        )  # (n_chunks, B, rows*W, C)
        out = outs.transpose(1, 0, 2, 3).reshape(B, H * W, C)
    return (qdense(out, bp, "wo") + bp["bo"]).reshape(B, H, W, C)


def _flash_global_core(
    qkv: jnp.ndarray, bp: dict, cfg: SamEncoderConfig
) -> jnp.ndarray:
    """Global attention core (pre-output-projection) through the fused
    Pallas kernel.  ``qkv``: (B, H, W, 3C) -> returns (B, H, W, C)."""
    from flmm_tpu.ops import sam_flash

    if cfg.global_kernel == "v8":  # production default
        kernel = sam_flash.sam_global_attention_v8
    else:  # superseded bake-off variants, kept for measurement replays
        from flmm_tpu.ops import sam_flash_experiments as sfx
        kernel = getattr(sfx, "sam_global_attention" + (
            "" if cfg.global_kernel == "v1" else "_" + cfg.global_kernel))
    B, H, W, C3 = qkv.shape
    C = C3 // 3
    nh, hd = cfg.num_heads, cfg.head_dim
    q, k, v = jnp.split(qkv.reshape(B, H * W, C3), 3, axis=-1)

    def heads(t):
        return t.reshape(B, H * W, nh, hd).transpose(0, 2, 1, 3).reshape(
            B * nh, H * W, hd)

    out = kernel(
        heads(q), heads(k), heads(v), bp["rel_pos_h"], bp["rel_pos_w"], H
    )
    return out.reshape(B, nh, H * W, hd).transpose(0, 2, 1, 3).reshape(
        B, H, W, C)


def _flash_window_core(
    qkv: jnp.ndarray, bp: dict, cfg: SamEncoderConfig
) -> jnp.ndarray:
    """Windowed attention core (pre-output-projection) through the
    per-window Pallas kernel.  The qkv / output projections run on the
    dense (B*H*W, C) token layout (full 128-row MXU tiles) outside the
    window partitioning -- the projections are per-token, so partition
    order is free.  ``qkv``: (B, H, W, 3C) -> (B, H, W, C)."""
    from flmm_tpu.ops import sam_flash

    if cfg.window_kernel == "v9":  # production default
        wkernel = sam_flash.sam_window_attention_v9
    else:  # superseded bake-off variants, kept for measurement replays
        from flmm_tpu.ops import sam_flash_experiments as sfx
        wkernel = getattr(sfx, "sam_window_attention" + (
            "" if cfg.window_kernel == "v1" else "_" + cfg.window_kernel))
    B, H, W, C3 = qkv.shape
    C = C3 // 3
    ws = cfg.window_size
    nh, hd = cfg.num_heads, cfg.head_dim
    pad_h = (ws - H % ws) % ws
    pad_w = (ws - W % ws) % ws
    qkvp = jnp.pad(qkv, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    qkvw = qkvp.reshape(B, Hp // ws, ws, Wp // ws, ws, 3 * C)
    qkvw = qkvw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, 3 * C)
    nw = qkvw.shape[0]
    q, k, v = jnp.split(qkvw, 3, axis=-1)

    def heads(t):
        return t.reshape(nw, ws * ws, nh, hd).transpose(0, 2, 1, 3).reshape(
            nw * nh, ws * ws, hd)

    out = wkernel(
        heads(q), heads(k), heads(v), bp["rel_pos_h"], bp["rel_pos_w"], ws
    )
    out = out.reshape(nw, nh, ws * ws, hd).transpose(0, 2, 1, 3).reshape(
        nw, ws * ws, C)
    out = out.reshape(B, Hp // ws, Wp // ws, ws, ws, C)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    return out[:, :H, :W]


def _ln_mlp_residual(x: jnp.ndarray, bp: dict, cfg: SamEncoderConfig):
    """``x + MLP(LN2(x))`` -- fused Pallas kernel when shapes tile."""
    B, H, W, C = x.shape
    mlp = bp["mlp"]
    usable = (
        cfg.fused_mlp and "w1" in mlp  # not int8-quantized
        and jax.default_backend() == "tpu"
        and (B * H * W) % 256 == 0 and C % 128 == 0
        and mlp["w1"].shape[1] % 512 == 0
    )
    if usable:
        from flmm_tpu.ops.fused_block import fused_ln_mlp

        return fused_ln_mlp(
            x, bp["ln2_w"], bp["ln2_b"], mlp["w1"], mlp["b1"],
            mlp["w2"], mlp["b2"], eps=cfg.ln_eps)
    y = layer_norm(x, bp["ln2_w"], bp["ln2_b"], cfg.ln_eps)
    return x + mlp_block(y, mlp)


def _block(x: jnp.ndarray, bp: dict, cfg: SamEncoderConfig, windowed: bool):
    flash = (cfg.flash_window if windowed else
             (cfg.flash_global and x.shape[1] == x.shape[2]
              and ((x.shape[1] * x.shape[2]) % 128 == 0
                   or cfg.global_kernel == "v8")))  # v8 pads + masks
    # flash_* means "use the Pallas kernels on TPU" -- on other backends
    # (full-dims CPU parity runs) fall back to the identical XLA path,
    # like the whole-block gate below (forward:438)
    flash = flash and jax.default_backend() == "tpu"
    if flash:
        B, H, W, C = x.shape
        # fused kernels need plain (non-int8) weights and tiling shapes
        fused = (
            cfg.fused_mlp and "wqkv" in bp and "w1" in bp["mlp"]
            and jax.default_backend() == "tpu"
            and C % 128 == 0 and bp["mlp"]["w1"].shape[1] % 512 == 0
        )
        if fused:
            from flmm_tpu.ops.fused_block import fused_ln_qkv

            qkv = fused_ln_qkv(
                x, bp["ln1_w"], bp["ln1_b"], bp["wqkv"], bp["bqkv"],
                eps=cfg.ln_eps)
        else:
            y = layer_norm(x, bp["ln1_w"], bp["ln1_b"], cfg.ln_eps)
            qkv = (qdense(y.reshape(B, H * W, C), bp, "wqkv")
                   + bp["bqkv"]).reshape(B, H, W, 3 * C)
        core = _flash_window_core if windowed else _flash_global_core
        attn = core(qkv.reshape(B, H, W, 3 * C), bp, cfg)
        if fused:
            from flmm_tpu.ops.fused_block import fused_proj_ln_mlp

            mlp = bp["mlp"]
            return fused_proj_ln_mlp(
                x, attn, bp["wo"], bp["bo"], bp["ln2_w"], bp["ln2_b"],
                mlp["w1"], mlp["b1"], mlp["w2"], mlp["b2"], eps=cfg.ln_eps)
        out = (qdense(attn.reshape(B, H * W, C), bp, "wo")
               + bp["bo"]).reshape(B, H, W, C)
        return _ln_mlp_residual(x + out, bp, cfg)
    shortcut = x
    x = layer_norm(x, bp["ln1_w"], bp["ln1_b"], cfg.ln_eps)
    if windowed:
        B, H, W, C = x.shape
        ws = cfg.window_size
        pad_h = (ws - H % ws) % ws
        pad_w = (ws - W % ws) % ws
        xp = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        Hp, Wp = H + pad_h, W + pad_w
        xw = xp.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
        xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
        xw = _attention(xw, bp, cfg)
        xw = xw.reshape(B, Hp // ws, Wp // ws, ws, ws, C)
        xp = xw.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
        x = xp[:, :H, :W]
    else:
        x = _attention(x, bp, cfg)
    x = shortcut + x
    y = layer_norm(x, bp["ln2_w"], bp["ln2_b"], cfg.ln_eps)
    return x + mlp_block(y, bp["mlp"])


def _windowize(x: jnp.ndarray, ws: int):
    """(B, H, W, C) -> window-major (B*nwy*nwx, ws*ws, C) + geometry."""
    B, H, W, C = x.shape
    pad_h = (ws - H % ws) % ws
    pad_w = (ws - W % ws) % ws
    xp = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    xw = xp.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)
    return xw, (B, H, W, Hp, Wp)


def _dewindowize(xw: jnp.ndarray, geom: tuple, ws: int) -> jnp.ndarray:
    B, H, W, Hp, Wp = geom
    C = xw.shape[-1]
    x = xw.reshape(B, Hp // ws, Wp // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    return x[:, :H, :W]


def _window_valid_tokens(geom: tuple, ws: int):
    """(NW, T) bool -- False on geometric pad slots; None when no pad."""
    import numpy as np

    B, H, W, Hp, Wp = geom
    if Hp == H and Wp == W:
        return None
    v = np.zeros((Hp, Wp), bool)
    v[:H, :W] = True
    vw = v.reshape(Hp // ws, ws, Wp // ws, ws).transpose(0, 2, 1, 3)
    vw = vw.reshape(-1, ws * ws)
    return jnp.asarray(np.tile(vw, (B, 1)))


def _window_block_fused(xw: jnp.ndarray, bp: dict, cfg: SamEncoderConfig,
                        valid) -> jnp.ndarray:
    """One whole window block in window-major layout (ops/window_block):
    the kernel runs LN1+qkv+attention+proj+LN2+MLP with weights resident
    (qkv never round-trips HBM); only the thin rel-pos bias rows are
    computed outside from the residual stream."""
    from flmm_tpu.ops import window_block as wb

    nh, hd, ws = cfg.num_heads, cfg.head_dim, cfg.window_size
    w_s, b_s = wb.scaled_qkv_weights(bp["wqkv"], bp["bqkv"], nh, hd)
    C = cfg.embed_dim
    bias = wb.window_rel_bias_from_x(
        xw, valid, bp["ln1_w"], bp["ln1_b"], w_s[:, :C], b_s[:C],
        bp["rel_pos_h"], bp["rel_pos_w"], ws, nh, hd, eps=cfg.ln_eps)
    mlp = bp["mlp"]
    return wb.window_block(
        xw, bias, valid, bp["ln1_w"], bp["ln1_b"], w_s, b_s,
        bp["wo"], bp["bo"], bp["ln2_w"], bp["ln2_b"],
        mlp["w1"], mlp["b1"], mlp["w2"], mlp["b2"], ws, nh, eps=cfg.ln_eps)


def _global_block_fused(x: jnp.ndarray, bp: dict,
                        cfg: SamEncoderConfig) -> jnp.ndarray:
    """One whole global block via ops/global_block: fused
    LN1+qkv+global-attention+proj+residual (head-major streamed weights,
    qkv never in HBM), then the existing fused LN2+MLP kernel."""
    from flmm_tpu.ops import global_block as gb
    from flmm_tpu.ops import window_block as wb

    B, H, W, C = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    w_s, b_s = wb.scaled_qkv_weights(bp["wqkv"], bp["bqkv"], nh, hd)
    xs = x.reshape(B, H * W, C)
    bias = gb.global_rel_bias_from_x(
        xs, bp["ln1_w"], bp["ln1_b"], w_s[:, :C], b_s[:C],
        bp["rel_pos_h"], bp["rel_pos_w"], H, nh, hd, eps=cfg.ln_eps)
    o = gb.global_attn_block(
        xs, bias, bp["ln1_w"], bp["ln1_b"], w_s, b_s,
        bp["wo"], bp["bo"], H, nh, eps=cfg.ln_eps)
    return _ln_mlp_residual(o.astype(cfg.dtype).reshape(B, H, W, C), bp, cfg)


def forward(params: dict, cfg: SamEncoderConfig, pixels: jnp.ndarray) -> jnp.ndarray:
    """Encode normalised, corner-padded images.

    Args:
      pixels: ``(B, img, img, 3)`` -- output of SAM ``preprocess``.

    Returns ``(B, grid, grid, out_chans)`` NHWC image embeddings.
    """
    from flmm_tpu.ops import window_block as wb

    x = conv2d(
        pixels.astype(cfg.dtype), params["patch_kernel"], params["patch_bias"],
        stride=cfg.patch_size,
    )
    x = x + params["pos_embed"].astype(x.dtype)
    ws = cfg.window_size
    n_win_img = -(-x.shape[1] // ws) * -(-x.shape[2] // ws)
    # the whole-block kernel needs enough windows to amortise its fixed
    # costs: at SAM-448 (4 windows/image) it measured 28.8 vs the flash
    # path's 32.7 img/s end-to-end, at SAM-1024 (25/image) 16.1 vs 12.7
    use_wb = (cfg.window_block_fused
              and (n_win_img >= 25 or wb.INTERPRET)
              and (jax.default_backend() == "tpu" or wb.INTERPRET))
    xw = geom = valid = None
    for i, bp in enumerate(params["blocks"]):
        windowed = i not in cfg.global_attn_indexes
        if (use_wb and windowed and "wqkv" in bp and "w1" in bp["mlp"]
                and cfg.embed_dim % 128 == 0):
            if xw is None:
                xw, geom = _windowize(x, cfg.window_size)
                valid = _window_valid_tokens(geom, cfg.window_size)
            xw = _window_block_fused(xw, bp, cfg, valid)
        else:
            if xw is not None:
                x = _dewindowize(xw, geom, cfg.window_size)
                xw = None
            if (cfg.global_block_fused and use_wb and not windowed
                    and "wqkv" in bp
                    and "w1" in bp["mlp"] and cfg.embed_dim % 128 == 0
                    and x.shape[1] == x.shape[2]
                    and (x.shape[1] * x.shape[2]) % 256 == 0):
                x = _global_block_fused(x, bp, cfg)
            else:
                x = _block(x, bp, cfg, windowed=windowed)
    if xw is not None:
        x = _dewindowize(xw, geom, cfg.window_size)
    x = conv2d(x, params["neck0_kernel"])
    x = channel_norm(x, params["neck0_ln_w"], params["neck0_ln_b"], cfg.ln_eps)
    x = conv2d(x, params["neck1_kernel"], padding=1)
    x = channel_norm(x, params["neck1_ln_w"], params["neck1_ln_b"], cfg.ln_eps)
    return x


def quantize_params(params: dict) -> dict:
    """Int8-quantize every per-token projection of a (frozen) encoder.

    Per-output-channel weight scales; activations quantize dynamically
    inside ``ops.quant.int8_matmul``.  Halves the weight HBM footprint and
    runs the projections on the MXU's 2x int8 path.  Attention cores
    (q @ k, p @ v) and the convs stay in the original dtype.
    """
    from flmm_tpu.ops.quant import quantize_weight

    out = {k: v for k, v in params.items() if k != "blocks"}
    blocks = []
    for bp in params["blocks"]:
        nb = {k: v for k, v in bp.items() if k not in ("wqkv", "wo", "mlp")}
        for name in ("wqkv", "wo"):
            nb[name + "_q"], nb[name + "_s"] = quantize_weight(bp[name])
        mlp = {k: v for k, v in bp["mlp"].items() if k not in ("w1", "w2")}
        for name in ("w1", "w2"):
            mlp[name + "_q"], mlp[name + "_s"] = quantize_weight(bp["mlp"][name])
        nb["mlp"] = mlp
        blocks.append(nb)
    out["blocks"] = blocks
    return out
