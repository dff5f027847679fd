"""Frozen LLaVA-Next (anyres) grounding model.

Behavioural spec: reference flmm/models/frozen_llava_next.py
(FrozenLlavaNextSAM) + llava/modeling_llava_next.py:240-301 -- anyres
feature packing (base tile + unpadded fine tiles + newline column), dual
coarse/fine attention streams concatenated channel-wise into a
``2 * layers * heads``-channel U-Net input.

TPU re-design: the image block is padded to a static width with masked
slots and explicit position ids (exact RoPE parity with the reference's
dynamic packing); the coarse (24x24, aspect-distorted full image) and fine
(unpadded, variable extent) attention maps are resampled by
``affine_grid_sample`` into the canonical square coarse frame instead of
the reference's per-sample dynamically-shaped U-Net input -- one compiled
program for every anyres grid configuration.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from flmm_tpu.models.frozen.base import grounding_losses
from flmm_tpu.models.frozen.grounding import GroundingConfig, _project, \
    heads_forward
from flmm_tpu.models.llm import decoder as llm
from flmm_tpu.models.vision import vit
from flmm_tpu.ops import masks as mask_ops
from flmm_tpu.ops.resize import affine_grid_sample


@dataclasses.dataclass(frozen=True)
class LlavaNextConfig:
    base: GroundingConfig  # llm/vision/unet/sam etc.
    max_tiles: int = 4
    max_fine_hw: tuple = (72, 72)
    n_img_max: int = 2928  # 576 + 48*49 for the 336-base pinpoints
    coarse_frame: tuple = (64, 64)  # square frame fed to the U-Net
    # anyres grid pinpoints + tile geometry (drives the data-side
    # AnyresSpec; see data/llava_next.py)
    pinpoints: tuple = ((336, 672), (672, 336), (672, 672), (1008, 336),
                        (336, 1008))
    tile_size: int = 336

    def anyres_spec(self):
        from flmm_tpu.data.llava_next import AnyresSpec

        return AnyresSpec(tile_size=self.tile_size,
                          patch_size=self.base.vision.patch_size,
                          pinpoints=self.pinpoints)

    @property
    def grid(self) -> int:
        return self.base.clip_shape


def init_params(cfg: LlavaNextConfig, key: jax.Array) -> dict:
    from flmm_tpu.models.frozen import grounding

    params = grounding.init_params(cfg.base, key)
    d = cfg.base.llm.hidden_size
    params["frozen"]["image_newline"] = (
        jax.random.normal(jax.random.key(7), (d,), jnp.float32) * 0.02
    ).astype(cfg.base.dtype)
    return params


def pack_embeds(params: dict, cfg: LlavaNextConfig, batch: dict):
    """Steps 1-3 of the anyres forward: tower over base+tiles, block
    gather through the per-sample feature table, scatter into the padded
    image block.  Shared by training/eval ``forward`` and decode-time
    generation (the packed block is contiguous at ``img_start`` with
    ``attn_mask`` masking its pad slots, so the KV-decode capture path
    applies unchanged)."""
    fro = params["frozen"]
    gcfg = cfg.base
    B = batch["input_ids"].shape[0]
    g = cfg.grid
    g2 = g * g

    # 1. tower over base+tiles
    tiles = batch["tiles"]  # (B, 1+T, gpx, gpx, 3)
    nt = tiles.shape[1]
    feats = vit.forward(
        fro["vision"], gcfg.vision,
        tiles.reshape((B * nt,) + tiles.shape[2:]),
        select_layer=gcfg.vision_select_layer,
    )
    if gcfg.vision_drop_cls:
        feats = feats[:, 1:]
    feats = _project(feats, fro["projector"]).astype(gcfg.dtype)
    d = feats.shape[-1]
    feats = feats.reshape(B, nt * g2, d)

    # 2. per-sample feature source table + block gather
    newline = jnp.broadcast_to(
        fro["image_newline"].astype(gcfg.dtype), (B, 1, d)
    )
    zero = jnp.zeros((B, 1, d), gcfg.dtype)
    table = jnp.concatenate([feats, newline, zero], axis=1)
    block = jnp.take_along_axis(
        table, batch["block_index"][..., None], axis=1
    )  # (B, n_max, d)
    block = block * batch["block_valid"][..., None]

    # 3. scatter into the padded image block
    embeds = llm.embed_tokens(fro["llm"], gcfg.llm, batch["input_ids"]).astype(
        gcfg.dtype
    )
    embeds = jax.lax.dynamic_update_slice(
        embeds, block, (0, gcfg.img_start, 0)
    )
    return embeds


def forward(params: dict, cfg: LlavaNextConfig, batch: dict) -> dict:
    fro, tra = params["frozen"], params["trainable"]
    gcfg = cfg.base
    B, S = batch["input_ids"].shape
    M = batch["mask_valid"].shape[1]
    g = cfg.grid
    g2 = g * g
    n_max = cfg.n_img_max

    embeds = pack_embeds(params, cfg, batch)
    lw = jax.nn.softmax(tra["text_layer_weights"])
    if gcfg.merge == "mean":
        mm = jax.vmap(lambda ids: mask_ops.mean_merge_matrix(ids, M))(
            batch["mask_ids"])
    else:
        mm = jax.vmap(lambda ids: mask_ops.segment_matrix(ids, M))(
            batch["mask_ids"])
    out = llm.forward_capture(
        fro["llm"], gcfg.llm, embeds, batch["attn_mask"],
        img_start=gcfg.img_start, n_img=n_max,
        merge_matrix=mm, merge=gcfg.merge, layer_weights=lw,
        position_ids=batch["position_ids"],
    )

    maps = assemble_frames(cfg, out["attn"], batch)
    return heads_forward(params, cfg.base, maps, out["hidden"], batch)


def assemble_frames(cfg: "LlavaNextConfig", attn: jnp.ndarray,
                    batch: dict) -> jnp.ndarray:
    """Coarse + fine attention maps -> canonical square frame.

    Args:
      attn: merged capture ``(B, L, H, M, n_max)`` over the packed anyres
        image block (reference frozen_llava_next.py:110-150).
      batch: needs ``fine_gather``/``fine_valid``/``fine_hw``/``geom``.

    Returns ``(B*M, Hc, Wc, 2*L*H)`` U-Net-ready maps (channel layout
    [coarse layer-major | fine layer-major], matching the reference's
    ``torch.cat([coarse, fine], dim=1)``, frozen_llava_next.py:145).
    """
    gcfg = cfg.base
    B, L_, H_, M, n_max_ = attn.shape
    g = cfg.grid
    g2 = g * g
    fhm, fwm = cfg.max_fine_hw
    # Gather on the (B, L*H*M, n) flattening: a 5-D take_along_axis puts
    # the small (H, M) axes minor-most and XLA pads them to the (8, 128)
    # tile -- measured 4x HBM expansion (2.5 GB at the 7B anyres
    # geometry).  The flat layout tiles (L*H*M, n) with no padding.
    flat = attn.reshape(B, L_ * H_ * M, n_max_)
    coarse_maps = flat[..., :g2].reshape(B, L_ * H_ * M, g, g)
    fine = jnp.take_along_axis(
        flat, batch["fine_gather"][:, None, :], axis=-1
    )
    fine = fine * batch["fine_valid"][:, None, :]
    fine_maps = fine.reshape(B, L_ * H_ * M, fhm, fwm)

    Hc, Wc = cfg.coarse_frame
    geom = batch["geom"]

    def to_frame(maps, src_h, src_w, b):
        """Sample [0,src_h)x[0,src_w) onto the image region of the square
        frame (clamp-replicated outside; loss weights zero the padding)."""
        cy = geom["crop_y"][b]
        cx = geom["crop_x"][b]
        ch = jnp.maximum(geom["crop_h"][b], 1.0)
        cw = jnp.maximum(geom["crop_w"][b], 1.0)
        scale = jnp.stack([src_h / ch, src_w / cw])
        offset = jnp.stack([-cy * src_h / ch, -cx * src_w / cw])
        return affine_grid_sample(
            maps, scale, offset, (Hc, Wc),
            src_lo=jnp.zeros(2),
            src_hi=jnp.stack([src_h - 1.0, src_w - 1.0]),
            mode="clamp",
        )

    def per_sample(b):
        cm = coarse_maps[b]
        fm = fine_maps[b]
        fh = batch["fine_hw"][b, 0]
        fw = batch["fine_hw"][b, 1]
        cframe = to_frame(cm, float(g), float(g), b)
        fframe = to_frame(fm, fh, fw, b)
        return cframe, fframe

    cframes, fframes = jax.vmap(per_sample)(jnp.arange(B))
    cframes = cframes.reshape(B, L_ * H_, M, Hc, Wc)
    fframes = fframes.reshape(B, L_ * H_, M, Hc, Wc)
    maps = jnp.concatenate([cframes, fframes], axis=1)  # (B, 2LH, M, Hc, Wc)
    return maps.transpose(0, 2, 3, 4, 1).reshape(B * M, Hc, Wc, 2 * L_ * H_)


def loss_fn(params: dict, cfg: LlavaNextConfig, batch: dict) -> tuple:
    out = forward(params, cfg, batch)
    losses = grounding_losses(
        out["coarse_logits"], batch["gt_coarse"], batch["coarse_weight"],
        out["sam_logits"], batch["gt_sam"], batch["sam_weight"],
        batch["mask_valid"],
    )
    return losses["loss"], losses
