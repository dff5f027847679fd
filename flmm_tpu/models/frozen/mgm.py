"""Frozen Mini-Gemini (MGM) grounding model.

Behavioural spec: reference flmm/models/frozen_mgm.py + mgm/model/
mgm_arch.py:236-313 -- dual towers (CLIP-ViT-L/336 + ConvNeXt-L aux),
patch-info-mining ``unified_resampler`` (each CLIP token cross-attends its
aux patch window), optional HD mode (image_grid x image_grid crops plus a
global image whose tokens come first), and per-crop attention-tile
re-assembly into one (grid*24)^2 map with the global map bilinearly
upsampled and channel-concatenated (frozen_mgm.py:171-202).

TPU notes: crops are a static axis (grid is config), so the per-crop
towers batch as one call; the tile re-assembly is a reshape/transpose.
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
from flmm_tpu.models.vision import convnext, vit
from flmm_tpu.ops import masks as mask_ops
from flmm_tpu.ops.resize import resize_bilinear


@dataclasses.dataclass(frozen=True)
class MGMConfig:
    base: GroundingConfig
    aux: convnext.ConvNeXtConfig
    image_grid: int = 1
    image_global: bool = False

    @property
    def num_crops(self) -> int:
        return self.image_grid ** 2 + (1 if self.image_global else 0)

    @property
    def grid_tokens(self) -> int:
        return self.base.clip_shape ** 2  # per-crop token count

    @property
    def map_hw(self) -> tuple:
        g = self.base.clip_shape * self.image_grid
        return (g, g)


def init_params(cfg: MGMConfig, key: jax.Array) -> dict:
    from flmm_tpu.models.frozen import grounding

    params = grounding.init_params(cfg.base, key)
    ks = jax.random.split(jax.random.fold_in(key, 99), 4)
    d_clip = cfg.base.vision.hidden_size
    d_aux = cfg.aux.out_channels

    def ln_lin(k, i, o):
        return {
            "ln_w": jnp.ones((i,), jnp.float32),
            "ln_b": jnp.zeros((i,), jnp.float32),
            "w": (jax.random.normal(k, (i, o), jnp.float32) / jnp.sqrt(i)),
            "b": jnp.zeros((o,), jnp.float32),
        }

    params["frozen"]["aux_tower"] = convnext.init_params(cfg.aux, ks[0])
    params["frozen"]["uni_query"] = ln_lin(ks[1], d_clip, d_clip)
    params["frozen"]["uni_aux"] = ln_lin(ks[2], d_aux, d_clip)
    params["frozen"]["uni_val"] = ln_lin(ks[3], d_aux, d_clip)
    return params


def _ln_lin(x: jnp.ndarray, p: dict, eps: float = 1e-5) -> jnp.ndarray:
    from flmm_tpu.models.sam.common import layer_norm

    y = layer_norm(x.astype(jnp.float32), p["ln_w"], p["ln_b"], eps)
    return y @ p["w"] + p["b"]


def unified_resampler(
    fro: dict, clip_feats: jnp.ndarray, aux_map: jnp.ndarray, patch_num: int,
) -> jnp.ndarray:
    """Patch-info mining (reference mgm_arch.py:295-313).

    Args:
      clip_feats: ``(B, patch_num^2, D)``.
      aux_map: ``(B, A, A, C)`` with ``A % patch_num == 0``.

    Returns ``(B, patch_num^2, D)`` mined aux features.
    """
    B, n, D = clip_feats.shape
    A = aux_map.shape[1]
    ps = A // patch_num
    aux = aux_map.reshape(B, patch_num, ps, patch_num, ps, -1)
    aux = aux.transpose(0, 1, 3, 2, 4, 5).reshape(B, n, ps * ps, -1)
    q = _ln_lin(clip_feats, fro["uni_query"])  # (B, n, D)
    k = _ln_lin(aux, fro["uni_aux"])  # (B, n, p2, D)
    v = _ln_lin(aux, fro["uni_val"])
    att = jnp.einsum("bnd,bnpd->bnp", q, k,
                     preferred_element_type=jnp.float32) / jnp.sqrt(float(D))
    att = jnp.nan_to_num(att)
    att = jax.nn.softmax(att, axis=-1)
    return jnp.einsum("bnp,bnpd->bnd", att, v)


def encode_images(params: dict, cfg: MGMConfig, crops: jnp.ndarray,
                  aux_pixels: jnp.ndarray) -> jnp.ndarray:
    """Crops (B, n_crops, P, P, 3) + aux (B, Sa, Sa, 3) -> token embeds.

    Token order matches the reference: [global | locals] when
    ``image_global`` (mgm_arch.py:284-287).
    """
    fro = params["frozen"]
    gcfg = cfg.base
    B, nc = crops.shape[:2]
    g = cfg.image_grid
    pn = gcfg.clip_shape

    feats = vit.forward(
        fro["vision"], gcfg.vision,
        crops.reshape((B * nc,) + crops.shape[2:]),
        select_layer=gcfg.vision_select_layer,
    )
    if gcfg.vision_drop_cls:
        feats = feats[:, 1:]
    feats = feats.reshape(B, nc, pn * pn, -1)

    aux_map = convnext.forward(fro["aux_tower"], cfg.aux, aux_pixels)
    A = aux_map.shape[1]

    if cfg.image_global:
        local_feats = feats[:, :-1]
        global_feats = feats[:, -1]
        gmap = jnp.moveaxis(aux_map, -1, 1)
        gmap = resize_bilinear(gmap, (A // g, A // g))
        gmap = jnp.moveaxis(gmap, 1, -1)
        global_mined = unified_resampler(fro, global_feats, gmap, pn)
        global_tokens = global_feats + global_mined
    else:
        local_feats = feats
        global_tokens = None

    if g > 1:
        # slice the aux map into per-crop windows
        aux_crops = aux_map.reshape(B, g, A // g, g, A // g, -1)
        aux_crops = aux_crops.transpose(0, 1, 3, 2, 4, 5).reshape(
            B * g * g, A // g, A // g, -1)
        lf = local_feats.reshape(B * g * g, pn * pn, -1)
        mined = unified_resampler(fro, lf, aux_crops, pn)
        local_tokens = (lf + mined).reshape(B, g * g * pn * pn, -1)
    else:
        lf = local_feats.reshape(B, pn * pn, -1)
        mined = unified_resampler(fro, lf, aux_map, pn)
        local_tokens = lf + mined

    if global_tokens is not None:
        tokens = jnp.concatenate([global_tokens, local_tokens], axis=1)
    else:
        tokens = local_tokens
    return _project(tokens, fro["projector"]).astype(gcfg.dtype)


def assemble_attention(cfg: MGMConfig, attn: jnp.ndarray) -> jnp.ndarray:
    """Merged attention (B, L, H, M, n_img) -> (B*M, mh, mw, C) map images.

    Mirrors _process_attention (frozen_mgm.py:171-202): HD crops tile into
    a (grid*pn)^2 map; the global map upsamples to match and concatenates
    channel-first (global block first in channel order, matching the
    reference's torch.cat([global, hd], dim=0) over the head axis).
    """
    B, L, H, M, n = attn.shape
    pn = cfg.base.clip_shape
    g = cfg.image_grid
    mh, mw = cfg.map_hw
    per = pn * pn
    a = attn.transpose(0, 3, 1, 2, 4)  # (B, M, L, H, n)
    if g == 1:
        maps = a.reshape(B * M, L * H, pn, pn)
        return maps.transpose(0, 2, 3, 1)
    if cfg.image_global:
        glob = a[..., :per].reshape(B * M, L * H, pn, pn)
        hd = a[..., per:]
    else:
        glob = None
        hd = a
    hd = hd.reshape(B * M, L * H, g, g, pn, pn)
    hd = hd.transpose(0, 1, 2, 4, 3, 5).reshape(B * M, L * H, mh, mw)
    if glob is not None:
        glob = resize_bilinear(glob, (mh, mw))
        hd = jnp.concatenate([glob, hd], axis=1)  # channel: [global | hd]
    return hd.transpose(0, 2, 3, 1)


def forward(params: dict, cfg: MGMConfig, batch: dict) -> dict:
    fro, tra = params["frozen"], params["trainable"]
    gcfg = cfg.base
    B, S = batch["input_ids"].shape
    M = batch["mask_valid"].shape[1]
    n_img = gcfg.num_img_tokens

    img_embeds = encode_images(
        params, cfg, batch["pixel_values"], batch["aux_pixel_values"]
    )
    embeds = llm.embed_tokens(fro["llm"], gcfg.llm, batch["input_ids"]).astype(
        gcfg.dtype
    )
    embeds = jax.lax.dynamic_update_slice(
        embeds, img_embeds, (0, gcfg.img_start, 0)
    )
    lw = jax.nn.softmax(tra["text_layer_weights"])
    if gcfg.merge == "mean":
        mm = jax.vmap(lambda ids: mask_ops.mean_merge_matrix(ids, M))(
            batch["mask_ids"])
    else:
        mm = jax.vmap(lambda ids: mask_ops.segment_matrix(ids, M))(
            batch["mask_ids"])
    out = llm.forward_capture(
        fro["llm"], gcfg.llm, embeds, batch["attn_mask"],
        img_start=gcfg.img_start, n_img=n_img,
        merge_matrix=mm, merge=gcfg.merge, layer_weights=lw,
    )
    maps = assemble_attention(cfg, out["attn"])
    return heads_forward(params, gcfg, maps, out["hidden"], batch)


def loss_fn(params: dict, cfg: MGMConfig, batch: dict) -> tuple:
    out = forward(params, cfg, batch)
    losses = grounding_losses(
        out["coarse_logits"], batch["gt_coarse"], batch["coarse_weight"],
        out["sam_logits"], batch["gt_sam"], batch["sam_weight"],
        batch["mask_valid"],
    )
    return losses["loss"], losses
