"""Generic frozen-LMM grounding model for contiguous-image-block families.

One implementation covers DeepSeek-VL (reference flmm/models/
frozen_deepseek_vl.py), LLaVA-1.5 (frozen_llava.py) and HPT
(frozen_hpt.py): every one of them packs the image features as a single
contiguous block into the sequence (LLaVA's scatter merge
llava/modeling_llava.py:68-152 is equivalent to pre-expanding the
placeholder token, which our data pipeline does), so the attention
side-output is a static slice and family differences reduce to the vision
tower, the select-layer/CLS convention and projector dimensions.

Pipeline: tower -> MLP projector -> frozen decoder with fused per-mask
attention capture -> U-Net coarse head -> SAM refiner -> losses.  The whole
training/eval step is one jitted program per static batch shape: no
per-sample loops, no dynamic shapes (SURVEY.md section 7).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from flmm_tpu.models.frozen.base import grounding_losses
from flmm_tpu.models.llm import decoder as llm
from flmm_tpu.models.mask_head import refiner as sam_refiner
from flmm_tpu.models.mask_head import unet
from flmm_tpu.models.sam import image_encoder as sam_encoder
from flmm_tpu.models.vision import vit
from flmm_tpu.ops import masks as mask_ops


@dataclasses.dataclass(frozen=True)
class GroundingConfig:
    llm: llm.DecoderConfig
    vision: vit.ViTConfig
    unet: unet.UNetConfig
    sam: sam_refiner.SamRefinerConfig
    projector_depth: int = 2  # 'mlp_gelu' depth (deepseek aligner / llava
    # multi_modal_projector / hpt & mgm mlp2x_gelu are all linear-gelu-linear)
    img_start: int = 5  # first image-token position in the packed prompt
    num_img_tokens: int = 576
    clip_shape: int = 24  # reference frozen_deepseek_vl.py:36-37
    merge: str = "mean"
    vision_select_layer: int = -1  # -1 deepseek (final+norm), -2 llava/hpt
    vision_drop_cls: bool = False  # llava: drop CLS from tower features
    # input resolution fed to the tower; if it exceeds the tower's native
    # image_size the position embeddings are bicubically resampled (HPT,
    # reference frozen_hpt.py:41-70)
    image_input_size: int | None = None
    # DeepSeek-VL-7B hybrid tower: SAM-B high-res branch paired with the
    # low-res tower in cfg.vision, fused by the split projector
    # (reference deepseek_vl/models/clip_encoder.py:126-203,
    # projector.py:47-56).  None for single-tower families.
    hybrid_high: Any = None
    dtype: Any = jnp.bfloat16

    @property
    def input_size(self) -> int:
        return self.image_input_size or self.vision.image_size

    @property
    def attn_channels(self) -> int:
        return self.llm.num_layers * self.llm.num_heads


def init_params(cfg: GroundingConfig, key: jax.Array) -> dict:
    ks = jax.random.split(key, 8)
    d_llm = cfg.llm.hidden_size
    d_vis = cfg.vision.hidden_size
    d_sam = cfg.sam.prompt.embed_dim

    def lin(k, i, o):
        return {
            "w": (jax.random.normal(k, (i, o), jnp.float32) / jnp.sqrt(i)).astype(
                jnp.float32
            ),
            "b": jnp.zeros((o,), jnp.float32),
        }

    if cfg.hybrid_high is not None:
        # low_high_hybrid_split_mlp_gelu (reference projector.py:47-56)
        pk = jax.random.split(ks[2], cfg.projector_depth + 2)
        proj_layers = {
            "high_up": lin(pk[0], cfg.hybrid_high.out_channels, d_llm // 2),
            "low_up": lin(pk[1], d_vis, d_llm // 2),
            "layers": [lin(pk[2 + i], d_llm, d_llm)
                       for i in range(cfg.projector_depth - 1)],
        }
    else:
        proj_layers = [lin(jax.random.split(ks[2], cfg.projector_depth)[i],
                           d_vis if i == 0 else d_llm, d_llm)
                       for i in range(cfg.projector_depth)]
    from flmm_tpu.models.sam import mask_decoder as smd
    from flmm_tpu.models.sam import prompt_encoder as spe
    from flmm_tpu.models.sam import transformer as stw  # noqa: F401

    frozen = {
        "llm": llm.init_params(cfg.llm, ks[0]),
        "vision": vit.init_params(cfg.vision, ks[1]),
        "projector": proj_layers,
        "sam_encoder": sam_encoder.init_params(cfg.sam.encoder, ks[3]),
    }
    if cfg.hybrid_high is not None:
        from flmm_tpu.models.vision import sam_tower

        frozen["vision_high"] = sam_tower.init_params(
            cfg.hybrid_high, jax.random.fold_in(key, 77))
    return {
        "frozen": frozen,
        "trainable": {
            "unet": unet.init_params(cfg.unet, ks[4]),
            "text_proj": lin(ks[5], d_llm, d_sam),
            "text_layer_weights": jnp.ones((cfg.llm.num_layers,), jnp.float32),
            "sam": {
                "prompt": spe.init_params(cfg.sam.prompt, ks[6]),
                "decoder": smd.init_params(cfg.sam.decoder, ks[7]),
            },
        },
    }


def quantize_frozen_llm(params: dict) -> dict:
    """Int8-quantize the frozen decoder's projections (W8A8 serving mode).

    The LLM never trains (reference frozen_llava.py:22), so this is a
    pure deployment transform: halves the dominant HBM term of 7B/8B
    single-chip serving (see llm.decoder.quantize_params)."""
    out = dict(params)
    fro = dict(params["frozen"])
    fro["llm"] = llm.quantize_params(fro["llm"])
    out["frozen"] = fro
    return out


def quantize_frozen_sam(params: dict) -> dict:
    """Int8-quantize the frozen SAM image encoder's projections (W8A8).

    The encoder never trains (reference mask_refiner.py:30), so this is a
    pure inference-deployment transform: ``ops.quant.dense`` dispatches on
    the quantized keys, no config change needed.  See tests/test_quant.py
    for the accuracy bound.
    """
    out = dict(params)
    fro = dict(params["frozen"])
    fro["sam_encoder"] = sam_encoder.quantize_params(fro["sam_encoder"])
    out["frozen"] = fro
    return out


def _project(features: jnp.ndarray, layers: list) -> jnp.ndarray:
    """DeepSeek 'mlp_gelu' aligner (reference projector.py:39-45)."""
    x = features
    for i, p in enumerate(layers):
        if i > 0:
            x = jax.nn.gelu(x, approximate=False)
        x = x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)
    return x


def _project_hybrid(high: jnp.ndarray, low: jnp.ndarray, p: dict):
    """low_high_hybrid_split_mlp_gelu (reference projector.py:77-82)."""
    h = high @ p["high_up"]["w"].astype(high.dtype) +         p["high_up"]["b"].astype(high.dtype)
    l = low @ p["low_up"]["w"].astype(low.dtype) +         p["low_up"]["b"].astype(low.dtype)
    x = jnp.concatenate([h, l], axis=-1)
    for lp in p["layers"]:
        x = jax.nn.gelu(x, approximate=False)
        x = x @ lp["w"].astype(x.dtype) + lp["b"].astype(x.dtype)
    return x


def forward(params: dict, cfg: GroundingConfig, batch: dict) -> dict:
    """Full grounding forward for a static-shape batch.

    Batch schema (B=batch, S=seq, M=max masks, T=max text tokens/mask):
      input_ids (B,S) i32; attn_mask (B,S) bool; mask_ids (B,S) i32;
      mask_valid (B,M) bool; text_idx (B,M,T) i32; text_valid (B,M,T) bool;
      pixel_values (B,384,384,3) f32 (tower-normalised, NHWC);
      sam_pixel_values (B,1024,1024,3) f32 (SAM-normalised, corner-padded);
      geom: dict of (B,) f32 -- crop_y/crop_x/crop_h/crop_w (coarse grid)
        and sam_h/sam_w (valid SAM-frame extent).

    Returns coarse logits (B,M,Hc,Wc), SAM low-res logits (B,M,256,256),
    iou predictions and the layer-weighted hidden states.
    """
    fro, tra = params["frozen"], params["trainable"]
    B, S = batch["input_ids"].shape
    M = batch["mask_valid"].shape[1]
    n_img = cfg.num_img_tokens

    # 1. vision tower(s) + aligner -> image token embeddings
    feats = vit.forward(
        fro["vision"], cfg.vision, batch["pixel_values"],
        select_layer=cfg.vision_select_layer,
    )
    if cfg.vision_drop_cls:
        feats = feats[:, 1:]
    if cfg.hybrid_high is not None:
        from flmm_tpu.models.vision import sam_tower

        high = sam_tower.forward(
            fro["vision_high"], cfg.hybrid_high,
            batch["hires_pixel_values"],
        )
        high = high.reshape(B, -1, high.shape[-1])
        img_embeds = _project_hybrid(high, feats, fro["projector"]).astype(
            cfg.dtype)
    else:
        img_embeds = _project(feats, fro["projector"]).astype(cfg.dtype)

    # 2. scatter into the packed sequence (contiguous static block)
    embeds = llm.embed_tokens(fro["llm"], cfg.llm, batch["input_ids"]).astype(
        cfg.dtype
    )
    embeds = jax.lax.dynamic_update_slice(
        embeds, img_embeds, (0, cfg.img_start, 0)
    )

    # 3. frozen decoder with fused attention capture
    lw = jax.nn.softmax(tra["text_layer_weights"])
    if cfg.merge == "mean":
        mm = jax.vmap(lambda ids: mask_ops.mean_merge_matrix(ids, M))(
            batch["mask_ids"]
        )
    else:
        mm = jax.vmap(lambda ids: mask_ops.segment_matrix(ids, M))(
            batch["mask_ids"]
        )
    out = llm.forward_capture(
        fro["llm"], cfg.llm, embeds, batch["attn_mask"],
        img_start=cfg.img_start, n_img=n_img,
        merge_matrix=mm, merge=cfg.merge, layer_weights=lw,
        position_ids=batch.get("position_ids"),
    )

    # 4. per-mask attention images (channel order = layer-major, matching
    #    the reference's torch.cat over layers of (heads,...) maps)
    attn = out["attn"]  # (B, L, H, M, n_img)
    L_, H_ = cfg.llm.num_layers, cfg.llm.num_heads
    g = cfg.clip_shape
    attn = attn.transpose(0, 3, 1, 2, 4).reshape(B * M, L_ * H_, g, g)
    attn = attn.transpose(0, 2, 3, 1)  # NHWC

    return heads_forward(params, cfg, attn, out["hidden"], batch)


def heads_forward(
    params: dict, cfg: GroundingConfig, attn_nhwc: jnp.ndarray,
    hidden: jnp.ndarray, batch: dict,
) -> dict:
    """Shared tail: attention images -> U-Net -> text prompts -> SAM.

    Args:
      attn_nhwc: ``(B*M, h, w, C)`` per-mask attention images.
      hidden: ``(B, S, D)`` layer-weighted hidden states (f32).
    """
    fro, tra = params["frozen"], params["trainable"]
    B, M = batch["mask_valid"].shape

    # U-Net coarse masks
    coarse = unet.forward(tra["unet"], cfg.unet, attn_nhwc)
    Hc, Wc = coarse.shape[-2:]
    coarse = coarse.reshape(B, M, Hc, Wc).astype(jnp.float32)

    # text prompt embeddings per mask
    tp = tra["text_proj"]
    text = jax.vmap(lambda h, idx: h[idx])(hidden, batch["text_idx"])
    text = text @ tp["w"] + tp["b"]  # (B, M, T, d_sam)
    text = text * batch["text_valid"][..., None]

    # frozen SAM encoder + batched refiner
    img_emb = sam_encoder.forward(
        fro["sam_encoder"], cfg.sam.encoder, batch["sam_pixel_values"]
    )
    refined = jax.vmap(
        lambda emb, cl, geom, te, tv: sam_refiner.refine(
            tra["sam"], cfg.sam, emb, cl, geom, te, tv
        )
    )(
        img_emb, coarse,
        {k: batch["geom"][k] for k in
         ("crop_y", "crop_x", "crop_h", "crop_w", "sam_h", "sam_w")},
        text, batch["text_valid"],
    )

    return {
        "coarse_logits": coarse,
        "sam_logits": refined["low_res_logits"],
        "iou_pred": refined["iou_pred"],
        "hidden": hidden,
        "boxes": refined["boxes"],
    }


def loss_fn(params: dict, cfg: GroundingConfig, batch: dict) -> tuple:
    out = forward(params, cfg, batch)
    losses = grounding_losses(
        out["coarse_logits"], batch["gt_coarse"], batch["coarse_weight"],
        out["sam_logits"], batch["gt_sam"], batch["sam_weight"],
        batch["mask_valid"],
    )
    return losses["loss"], losses
