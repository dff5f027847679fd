"""SAM refiner: coarse U-Net logits -> refined SAM masks, batched over masks.

Behavioural spec: reference flmm/models/mask_head/mask_refiner.py
(SAMWrapper.forward:71-124): per mask, build (box prompt from the
thresholded coarse mask, 256x256 dense prompt from the coarse logits, text
embeddings appended to the sparse tokens), run the SAM mask decoder, and
postprocess to image resolution.

TPU re-design -- the reference's dynamic-shape chain
(crop -> F.interpolate -> F.pad -> F.interpolate, numpy mask2box on host)
becomes a static-shape program:

* All geometry is carried as traced scalars (crop origin/size in the coarse
  grid, SAM-frame valid size), applied through ``affine_grid_sample``.
* The box prompt is computed on-device from the coarse mask thresholded in
  a fixed ``box_frame`` resolution (quantisation ~4 px in the SAM frame vs
  the reference's original-resolution box; heads are trained from scratch
  against this same convention).
* The per-mask python loop becomes one batched decoder call with padded
  text tokens and a key-validity mask.

Everything here is per-sample (one image, M masks); the model vmaps over
the batch.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from flmm_tpu.models.sam import mask_decoder as sam_decoder
from flmm_tpu.models.sam import prompt_encoder as sam_prompt
from flmm_tpu.models.sam.image_encoder import SamEncoderConfig
from flmm_tpu.models.sam.mask_decoder import MaskDecoderConfig
from flmm_tpu.models.sam.prompt_encoder import PromptEncoderConfig
from flmm_tpu.ops.losses import mask_iou
from flmm_tpu.ops.masks import mask_to_box
from flmm_tpu.ops.resize import affine_grid_sample


@dataclasses.dataclass(frozen=True)
class SamRefinerConfig:
    encoder: SamEncoderConfig = dataclasses.field(default_factory=SamEncoderConfig)
    prompt: PromptEncoderConfig = dataclasses.field(
        default_factory=PromptEncoderConfig
    )
    decoder: MaskDecoderConfig = dataclasses.field(default_factory=MaskDecoderConfig)
    use_text: bool = True
    use_mask: bool = True
    use_box: bool = True
    multimask_output: bool = False
    box_frame: int = 256  # resolution for box extraction from coarse masks
    prompt_size: int = 256  # dense-prompt / low-res mask resolution


def refine(
    params: dict,
    cfg: SamRefinerConfig,
    image_embedding: jnp.ndarray,
    coarse_logits: jnp.ndarray,
    geom: dict,
    text_embeds: jnp.ndarray | None = None,
    text_valid: jnp.ndarray | None = None,
) -> dict:
    """Refine coarse masks for one image.

    Args:
      params: dict with 'prompt' and 'decoder' param trees.
      image_embedding: ``(S, S, D)`` frozen SAM encoder output.
      coarse_logits: ``(M, Hc, Wc)`` U-Net logits in the LMM padded frame.
      geom: traced scalars --
        'crop_y', 'crop_x': coarse-grid crop origin (reference int math
          ``int(before * Hc / P)``, computed on host);
        'crop_h', 'crop_w': coarse-grid crop size;
        'sam_h', 'sam_w': valid (resized-image) extent in the SAM frame.
      text_embeds: ``(M, T, D)`` projected text tokens (padded).
      text_valid: ``(M, T)`` bool.

    Returns dict with 'low_res_logits' ``(M, 256, 256)`` (SAM frame) and
    'iou_pred' ``(M,)``.
    """
    M, Hc, Wc = coarse_logits.shape
    P = cfg.prompt_size
    img_size = float(cfg.encoder.img_size)
    cy = geom["crop_y"].astype(jnp.float32)
    cx = geom["crop_x"].astype(jnp.float32)
    ch = geom["crop_h"].astype(jnp.float32)
    cw = geom["crop_w"].astype(jnp.float32)
    nh = geom["sam_h"].astype(jnp.float32)
    nw = geom["sam_w"].astype(jnp.float32)

    src_lo = jnp.stack([cy, cx])
    src_hi = jnp.stack([cy + ch - 1.0, cx + cw - 1.0])

    # --- dense prompt: coarse crop -> (sam_h, sam_w) region of the SAM
    # frame, pad with min(-1, min) elsewhere, at prompt resolution.
    # (reference generate_prompt_masks:61-69)
    in_roi = (
        (jnp.arange(Hc)[:, None] >= cy[None])
        & (jnp.arange(Hc)[:, None] <= src_hi[0])
    )[None, :, :] & (
        (jnp.arange(Wc)[None, :] >= cx[None]) & (jnp.arange(Wc)[None, :] <= src_hi[1])
    )[None, :, :]
    roi_min = jnp.min(
        jnp.where(in_roi, coarse_logits, jnp.inf), axis=(1, 2)
    )
    # reference mask_refiner.py:62 reads the min via .item() -- a detached
    # host constant -- so no gradient may flow into the coarse logits
    # through the pad value
    pad_value = jax.lax.stop_gradient(jnp.minimum(-1.0, jnp.min(roi_min)))
    ratio = img_size / P  # SAM frame pixels per prompt pixel
    scale = jnp.stack([ratio * ch / nh, ratio * cw / nw])
    prompt_masks = affine_grid_sample(
        coarse_logits, scale, src_lo, (P, P), fill=pad_value,
        src_lo=src_lo, src_hi=src_hi, mode="fill",
    )  # (M, P, P)

    # --- box prompt from the thresholded coarse mask in a fixed frame
    # (reference forward:78-92: threshold sigmoid>0.5 at original size,
    # numpy mask2box, apply_boxes into the SAM frame)
    bf = cfg.box_frame
    box_scale = jnp.stack([ch / bf, cw / bf])
    box_view = affine_grid_sample(
        coarse_logits, box_scale, src_lo, (bf, bf),
        src_lo=src_lo, src_hi=src_hi, mode="clamp",
    )
    binary = jax.nn.sigmoid(box_view) > 0.5
    boxes = jax.vmap(mask_to_box)(binary)  # (M, 4) in box-frame px
    boxes = boxes * jnp.stack([nw, nh, nw, nh]) / bf

    # --- prompt encoding
    pcfg = cfg.prompt
    sparse_parts = []
    valid_parts = []
    if cfg.use_box:
        sparse_parts.append(sam_prompt.embed_boxes(params["prompt"], pcfg, boxes))
        valid_parts.append(jnp.ones((M, 2), bool))
    if cfg.use_text and text_embeds is not None:
        sparse_parts.append(text_embeds.astype(image_embedding.dtype))
        valid_parts.append(
            text_valid if text_valid is not None
            else jnp.ones(text_embeds.shape[:2], bool)
        )
    sparse = jnp.concatenate(sparse_parts, axis=1)
    sparse_valid = jnp.concatenate(valid_parts, axis=1)

    if cfg.use_mask:
        dense = sam_prompt.embed_masks(
            params["prompt"], pcfg, prompt_masks[..., None]
        )
    else:
        dense = sam_prompt.no_mask_dense(params["prompt"], pcfg, M)

    image_pe = sam_prompt.dense_pe(params["prompt"], pcfg)
    masks, iou_pred = sam_decoder.forward(
        params["decoder"], cfg.decoder, image_embedding, image_pe, sparse,
        dense, sparse_valid=sparse_valid,
    )  # (M, num_mask_tokens, P, P)

    if cfg.multimask_output:
        cand = masks[:, 1:]  # (M, 3, P, P)
        coarse_bin = (prompt_masks > 0.0).astype(jnp.float32)
        ious = jax.vmap(
            lambda c, t: mask_iou((c > 0).astype(jnp.float32), t[None].repeat(3, 0))
        )(cand, coarse_bin)  # (M, 3)
        best = jnp.argmax(ious, axis=1)
        low_res = jnp.take_along_axis(
            cand, best[:, None, None, None], axis=1
        )[:, 0]
        iou_sel = jnp.take_along_axis(iou_pred[:, 1:], best[:, None], axis=1)[:, 0]
    else:
        low_res = masks[:, 0]
        iou_sel = iou_pred[:, 0]

    return {
        "low_res_logits": low_res.astype(jnp.float32),
        "iou_pred": iou_sel,
        "prompt_masks": prompt_masks,
        "boxes": boxes,
    }
