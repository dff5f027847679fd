"""Shared machinery for frozen-LMM grounding models.

Each family module composes: frozen LMM forward with fused attention
capture -> per-mask attention images -> U-Net head -> SAM refiner -> losses
(reference call stack: SURVEY.md section 3.1).  This module holds the
family-independent pieces: batch schema, loss computation, parameter
split conventions.

Parameter convention: ``params = {'frozen': {...}, 'trainable': {...}}``.
Only the trainable tree is differentiated/optimised/checkpointed, mirroring
the reference's trainable-only checkpoints (flmm/runner.py:131,
mask_refiner.py:126-128).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flmm_tpu.ops import losses as L


def grounding_losses(
    coarse_logits: jnp.ndarray,
    gt_coarse: jnp.ndarray,
    coarse_weight: jnp.ndarray,
    sam_logits: jnp.ndarray,
    gt_sam: jnp.ndarray,
    sam_weight: jnp.ndarray,
    mask_valid: jnp.ndarray,
) -> dict:
    """BCE + naive-dice for both heads plus accuracy/aIoU metrics.

    Mirrors reference frozen_llava.py:71-85,167-217: per-pixel BCE with
    avg_factor = (valid) pixel count, dice averaged over masks; sample terms
    weighted by mask count == flat averaging over all valid masks.

    Args:
      coarse_logits: ``(B, M, Hc, Wc)``; gt_coarse likewise (binary).
      coarse_weight: ``(B, Hc, Wc)`` valid-pixel map (LMM-frame unpad).
      sam_logits: ``(B, M, P, P)``; gt_sam likewise.
      sam_weight: ``(B, P, P)`` valid-pixel map (SAM-frame unpad).
      mask_valid: ``(B, M)`` bool.
    """
    B, M = mask_valid.shape
    mv = mask_valid.astype(jnp.float32)

    def head(logits, gt, pix_w):
        w = pix_w[:, None] * mv[:, :, None, None]
        flat_logits = logits.reshape(B * M, -1)
        flat_gt = gt.reshape(B * M, -1)
        flat_w = jnp.broadcast_to(w, logits.shape).reshape(B * M, -1)
        return {
            "loss_mask": L.sigmoid_bce(flat_logits, flat_gt, flat_w),
            "loss_dice": L.naive_dice(
                flat_logits, flat_gt, flat_w, mask_valid.reshape(-1)
            ),
            "accuracy": L.mask_accuracy(flat_logits, flat_gt, flat_w),
            "aiou": (
                L.mask_iou(
                    (jax.nn.sigmoid(flat_logits) > 0.5).astype(jnp.float32)
                    * flat_w,
                    flat_gt * flat_w,
                )
                * mv.reshape(-1)
            ).sum()
            / jnp.maximum(mv.sum(), 1.0),
        }

    coarse = head(coarse_logits, gt_coarse, coarse_weight)
    sam = head(sam_logits, gt_sam, sam_weight)
    out = dict(coarse)
    out.update({f"sam_{k}": v for k, v in sam.items()})
    out["loss"] = (
        out["loss_mask"] + out["loss_dice"]
        + out["sam_loss_mask"] + out["sam_loss_dice"]
    )
    return out
