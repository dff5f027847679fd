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

    Mirrors reference frozen_llava.py:71-85,167-217 EXACTLY: the BCE and
    accuracy terms are PER-SAMPLE pixel means (avg_factor = that sample's
    valid pixel count) weighted by the sample's mask count and normalised
    by the total mask count -- when samples unpad to different valid
    sizes this is NOT the same as flat averaging over all valid pixels
    (each sample's pixels carry weight ``m_s / (h_s * w_s)``).  Dice and
    aIoU are per-mask normalised, so mask-count weighting reduces to flat
    averaging over valid masks (pinned by tests/test_grad_parity.py).

    Args:
      coarse_logits: ``(B, M, Hc, Wc)``; gt_coarse likewise (binary).
      coarse_weight: ``(B, Hc, Wc)`` valid-pixel map (LMM-frame unpad).
      sam_logits: ``(B, M, P, P)``; gt_sam likewise.
      sam_weight: ``(B, P, P)`` valid-pixel map (SAM-frame unpad).
      mask_valid: ``(B, M)`` bool.
    """
    B, M = mask_valid.shape
    mv = mask_valid.astype(jnp.float32)

    m_s = mv.sum(1)                                   # (B,) mask counts
    m_norm = jnp.maximum(m_s.sum(), 1.0)

    def per_sample_mean(per, w):
        """(B, M, H, W) elementwise terms -> reference scalar: per-sample
        weighted pixel mean, weighted by mask count / total mask count."""
        num = (per * w).sum(axis=(1, 2, 3))
        den = jnp.maximum(w.sum(axis=(1, 2, 3)), 1.0)
        return ((num / den) * m_s).sum() / m_norm

    def head(logits, gt, pix_w):
        w = jnp.broadcast_to(
            pix_w[:, None] * mv[:, :, None, None], logits.shape
        ).astype(jnp.float32)
        flat_logits = logits.reshape(B * M, -1)
        flat_gt = gt.reshape(B * M, -1)
        flat_w = w.reshape(B * M, -1)
        lf = logits.astype(jnp.float32)
        gf = gt.astype(jnp.float32)
        bce = (jnp.maximum(lf, 0.0) - lf * gf
               + jnp.log1p(jnp.exp(-jnp.abs(lf))))
        acc = (
            (jax.nn.sigmoid(lf) > 0.5).astype(jnp.float32) == gf
        ).astype(jnp.float32)
        return {
            "loss_mask": per_sample_mean(bce, w),
            "loss_dice": L.naive_dice(
                flat_logits, flat_gt, flat_w, mask_valid.reshape(-1)
            ),
            "accuracy": per_sample_mean(acc, w),
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
