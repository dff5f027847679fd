"""Segmentation losses matching the reference's mmdet loss semantics.

Reference uses per-pixel sigmoid BCE (mmdet ``CrossEntropyLoss`` with
``use_sigmoid=True``) plus ``DiceLoss(naive_dice=True, eps=1.0)``
(configs/deepseek_vl/frozen_deepseek_vl_1_3b_chat_unet_sam_l_refcoco_png.py:73-85),
accumulated per data sample with mask-count weighting
(flmm/models/frozen_llava.py:167-217).

Here every term takes an optional pixel-weight map so losses computed in a
fixed padded frame only see valid pixels -- the TPU-native replacement for
the reference's dynamic-shape crops.  All reductions are in float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_bce(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mean binary cross-entropy with logits over (weighted) elements.

    Matches mmdet CrossEntropyLoss(use_sigmoid=True, reduction='mean') with
    avg_factor = number of (valid) elements.
    """
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # log(1+exp(-|x|)) formulation for stability.
    per = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    if weights is None:
        return per.mean()
    weights = weights.astype(jnp.float32)
    denom = jnp.maximum(weights.sum(), 1.0)
    return (per * weights).sum() / denom


def naive_dice(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    mask_valid: jnp.ndarray | None = None,
    eps: float = 1.0,
) -> jnp.ndarray:
    """mmdet naive Dice loss, one term per mask, averaged over valid masks.

    Args:
      logits: ``(M, ...)`` mask logits.
      targets: ``(M, ...)`` binary targets.
      weights: optional ``(M, ...)``-broadcastable pixel validity weights.
      mask_valid: optional ``(M,)`` bool -- which mask rows are real.
    """
    m = logits.shape[0]
    p = jax.nn.sigmoid(logits.astype(jnp.float32)).reshape(m, -1)
    t = targets.astype(jnp.float32).reshape(m, -1)
    if weights is not None:
        w = jnp.broadcast_to(weights.astype(jnp.float32), logits.shape).reshape(m, -1)
        p = p * w
        t = t * w
    num = 2.0 * (p * t).sum(-1)
    den = p.sum(-1) + t.sum(-1)
    loss = 1.0 - (num + eps) / (den + eps)
    if mask_valid is None:
        return loss.mean()
    mv = mask_valid.astype(jnp.float32)
    return (loss * mv).sum() / jnp.maximum(mv.sum(), 1.0)


def mask_accuracy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Fraction of (valid) pixels where sigmoid(logits) > 0.5 equals target."""
    pred = (jax.nn.sigmoid(logits.astype(jnp.float32)) > 0.5).astype(jnp.float32)
    eq = (pred == targets.astype(jnp.float32)).astype(jnp.float32)
    if weights is None:
        return eq.mean()
    w = jnp.broadcast_to(weights.astype(jnp.float32), logits.shape)
    return (eq * w).sum() / jnp.maximum(w.sum(), 1.0)


def mask_iou(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """Per-mask IoU of binary maps flattened per row.

    Mirrors flmm/utils.py:7 ``compute_mask_IoU``.  ``pred``/``target`` are
    ``(M, ...)``; returns ``(M,)``.
    """
    m = pred.shape[0]
    p = pred.astype(jnp.float32).reshape(m, -1)
    t = target.astype(jnp.float32).reshape(m, -1)
    if weights is not None:
        w = jnp.broadcast_to(weights.astype(jnp.float32), pred.shape).reshape(m, -1)
        p = p * w
        t = t * w
    inter = (p * t).sum(-1)
    union = (p + t - p * t).sum(-1)
    return inter / (union + eps)
