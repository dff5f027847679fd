"""On-device sharded metric accumulation.

The reference gathers every prediction to rank 0 and scores in Python
(accelerate ``gather_object``, multiprocess_eval_refcoco.py:169).  On a
mesh, this module scores each shard on-device in the fixed SAM frame and
reduces with ``psum``-style sums -- no host gather of mask tensors.

The on-device cIoU/mIoU is computed in the 256^2 SAM frame (weighted to
the valid region), a close, resolution-bounded approximation of the exact
original-resolution metrics (the host path in evalsuite.runner stays the
reference-exact scorer).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flmm_tpu.parallel import mesh as mesh_lib


def batch_iou_terms(
    sam_logits: jnp.ndarray,
    gt_sam: jnp.ndarray,
    sam_weight: jnp.ndarray,
    mask_valid: jnp.ndarray,
) -> dict:
    """Per-batch IoU sums in the SAM frame.

    Args:
      sam_logits: ``(B, M, P, P)``; gt_sam binary likewise.
      sam_weight: ``(B, P, P)``; mask_valid ``(B, M)``.

    Returns dict of scalars: intersection/union sums, per-mask IoU sum and
    valid count -- addable across batches and devices.
    """
    pred = (jax.nn.sigmoid(sam_logits.astype(jnp.float32)) > 0.5).astype(
        jnp.float32
    ) * sam_weight[:, None]
    gt = gt_sam.astype(jnp.float32) * sam_weight[:, None]
    mv = mask_valid.astype(jnp.float32)
    inter = (pred * gt).sum(axis=(2, 3)) * mv
    union = (pred + gt - pred * gt).sum(axis=(2, 3)) * mv
    iou = inter / jnp.maximum(union, 1e-12)
    return {
        "intersection": inter.sum(),
        "union": union.sum(),
        "iou_sum": (iou * mv).sum(),
        "count": mv.sum(),
    }


def make_sharded_eval_step(model_forward, mesh):
    """jitted ``batch -> metric term scalars`` with data-sharded batches.

    XLA inserts the cross-device reductions for the scalar outputs; the
    result is replicated, so any host can read it.
    """

    def step(params, batch):
        out = model_forward(params, batch)
        return batch_iou_terms(
            out["sam_logits"], batch["gt_sam"], batch["sam_weight"],
            batch["mask_valid"],
        )

    def run(params, batch):
        with mesh:
            sharded = jax.device_put(
                batch, mesh_lib.batch_shardings(mesh, batch)
            )
            return jax.jit(step)(params, sharded)

    return run


def finalize(terms: dict) -> dict:
    return {
        "cIoU": 100.0 * float(terms["intersection"])
        / max(float(terms["union"]), 1e-12),
        "mIoU": 100.0 * float(terms["iou_sum"])
        / max(float(terms["count"]), 1.0),
        "n": int(terms["count"]),
    }
