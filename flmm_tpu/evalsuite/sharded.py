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
        "acc50_sum": ((iou > 0.5).astype(jnp.float32) * mv).sum(),
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

    jitted = jax.jit(step)

    def run(params, batch):
        with mesh:
            sharded = jax.device_put(
                batch, mesh_lib.batch_shardings(mesh, batch)
            )
            return jitted(params, sharded)

    return run


def finalize(terms: dict) -> dict:
    return {
        "cIoU": 100.0 * float(terms["intersection"])
        / max(float(terms["union"]), 1e-12),
        "mIoU": 100.0 * float(terms["iou_sum"])
        / max(float(terms["count"]), 1.0),
        "aAcc@0.5": 100.0 * float(terms["acc50_sum"])
        / max(float(terms["count"]), 1.0),
        "n": int(terms["count"]),
    }


def run_eval_sharded(
    samples,
    params,
    model_forward,
    spec,
    batch_size: int,
    mesh,
    batch_builder=None,
) -> dict:
    """Mesh-sharded eval loop: batches stream through one jitted program
    whose scalar metric terms XLA reduces across the data axis; the host
    only ever sees a handful of floats (the gather_object replacement,
    reference multiprocess_eval_refcoco.py:169).

    Pad samples within an incomplete final batch get ``mask_valid`` zeroed
    so they can't contribute.  Scores are computed in the SAM prompt frame
    (see module docstring); the host path is the reference-exact scorer.
    """
    from flmm_tpu.data.collate import build_batch

    build = batch_builder or build_batch
    step = make_sharded_eval_step(model_forward, mesh)
    totals: dict | None = None
    buf: list = []

    def flush():
        nonlocal totals
        if not buf:
            return
        pad = buf + [buf[-1]] * (batch_size - len(buf))
        batch = build(pad, spec)
        batch.pop("infos", None)
        if len(buf) < batch_size:  # neutralise pad duplicates
            batch["mask_valid"][len(buf):] = False
        import jax.numpy as jnp  # noqa: F811

        batch = jax.tree.map(jnp.asarray, batch)
        terms = jax.tree.map(float, step(params, batch))
        totals = (terms if totals is None else
                  {k: totals[k] + terms[k] for k in terms})
        buf.clear()

    for s in samples:
        buf.append(s)
        if len(buf) == batch_size:
            flush()
    flush()
    return finalize(totals) if totals else {}
