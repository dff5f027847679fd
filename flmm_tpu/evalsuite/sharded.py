"""Mesh-sharded evaluation.

The reference gathers every prediction to rank 0 and scores in Python
(accelerate ``gather_object``, multiprocess_eval_refcoco.py:169).  Here:

* :func:`run_eval_sharded` -- the metric-EXACT path: the model forward
  runs data-sharded over the mesh, the (small) low-res SAM logits come
  back to host, and scoring reuses evalsuite.runner's reference-exact
  per-sample pipeline at ORIGINAL GT resolution -- so sharded results ==
  host-path results on the same data, for both the RefCOCO and PNG
  accumulators (per-split thing/stuff/plural metrics included).
* :func:`make_sharded_eval_step` / :func:`batch_iou_terms` -- a
  device-only scalar-reduce variant scoring in the fixed SAM prompt
  frame (resolution-bounded approximation); kept for bandwidth-
  constrained multi-host deployments where even logits should not be
  gathered, and documented as approximate.
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


def make_sharded_predict(model_forward, params, mesh):
    """``batch -> (B, M, P, P) numpy logits`` with the forward jitted
    over data-sharded batch inputs.  Drop-in for evalsuite.runner's
    ``predict_fn``, so the sharded eval reuses the exact host scorer."""
    import numpy as np

    jitted = jax.jit(lambda p, b: model_forward(p, b)["sam_logits"])

    def predict_np(batch):
        batch = {k: v for k, v in batch.items() if k != "infos"}
        batch = jax.tree.map(jnp.asarray, batch)
        with mesh:
            sharded = jax.device_put(
                batch, mesh_lib.batch_shardings(mesh, batch))
            return np.asarray(jitted(params, sharded))

    return predict_np


def run_eval_sharded(
    samples,
    params,
    model_forward,
    spec,
    batch_size: int,
    mesh,
    batch_builder=None,
    accumulator_factory=None,
    score_fn=None,
) -> dict:
    """Mesh-sharded eval loop, metric-exact: the forward is data-sharded
    over the mesh (the heavy part -- SAM encoder, decoder, heads), the
    low-res logits return to host, and scoring runs the reference-exact
    per-sample pipeline at original GT resolution (runner.run_eval), so
    results match the host path on the same data (reference
    multiprocess_eval_refcoco.py:136-175).  Defaults to the RefCOCO
    accumulator; pass ``PNGAccumulator``/``png_score`` for PNG (keeps
    the per-split thing/stuff/plural metrics,
    multiprocess_eval_png.py:160-177)."""
    from flmm_tpu.evalsuite.runner import (
        RefSegAccumulator, refcoco_score, run_eval,
    )

    acc = run_eval(
        samples,
        make_sharded_predict(model_forward, params, mesh),
        spec,
        batch_size,
        accumulator_factory or RefSegAccumulator,
        score_fn or refcoco_score,
        batch_builder=batch_builder,
    )
    return acc.results()
