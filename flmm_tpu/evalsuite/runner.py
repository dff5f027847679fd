"""Batched eval runner: static-shape device inference + host-side scoring.

Replaces the reference's accelerate loops (multiprocess_eval_{refcoco,png})
with: samples -> static batches -> one jitted predict per bucket -> final
per-sample resize/threshold/IoU at original resolution on host.  On a mesh,
batches shard over 'data' and every chip scores its shard; accumulators
merge at the end (the ``gather_object`` replacement).
"""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np
from PIL import Image

from flmm_tpu.data.collate import BatchSpec, build_batch
from flmm_tpu.evalsuite.metrics import PNGAccumulator, RefSegAccumulator


def resize_prob_map(prob: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Bilinear float-map resize via PIL (host, arbitrary output size)."""
    img = Image.fromarray(prob.astype(np.float32), mode="F")
    return np.asarray(img.resize((out_hw[1], out_hw[0]), Image.BILINEAR))


def sam_logits_to_masks(
    low_res_logits: np.ndarray,
    sam_hw: tuple[int, int],
    orig_hw: tuple[int, int],
    sam_size: int = 1024,
    prompt_size: int = 256,
) -> np.ndarray:
    """(M, P, P) SAM-frame logits -> (M, oh, ow) binary masks.

    Mirrors reference postprocess + eval thresholding
    (sam.py:137-166, multiprocess_eval_refcoco.py:136-138): sigmoid, crop
    the valid SAM region, upscale to original size, threshold 0.5.
    """
    nh, nw = sam_hw
    rh = max(1, int(round(nh * prompt_size / sam_size)))
    rw = max(1, int(round(nw * prompt_size / sam_size)))
    probs = 1.0 / (1.0 + np.exp(-low_res_logits.astype(np.float32)))
    out = np.stack([
        resize_prob_map(p[:rh, :rw], orig_hw) for p in probs
    ])
    return (out > 0.5).astype(np.uint8)


def run_eval(
    samples: Iterable[dict],
    predict_fn: Callable,
    spec: BatchSpec,
    batch_size: int,
    accumulator_factory: Callable,
    score_fn: Callable,
    progress: Callable | None = None,
    seq_len_buckets: tuple | None = None,
    batch_builder: Callable | None = None,
):
    """Generic eval loop.

    Args:
      predict_fn: jitted ``batch -> (B, M, P, P) low-res SAM logits``
        (numpy-convertible).
      score_fn: ``(acc, sample, pred_masks_orig (K,oh,ow)) -> None``.
      seq_len_buckets: optional ascending sequence-length buckets; each
        batch pads only to the smallest bucket that fits its longest
        sample (one compiled program per bucket) instead of the global
        ``spec.seq_len``.
      batch_builder: family batch builder (defaults to the standard
        ``collate.build_batch``).
    """
    import dataclasses

    build = batch_builder or build_batch
    acc = accumulator_factory()
    buf = []

    def flush():
        if not buf:
            return
        pad = buf + [buf[-1]] * (batch_size - len(buf))
        bspec = spec
        if seq_len_buckets:
            need = max(len(s["input_ids"]) for s in pad)
            fits = [b for b in sorted(seq_len_buckets) if b >= need]
            bspec = dataclasses.replace(
                spec, seq_len=fits[0] if fits else max(seq_len_buckets))
        batch = build(pad, bspec)
        infos = batch.pop("infos")
        logits = np.asarray(predict_fn(batch))
        geom = batch["geom"]
        for i, sample in enumerate(buf):
            k = infos[i]["num_masks"]
            masks = sam_logits_to_masks(
                logits[i, :k],
                (int(geom["sam_h"][i]), int(geom["sam_w"][i])),
                tuple(infos[i]["orig_size"]),
                sam_size=spec.sam_size,
                prompt_size=spec.prompt_size,
            )
            score_fn(acc, sample, masks)
            if progress:
                progress()
        buf.clear()

    for s in samples:
        buf.append(s)
        if len(buf) == batch_size:
            flush()
    flush()
    return acc


def refcoco_score(acc: RefSegAccumulator, sample: dict, pred_masks) -> None:
    for pred, gt in zip(pred_masks, sample["masks"]):
        acc.add(pred, gt)


def png_score(acc: PNGAccumulator, sample: dict, pred_masks) -> None:
    for pred, gt, info in zip(pred_masks, sample["masks"],
                              sample["mask_infos"]):
        acc.add(pred, gt, info)
