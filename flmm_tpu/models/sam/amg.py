"""Automatic mask generation (AMG).

Behavioural spec: reference segment_anything/automatic_mask_generator.py --
prompt SAM with a regular point grid, filter by predicted IoU and stability
score, deduplicate with box NMS, return per-mask records.  The per-point
decoding batches as one jitted call per grid (vs the reference's python
chunks); NMS and RLE run on host in numpy.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from flmm_tpu.data.processors import sam_preprocess
from flmm_tpu.models.mask_head.refiner import SamRefinerConfig
from flmm_tpu.models.sam import image_encoder as sam_encoder
from flmm_tpu.models.sam import mask_decoder as sam_decoder
from flmm_tpu.models.sam import prompt_encoder as sam_prompt


def build_point_grid(n_per_side: int) -> np.ndarray:
    """Normalised [0,1] point grid (reference utils/amg.py)."""
    offset = 1 / (2 * n_per_side)
    pts = np.linspace(offset, 1 - offset, n_per_side)
    gx, gy = np.meshgrid(pts, pts)
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def stability_score(logits: np.ndarray, mask_threshold: float = 0.0,
                    offset: float = 1.0) -> np.ndarray:
    """IoU between masks at threshold +- offset (reference utils/amg.py)."""
    hi = (logits > mask_threshold + offset).reshape(logits.shape[0], -1)
    lo = (logits > mask_threshold - offset).reshape(logits.shape[0], -1)
    return hi.sum(-1) / np.maximum(lo.sum(-1), 1)


def mask_to_rle(mask: np.ndarray) -> dict:
    """Binary mask -> uncompressed column-major COCO RLE."""
    h, w = mask.shape
    flat = np.asarray(mask, np.uint8).T.reshape(-1)
    change = np.nonzero(np.diff(flat))[0] + 1
    idx = np.concatenate([[0], change, [len(flat)]])
    counts = np.diff(idx).tolist()
    if flat[0] == 1:
        counts = [0] + counts
    return {"size": [h, w], "counts": counts}


def box_nms(boxes: np.ndarray, scores: np.ndarray, thresh: float) -> list:
    """Greedy IoU NMS (torchvision.batched_nms replacement)."""
    order = np.argsort(-scores)
    keep = []
    while len(order):
        i = order[0]
        keep.append(int(i))
        if len(order) == 1:
            break
        rest = order[1:]
        xx0 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy0 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx1 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy1 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(0, xx1 - xx0) * np.maximum(0, yy1 - yy0)
        a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        b = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / np.maximum(a + b - inter, 1e-9)
        order = rest[iou <= thresh]
    return keep


def mask_box(mask: np.ndarray) -> np.ndarray:
    ys, xs = np.where(mask)
    if len(ys) == 0:
        return np.zeros(4, np.float32)
    return np.array([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1],
                    np.float32)


class AutomaticMaskGenerator:
    def __init__(
        self,
        params: dict,
        cfg: SamRefinerConfig,
        points_per_side: int = 32,
        pred_iou_thresh: float = 0.88,
        stability_score_thresh: float = 0.95,
        box_nms_thresh: float = 0.7,
    ):
        self.params = params
        self.cfg = cfg
        self.grid = build_point_grid(points_per_side)
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.box_nms_thresh = box_nms_thresh
        self._decode = None

    def _make_decode(self):
        cfg = self.cfg

        def decode(params, embed, points):
            # points: (N, 1, 2) in SAM-frame pixels; one point per prompt
            labels = jnp.ones(points.shape[:2], jnp.int32)
            sparse = sam_prompt.embed_points(
                params["prompt"], cfg.prompt, points, labels, pad=True)
            dense = sam_prompt.no_mask_dense(
                params["prompt"], cfg.prompt, points.shape[0])
            image_pe = sam_prompt.dense_pe(params["prompt"], cfg.prompt)
            masks, iou = sam_decoder.forward(
                params["decoder"], cfg.decoder, embed, image_pe, sparse,
                dense)
            return masks[:, 1:], iou[:, 1:]  # multimask slice

        return jax.jit(decode)

    def generate(self, image) -> list[dict]:
        cfg = self.cfg
        pre = sam_preprocess(image, cfg.encoder.img_size)
        nh, nw = pre["sam_input_size"]
        embed = jax.jit(
            lambda p, x: sam_encoder.forward(p, cfg.encoder, x)
        )(self.params["encoder"], jnp.asarray(pre["sam_pixel_values"])[None])[0]

        pts = self.grid * np.array([nw, nh], np.float32)
        if self._decode is None:
            self._decode = self._make_decode()
        masks, ious = self._decode(
            self.params, embed, jnp.asarray(pts[:, None, :]))
        masks = np.asarray(masks, np.float32).reshape(-1, *masks.shape[2:])
        ious = np.asarray(ious).reshape(-1)

        keep = ious > self.pred_iou_thresh
        masks, ious = masks[keep], ious[keep]
        if len(masks) == 0:
            return []
        stab = stability_score(masks)
        keep = stab > self.stability_score_thresh
        masks, ious = masks[keep], ious[keep]
        if len(masks) == 0:
            return []

        binary = masks > 0.0
        boxes = np.stack([mask_box(m) for m in binary])
        nonempty = boxes[:, 2] > boxes[:, 0]
        binary, boxes, ious = binary[nonempty], boxes[nonempty], ious[nonempty]
        if len(binary) == 0:
            return []
        keep = box_nms(boxes, ious, self.box_nms_thresh)
        out = []
        for i in keep:
            out.append({
                "segmentation": mask_to_rle(binary[i]),
                "bbox": boxes[i].tolist(),
                "predicted_iou": float(ious[i]),
                "area": int(binary[i].sum()),
            })
        return out
