"""MGM data processing: square pad, dual-resolution crops, aux tensors.

Behavioural spec: reference flmm/datasets/pad2square_processor.py (PIL
square pad with the CLIP mean colour) + frozen_mgm.py:_process_image
(aux tensor at ``image_size_aux``, main tensor derived by bilinear resize
to ``grid*336`` and sliced into grid crops + a global image appended last).
"""

from __future__ import annotations

import dataclasses

import numpy as np
from PIL import Image

from flmm_tpu.data import geometry
from flmm_tpu.data.collate import BatchSpec, embed_gt_coarse, embed_gt_sam
from flmm_tpu.data.processors import CLIP_MEAN, CLIP_STD, sam_preprocess


@dataclasses.dataclass(frozen=True)
class MGMProcessSpec:
    crop_size: int = 336
    aux_size: int = 768
    image_grid: int = 1
    image_global: bool = False
    mean: tuple = CLIP_MEAN
    std: tuple = CLIP_STD

    @property
    def num_crops(self) -> int:
        return self.image_grid ** 2 + (1 if self.image_global else 0)


def _normalize(img: Image.Image, spec: MGMProcessSpec) -> np.ndarray:
    arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
    return (arr - np.asarray(spec.mean, np.float32)) / np.asarray(
        spec.std, np.float32
    )


def pad2square(image: Image.Image, mean: tuple) -> tuple[Image.Image, dict]:
    """PIL centred square pad with mean colour (reference Pad2Square:7)."""
    image = image.convert("RGB")
    w, h = image.size
    size = max(w, h)
    bg = tuple(int(x * 255) for x in mean)
    canvas = Image.new("RGB", (size, size), bg)
    before_w, before_h = (size - w) // 2, (size - h) // 2
    canvas.paste(image, (before_w, before_h))
    meta = {
        "padding": {
            "before_height": before_h, "after_height": size - h - before_h,
            "before_width": before_w, "after_width": size - w - before_w,
        },
        "image_shape": {"height": h, "width": w},
        "padded_shape": {"height": size, "width": size},
    }
    return canvas, meta


def mgm_process(image: Image.Image, spec: MGMProcessSpec) -> dict:
    square, meta = pad2square(image, spec.mean)
    aux = _normalize(square.resize((spec.aux_size, spec.aux_size),
                                   Image.BICUBIC), spec)
    g, cs = spec.image_grid, spec.crop_size
    main = _normalize(square.resize((cs * g, cs * g), Image.BICUBIC), spec)
    crops = [
        main[r * cs:(r + 1) * cs, c * cs:(c + 1) * cs]
        for r in range(g) for c in range(g)
    ]
    if spec.image_global:
        crops.append(_normalize(square.resize((cs, cs), Image.BICUBIC), spec))
    return {"crops": np.stack(crops), "aux": aux, "meta": meta}


def build_mgm_batch(samples: list[dict], spec: BatchSpec,
                    mgm: MGMProcessSpec) -> dict:
    B = len(samples)
    S, M, T = spec.seq_len, spec.max_masks, spec.text_per_mask
    P = spec.prompt_size
    Hc, Wc = spec.coarse_hw
    cs = mgm.crop_size

    out = {
        "input_ids": np.full((B, S), spec.pad_token_id, np.int32),
        "attn_mask": np.zeros((B, S), bool),
        "mask_ids": np.full((B, S), -1, np.int32),
        "mask_valid": np.zeros((B, M), bool),
        "text_idx": np.zeros((B, M, T), np.int32),
        "text_valid": np.zeros((B, M, T), bool),
        "pixel_values": np.zeros((B, mgm.num_crops, cs, cs, 3), np.float32),
        "aux_pixel_values": np.zeros((B, mgm.aux_size, mgm.aux_size, 3),
                                     np.float32),
        "sam_pixel_values": np.zeros((B, spec.sam_size, spec.sam_size, 3),
                                     np.float32),
        "gt_coarse": np.zeros((B, M, Hc, Wc), np.float32),
        "coarse_weight": np.zeros((B, Hc, Wc), np.float32),
        "gt_sam": np.zeros((B, M, P, P), np.float32),
        "sam_weight": np.zeros((B, P, P), np.float32),
    }
    metas, sam_hws, infos = [], [], []
    for b, s in enumerate(samples):
        if spec.expected_img_start is not None and "img_start" in s:
            assert s["img_start"] == spec.expected_img_start, (
                f"sample img_start {s['img_start']} != config img_start "
                f"{spec.expected_img_start}; prompt template/tokenizer "
                "drifted from the model config")
        ids = s["input_ids"][:S]
        n = len(ids)
        out["input_ids"][b, :n] = ids
        out["attn_mask"][b, :n] = True
        mids = s["mask_ids"][:S]
        out["mask_ids"][b, :len(mids)] = np.where(mids >= M, -1, mids)

        proc = mgm_process(s["image"], mgm)
        sam = sam_preprocess(s["image"], spec.sam_size)
        out["pixel_values"][b] = proc["crops"]
        out["aux_pixel_values"][b] = proc["aux"]
        out["sam_pixel_values"][b] = sam["sam_pixel_values"]
        meta = proc["meta"]
        metas.append(meta)
        sam_hws.append(sam["sam_input_size"])
        out["coarse_weight"][b] = geometry.coarse_weight(meta, (Hc, Wc))
        out["sam_weight"][b] = geometry.sam_weight(
            sam["sam_input_size"], frame=P, long_side=spec.sam_size)

        for m, (mask, span) in enumerate(zip(s["masks"][:M],
                                             s["spans"][:M])):
            lo, hi = span
            hi = min(hi, n)
            if hi <= lo:
                continue
            out["mask_valid"][b, m] = True
            k = min(hi - lo, T)
            out["text_idx"][b, m, :k] = np.arange(lo, lo + k)
            out["text_valid"][b, m, :k] = True
            out["gt_coarse"][b, m] = embed_gt_coarse(mask, meta, (Hc, Wc))
            out["gt_sam"][b, m] = embed_gt_sam(mask, sam["sam_input_size"],
                                               P, spec.sam_size)
        infos.append({
            "file_name": s.get("file_name"),
            "orig_size": s["masks"].shape[-2:],
            "num_masks": int(out["mask_valid"][b].sum()),
            "mask_infos": s.get("mask_infos"),
        })
    out["geom"] = geometry.batch_geom(metas, (Hc, Wc), sam_hws)
    out["infos"] = infos
    return out
