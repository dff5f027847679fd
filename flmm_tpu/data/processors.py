"""Host-side image processors (numpy/PIL) producing NHWC tensors + metas.

Replaces the reference's HF-processor forks with small pure functions:

* ``square_pad_preprocess``: aspect-preserving resize of the long edge to
  the target size, centred square pad with the mean colour, rescale +
  normalise.  Covers CustomLlavaImageProcessor (flmm/datasets/
  llava_processors.py:57-66,195-213) and DeepSeek's VLMImageProcessor
  (deepseek_vl/models/image_processing_vlm.py:141-176) via ``size_rule``.
* ``sam_preprocess``: ResizeLongestSide to the SAM input size, normalise
  with the SAM pixel stats, corner pad (segment_anything/modeling/
  sam.py:168-178, utils/transforms.py:16).
"""

from __future__ import annotations

import dataclasses

import numpy as np
from PIL import Image

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
SAM_MEAN = (123.675, 116.28, 103.53)
SAM_STD = (58.395, 57.12, 57.375)


@dataclasses.dataclass(frozen=True)
class ProcessorConfig:
    size: int = 384
    mean: tuple = CLIP_MEAN
    std: tuple = CLIP_STD
    # 'deepseek': floor(h/max*size) with min clamp; 'llava': int(w*size/h)
    size_rule: str = "deepseek"
    min_size: int = 14
    resample: int = Image.BICUBIC


def _target_hw(cfg: ProcessorConfig, w: int, h: int) -> tuple[int, int]:
    if cfg.size_rule == "deepseek":
        m = max(w, h)
        return (
            max(int(h / m * cfg.size), cfg.min_size),
            max(int(w / m * cfg.size), cfg.min_size),
        )
    if cfg.size_rule == "llava":
        if h > w:
            return cfg.size, int(w * cfg.size / h)
        return int(h * cfg.size / w), cfg.size
    if cfg.size_rule == "hpt15":
        # reference hpt_processors.py:138-150: scale by the smaller of the
        # (target/current) ratios so the result fits the target box, with
        # int() truncation on the free dim; the subsequent pad (to
        # max(h, w), centred, mean colour) coincides with the square pad
        # below for square targets
        if cfg.size / h < cfg.size / w:
            return cfg.size, int(w * cfg.size / h)
        return int(h * cfg.size / w), cfg.size
    raise ValueError(cfg.size_rule)


def square_pad_preprocess(image: Image.Image, cfg: ProcessorConfig) -> dict:
    """PIL image -> normalised (size, size, 3) f32 + padding meta."""
    image = image.convert("RGB")
    w, h = image.size
    th, tw = _target_hw(cfg, w, h)
    resized = image.resize((tw, th), cfg.resample)
    bg = tuple(int(x * 255) for x in cfg.mean)
    canvas = Image.new("RGB", (cfg.size, cfg.size), bg)
    pad_h, pad_w = cfg.size - th, cfg.size - tw
    before_h, before_w = pad_h // 2, pad_w // 2
    canvas.paste(resized, (before_w, before_h))
    arr = np.asarray(canvas, np.float32) / 255.0
    arr = (arr - np.asarray(cfg.mean, np.float32)) / np.asarray(cfg.std, np.float32)
    meta = {
        "padding": {
            "before_height": before_h, "after_height": pad_h - before_h,
            "before_width": before_w, "after_width": pad_w - before_w,
        },
        "image_shape": {"height": th, "width": tw},
        "padded_shape": {"height": cfg.size, "width": cfg.size},
    }
    return {"pixel_values": arr, "meta": meta,
            "image_size": (h, w)}


def sam_preprocess(image: Image.Image, long_side: int = 1024) -> dict:
    """PIL image -> SAM-normalised corner-padded (long, long, 3) f32."""
    image = image.convert("RGB")
    w, h = image.size
    scale = long_side / max(h, w)
    nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
    resized = image.resize((nw, nh), Image.BILINEAR)
    arr = np.asarray(resized, np.float32)
    arr = (arr - np.asarray(SAM_MEAN, np.float32)) / np.asarray(SAM_STD, np.float32)
    out = np.zeros((long_side, long_side, 3), np.float32)
    out[:nh, :nw] = arr
    return {"sam_pixel_values": out, "sam_input_size": (nh, nw)}
