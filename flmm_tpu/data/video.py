"""Video frame sampling/processing (MGM's video path).

Behavioural spec: reference mgm/model/processor/video_processor.py
(VideoFramesProcessor:11-110): still images defer to the underlying CLIP
processor; a stacked numpy ``(T, H, W, C)`` frame array takes the TENSOR
path -- ONE bicubic shortest-edge resize of the whole stack, center crop
to ``crop_size``, rescale 1/255, mean/std normalise.
:func:`preprocess_video_frames` reproduces that tensor path exactly
(pinned against the directly-imported reference class in
tests/test_data.py), including the reference's crop-axis convention
(its ``center_crop`` names ``shape[1:3]`` width/height but crops dim 1
by ``crop_width`` -- identical for the square CLIP crops every shipped
config uses).

Frame IO: decord/opencv are not part of this image; frames come from a
directory of images or a caller-provided reader.
"""

from __future__ import annotations

import pathlib
from typing import Callable, Sequence

import numpy as np
from PIL import Image

# CLIP-L/336 defaults (the tower every shipped MGM config pairs with the
# video path; reference mgm/model/multimodal_encoder/builder.py)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def _resize_output_size(h: int, w: int, shortest_edge: int) -> tuple:
    """HF ``get_resize_output_image_size(default_to_square=False)``."""
    short, long = (h, w) if h <= w else (w, h)
    new_short = shortest_edge
    new_long = int(shortest_edge * long / short)
    return (new_short, new_long) if h <= w else (new_long, new_short)


def preprocess_video_frames(
    frames: np.ndarray,
    shortest_edge: int = 336,
    crop_size: int = 336,
    rescale_factor: float = 1.0 / 255.0,
    mean: Sequence[float] = CLIP_MEAN,
    std: Sequence[float] = CLIP_STD,
    do_resize: bool = True,
    do_center_crop: bool = True,
    do_rescale: bool = True,
    do_normalize: bool = True,
) -> np.ndarray:
    """Reference VideoFramesProcessor.preprocess numpy-tensor path.

    Args:
      frames: ``(T, H, W, 3)`` raw frames (any numeric dtype; the
        reference casts to f32 BEFORE resizing, so rescale happens after
        the bicubic -- order matters and is reproduced here).

    Returns ``(T, 3, crop, crop)`` f32, the reference's output layout.
    """
    import jax.numpy as jnp

    from flmm_tpu.ops.resize import resize_bicubic

    x = np.asarray(frames, np.float32)
    assert x.ndim == 4 and x.shape[-1] == 3, x.shape
    if do_resize:
        oh, ow = _resize_output_size(x.shape[1], x.shape[2], shortest_edge)
        # torch F.interpolate(mode='bicubic') == ops.resize.resize_bicubic
        x = np.asarray(resize_bicubic(
            jnp.asarray(x.transpose(0, 3, 1, 2)), (oh, ow))).transpose(
            0, 2, 3, 1)
    if do_center_crop:
        # reference center_crop crops dim 1 by crop_width and dim 2 by
        # crop_height (video_processor.py:40-46); square crops make the
        # name swap irrelevant but the convention is kept exactly
        cy = (x.shape[1] - crop_size) // 2
        cx = (x.shape[2] - crop_size) // 2
        x = x[:, cy:cy + crop_size, cx:cx + crop_size]
    if do_rescale:
        x = x * rescale_factor
    if do_normalize:
        x = (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    return x.transpose(0, 3, 1, 2)


def sample_indices(n_total: int, n_frames: int) -> list[int]:
    """Uniform temporal sampling (reference video_processor behaviour)."""
    if n_total <= n_frames:
        return list(range(n_total))
    pos = np.linspace(0, n_total - 1, n_frames)
    return [int(round(p)) for p in pos]


def load_frames_from_dir(path: str, n_frames: int = 8) -> list[Image.Image]:
    files = sorted(
        p for p in pathlib.Path(path).iterdir()
        if p.suffix.lower() in (".jpg", ".jpeg", ".png", ".bmp", ".webp")
    )
    idx = sample_indices(len(files), n_frames)
    return [Image.open(files[i]).convert("RGB") for i in idx]


def process_video(
    frames: Sequence[Image.Image],
    preprocess: Callable[[Image.Image], dict],
    n_frames: int = 8,
) -> dict:
    """Sample + preprocess frames -> stacked (T, H, W, 3) pixel values."""
    idx = sample_indices(len(frames), n_frames)
    outs = [preprocess(frames[i]) for i in idx]
    return {
        "pixel_values": np.stack([o["pixel_values"] for o in outs]),
        "metas": [o.get("meta") for o in outs],
        "frame_indices": idx,
    }
