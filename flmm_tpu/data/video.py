"""Video frame sampling/processing (MGM's video path).

Behavioural spec: reference mgm/model/processor/video_processor.py
(VideoFramesProcessor): sample N frames uniformly from a video (or an
image-sequence directory), preprocess each like a still image, stack on a
frame axis.  Decord/opencv are not part of this image; frames come from a
directory of images or a caller-provided reader.
"""

from __future__ import annotations

import pathlib
from typing import Callable, Sequence

import numpy as np
from PIL import Image


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
