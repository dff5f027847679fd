"""MGM video-path parity (VERDICT r4 item 7).

The reference ``VideoFramesProcessor`` (mgm/model/processor/
video_processor.py:11-110) is importable directly (transformers + torch
only), so the numpy-tensor path is pinned EXACTLY, then the processed
frames run end-to-end through the tiny MGM twin.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import REFERENCE, reference_available

from flmm_tpu.data.video import (
    load_frames_from_dir, preprocess_video_frames, process_video,
    sample_indices,
)


def test_sample_indices_uniform():
    assert sample_indices(4, 8) == [0, 1, 2, 3]
    idx = sample_indices(100, 8)
    assert len(idx) == 8 and idx[0] == 0 and idx[-1] == 99
    assert all(b > a for a, b in zip(idx, idx[1:]))


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_video_tensor_path_parity_vs_reference():
    """preprocess_video_frames vs the reference VideoFramesProcessor's
    numpy branch: same resize/crop/rescale/normalize pipeline, same
    op ORDER (f32 cast before the bicubic), elementwise."""
    # the reference mgm package __init__ imports its full torch model
    # stack (transformers.deepspeed, unavailable); load the processor
    # module file directly
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_video_processor",
        REFERENCE / "mgm/model/processor/video_processor.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    VideoFramesProcessor = mod.VideoFramesProcessor

    proc = VideoFramesProcessor(
        size={"shortest_edge": 96}, crop_size={"height": 96, "width": 96},
        do_resize=True, do_center_crop=True, do_rescale=True,
        do_normalize=True)
    rng = np.random.default_rng(0)
    for shape in ((3, 120, 160, 3), (2, 200, 110, 3), (1, 96, 96, 3)):
        frames = rng.integers(0, 255, shape).astype(np.uint8)
        want = proc.preprocess(frames.astype(np.float64))["pixel_values"]
        got = preprocess_video_frames(frames, shortest_edge=96,
                                      crop_size=96)
        np.testing.assert_allclose(got, np.asarray(want), atol=2e-4,
                                   err_msg=str(shape))


def test_video_frames_through_mgm_twin(tmp_path):
    """e2e: a frame directory -> uniform sampling -> tensor-path
    preprocessing -> the tiny MGM twin's forward/loss (frames ride the
    batch axis as the reference's video path feeds per-frame towers)."""
    from PIL import Image

    from flmm_tpu.configs.mgm import tiny_mgm
    from flmm_tpu.data.collate import BatchSpec
    from flmm_tpu.data.processors import ProcessorConfig
    from flmm_tpu.data.synthetic import synthetic_samples
    from flmm_tpu.models.frozen import mgm as model
    from flmm_tpu.registry import get_batch_builder, get_coarse_hw

    rng = np.random.default_rng(1)
    for i in range(6):
        Image.fromarray(
            rng.integers(0, 255, (60, 80, 3), np.uint8), "RGB"
        ).save(tmp_path / f"frame_{i:03d}.jpg")
    frames = load_frames_from_dir(str(tmp_path), n_frames=2)
    assert len(frames) == 2

    cfg = tiny_mgm()
    cs = cfg.base.vision.image_size
    px = preprocess_video_frames(
        np.stack([np.asarray(f) for f in frames]),
        shortest_edge=cs, crop_size=cs)          # (T, 3, cs, cs)
    T = px.shape[0]

    samples = synthetic_samples(cfg, T, seed=2)
    build = get_batch_builder(
        "mgm", crop_size=cs, aux_size=cfg.aux.image_size,
        image_grid=cfg.image_grid, image_global=cfg.image_global)
    spec = BatchSpec(
        seq_len=max(len(s["input_ids"]) for s in samples) + 8,
        max_masks=2, text_per_mask=8, coarse_hw=get_coarse_hw(cfg),
        sam_size=cfg.base.sam.encoder.img_size,
        prompt_size=cfg.base.sam.prompt_size,
        expected_img_start=cfg.base.img_start,
        processor=ProcessorConfig(size=cfg.base.input_size))
    batch = build(samples, spec)
    batch.pop("infos", None)
    # the video frames replace the per-sample crops (grid=1 twin)
    assert batch["pixel_values"].shape[:2] == (T, 1)
    batch["pixel_values"] = px.transpose(0, 2, 3, 1)[:, None]
    params = model.init_params(cfg, jax.random.key(0))
    loss, _metrics = model.loss_fn(
        params, cfg, jax.tree.map(jnp.asarray, batch))
    assert np.isfinite(float(loss))

# heavy (jit compiles / torch oracles) -- excluded from the fast path
# (pytest -m "not slow"; see README Testing strategy)
pytestmark = pytest.mark.slow
