"""SamPredictor + AutomaticMaskGenerator smoke/behaviour tests."""

import pytest
import numpy as np
import jax
from PIL import Image

from flmm_tpu.configs.deepseek_vl import tiny
from flmm_tpu.models.sam import amg as amg_mod
from flmm_tpu.models.sam import image_encoder as sam_encoder
from flmm_tpu.models.sam import mask_decoder as smd
from flmm_tpu.models.sam import prompt_encoder as spe
from flmm_tpu.models.sam.predictor import SamPredictor


def _tiny_sam_params():
    cfg = tiny().sam
    return {
        "encoder": sam_encoder.init_params(cfg.encoder, jax.random.key(0)),
        "prompt": spe.init_params(cfg.prompt, jax.random.key(1)),
        "decoder": smd.init_params(cfg.decoder, jax.random.key(2)),
    }, cfg


def _image():
    rng = np.random.default_rng(0)
    return Image.fromarray(rng.integers(0, 255, (50, 70, 3), np.uint8), "RGB")


def test_predictor_point_box_mask_prompts():
    params, cfg = _tiny_sam_params()
    pred = SamPredictor(params, cfg)
    pred.set_image(_image())
    masks, iou, low = pred.predict(
        point_coords=np.array([[30, 25]]), point_labels=np.array([1]),
        multimask_output=True)
    assert masks.shape == (3, 50, 70) and masks.dtype == bool
    assert low.shape == (3, cfg.prompt_size, cfg.prompt_size)
    m2, i2, _ = pred.predict(box=np.array([5, 5, 60, 40]),
                             multimask_output=False)
    assert m2.shape == (1, 50, 70)
    m3, _, _ = pred.predict(
        box=np.array([5, 5, 60, 40]), mask_input=low[:1],
        multimask_output=False)
    assert m3.shape == (1, 50, 70)


def test_amg_utils():
    grid = amg_mod.build_point_grid(4)
    assert grid.shape == (16, 2)
    assert 0 < grid.min() and grid.max() < 1

    mask = np.zeros((6, 8), bool)
    mask[2:5, 3:7] = True
    rle = amg_mod.mask_to_rle(mask)
    from flmm_tpu.data.refcoco import rle_to_mask

    np.testing.assert_array_equal(rle_to_mask(rle), mask.astype(np.uint8))

    boxes = np.array([[0, 0, 10, 10], [1, 1, 10, 10], [20, 20, 30, 30]],
                     np.float32)
    keep = amg_mod.box_nms(boxes, np.array([0.9, 0.8, 0.7]), 0.5)
    assert keep == [0, 2]


def test_amg_generate_smoke():
    params, cfg = _tiny_sam_params()
    g = amg_mod.AutomaticMaskGenerator(
        params, cfg, points_per_side=4, pred_iou_thresh=-10.0,
        stability_score_thresh=0.0)
    out = g.generate(_image())
    assert isinstance(out, list)
    for rec in out:
        assert set(rec) >= {"segmentation", "bbox", "predicted_iou", "area"}


def test_export_roundtrip(tmp_path):
    from flmm_tpu.convert.export import export_fn, load_fn, export_sam_decoder

    def f(x, y):
        return x @ y + 1.0

    ex = (np.ones((4, 8), np.float32), np.ones((8, 4), np.float32))
    export_fn(f, ex, tmp_path / "f.shlo")
    g = load_fn(tmp_path / "f.shlo")
    np.testing.assert_allclose(np.asarray(g(*ex)), f(*ex))

    params, cfg = _tiny_sam_params()
    export_sam_decoder({"prompt": params["prompt"],
                        "decoder": params["decoder"]}, cfg,
                       tmp_path / "sam_dec.shlo", max_text=4)
    dec = load_fn(tmp_path / "sam_dec.shlo")
    import jax.numpy as jnp
    s = cfg.prompt.image_embedding_size
    d = cfg.prompt.embed_dim
    masks, iou = dec(
        {"prompt": params["prompt"], "decoder": params["decoder"]},
        jnp.zeros((s, s, d), jnp.float32),
        jnp.zeros((1, 4), jnp.float32),
        jnp.zeros((1, cfg.prompt_size, cfg.prompt_size), jnp.float32),
        jnp.zeros((1, 4, d), jnp.float32),
        jnp.zeros((1, 4), bool))
    assert np.isfinite(np.asarray(masks)).all()

# heavy (jit compiles / torch oracles) -- excluded from the fast path
# (pytest -m "not slow"; see README Testing strategy)
pytestmark = pytest.mark.slow
