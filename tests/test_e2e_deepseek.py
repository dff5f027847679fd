"""End-to-end smoke + training-step tests on the tiny DeepSeek-VL config."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flmm_tpu.configs.deepseek_vl import tiny
from flmm_tpu.data.synthetic import synthetic_batch
from flmm_tpu.models.frozen import deepseek_vl as model


@pytest.fixture(scope="module")
def setup():
    cfg = tiny()
    params = model.init_params(cfg, jax.random.key(0))
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg, batch_size=2))
    return cfg, params, batch


def test_forward_shapes(setup):
    cfg, params, batch = setup
    out = jax.jit(lambda p, b: model.forward(p, cfg, b))(params, batch)
    B, M = batch["mask_valid"].shape
    assert out["coarse_logits"].shape == (B, M, 16, 16)
    assert out["sam_logits"].shape == (B, M, 32, 32)
    assert np.isfinite(np.asarray(out["coarse_logits"])).all()
    assert np.isfinite(np.asarray(out["sam_logits"])).all()


def test_loss_and_grads_flow_only_to_trainable(setup):
    cfg, params, batch = setup

    def loss(trainable):
        p = {"frozen": params["frozen"], "trainable": trainable}
        return model.loss_fn(p, cfg, batch)[0]

    val, grads = jax.jit(jax.value_and_grad(loss))(params["trainable"])
    assert np.isfinite(float(val))
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # every trainable component must receive some gradient
    norms = {
        "unet": sum(float(jnp.abs(g).sum()) for g in
                    jax.tree.leaves(grads["unet"])),
        "text_proj": sum(float(jnp.abs(g).sum()) for g in
                         jax.tree.leaves(grads["text_proj"])),
        "layer_w": float(jnp.abs(grads["text_layer_weights"]).sum()),
        "sam_prompt": sum(float(jnp.abs(g).sum()) for g in
                          jax.tree.leaves(grads["sam"]["prompt"])),
        "sam_decoder": sum(float(jnp.abs(g).sum()) for g in
                           jax.tree.leaves(grads["sam"]["decoder"])),
    }
    for name, n in norms.items():
        assert n > 0, f"no gradient reached {name}"


def test_invalid_masks_do_not_affect_loss(setup):
    """Adding a padded (invalid) mask slot must leave the loss unchanged."""
    cfg, params, batch = setup
    loss_a = float(model.loss_fn(params, cfg, batch)[0])
    # corrupt GT in invalid mask slots; loss must not move
    mv = np.asarray(batch["mask_valid"])
    gt = np.asarray(batch["gt_coarse"]).copy()
    gts = np.asarray(batch["gt_sam"]).copy()
    inv = ~mv
    gt[inv] = 1.0
    gts[inv] = 1.0
    b2 = dict(batch)
    b2["gt_coarse"] = jnp.asarray(gt)
    b2["gt_sam"] = jnp.asarray(gts)
    loss_b = float(model.loss_fn(params, cfg, b2)[0])
    assert abs(loss_a - loss_b) < 1e-5


def test_metrics_keys_match_reference(setup):
    cfg, params, batch = setup
    _, metrics = model.loss_fn(params, cfg, batch)
    for k in ("loss_mask", "loss_dice", "accuracy", "aiou",
              "sam_loss_mask", "sam_loss_dice", "sam_accuracy", "sam_aiou"):
        assert k in metrics


def test_hybrid_tower_forward():
    from flmm_tpu.configs.deepseek_vl import tiny_hybrid
    from flmm_tpu.data.synthetic import synthetic_batch

    cfg = tiny_hybrid()
    params = model.init_params(cfg, jax.random.key(0))
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg, batch_size=2))
    assert "hires_pixel_values" in batch
    out = model.forward(params, cfg, batch)
    assert np.isfinite(np.asarray(out["sam_logits"])).all()

# heavy (jit compiles / torch oracles) -- excluded from the fast path
# (pytest -m "not slow"; see README Testing strategy)
pytestmark = pytest.mark.slow
