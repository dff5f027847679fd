"""LLaVA family path through the generic grounding core."""

import numpy as np
import jax
import jax.numpy as jnp

from flmm_tpu.configs.llava import tiny_llava
from flmm_tpu.data.synthetic import synthetic_batch
from flmm_tpu.models.frozen import grounding as model


def test_llava_tiny_forward_and_grads():
    cfg = tiny_llava()
    params = model.init_params(cfg, jax.random.key(0))
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg, batch_size=2))

    def loss(trainable):
        p = {"frozen": params["frozen"], "trainable": trainable}
        return model.loss_fn(p, cfg, batch)[0]

    val, grads = jax.jit(jax.value_and_grad(loss))(params["trainable"])
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))


def test_hpt_tiny_pos_embed_interpolation_path():
    from flmm_tpu.configs.hpt import tiny_hpt

    cfg = tiny_hpt()
    params = model.init_params(cfg, jax.random.key(0))
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg, batch_size=2))
    assert batch["pixel_values"].shape[1] == 64  # enlarged input
    out = model.forward(params, cfg, batch)
    assert np.isfinite(np.asarray(out["sam_logits"])).all()
