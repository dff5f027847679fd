"""LLaVA family path through the generic grounding core."""

import pytest
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


def test_llava_frozen_released_key_layout(tmp_path):
    """The RELEASED llava-hf checkpoint layout nests the head as
    ``language_model.lm_head.weight`` beside ``language_model.model.*``
    (transformers<=4.51); newer exports put it at top level.  The tiny
    HF-integration test only exercises the newer layout, so pin the
    released one: lm_head must survive llm_with_head's prefix strip."""
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModel, \
        LlamaConfig, LlamaForCausalLM

    from flmm_tpu.configs.llava import tiny_llava
    from flmm_tpu.convert import load as load_mod
    from flmm_tpu.models.llm import decoder as llm_mod

    cfg = tiny_llava()
    d, v = cfg.llm, cfg.vision
    torch.manual_seed(1)
    lm = LlamaForCausalLM(LlamaConfig(
        vocab_size=d.vocab_size, hidden_size=d.hidden_size,
        num_hidden_layers=d.num_layers, num_attention_heads=d.num_heads,
        num_key_value_heads=d.num_kv_heads, head_dim=d.head_dim,
        intermediate_size=d.intermediate_size, rms_norm_eps=d.rms_eps,
        attn_implementation="eager", tie_word_embeddings=False)).eval()
    clip = CLIPVisionModel(CLIPVisionConfig(
        hidden_size=v.hidden_size, intermediate_size=v.mlp_dim,
        num_hidden_layers=v.num_layers, num_attention_heads=v.num_heads,
        image_size=v.image_size, patch_size=v.patch_size,
        layer_norm_eps=v.ln_eps, hidden_act="quick_gelu")).eval()
    lin1 = torch.nn.Linear(v.hidden_size, d.hidden_size)
    lin2 = torch.nn.Linear(d.hidden_size, d.hidden_size)
    sd = {}
    for k, t in lm.state_dict().items():
        # released layout: EVERYTHING (incl. lm_head) under language_model.
        sd["language_model." + k] = t
    for k, t in clip.state_dict().items():
        sd["vision_tower." + k] = t
    sd["multi_modal_projector.linear_1.weight"] = lin1.weight
    sd["multi_modal_projector.linear_1.bias"] = lin1.bias
    sd["multi_modal_projector.linear_2.weight"] = lin2.weight
    sd["multi_modal_projector.linear_2.bias"] = lin2.bias
    torch.save({k: t.detach().clone() for k, t in sd.items()},
               tmp_path / "pytorch_model.bin")

    frozen = load_mod.llava_frozen(str(tmp_path), cfg)
    assert "lm_head" in frozen["llm"], (
        "released-layout lm_head lost in conversion")
    ids = np.random.default_rng(0).integers(
        5, d.vocab_size - 1, (1, 12)).astype(np.int64)
    with torch.no_grad():
        want = lm(torch.from_numpy(ids)).logits.numpy()
    embeds = llm_mod.embed_tokens(frozen["llm"], d, jnp.asarray(ids))
    out = llm_mod.forward_capture(frozen["llm"], d, embeds,
                                  jnp.ones((1, 12), bool), img_start=0,
                                  n_img=4)
    got = np.asarray(llm_mod.logits(frozen["llm"], d, out["last_hidden"]))
    np.testing.assert_allclose(got, want, atol=2e-4)

# heavy (jit compiles / torch oracles) -- excluded from the fast path
# (pytest -m "not slow"; see README Testing strategy)
pytestmark = pytest.mark.slow
