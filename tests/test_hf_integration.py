"""Integration parity: a tiny HF LlavaForConditionalGeneration vs our
assembled grounding pipeline.

This is the strongest end-to-end oracle available without real weights:
the exact model class the reference wraps (llava/modeling_llava.py is a
fork of it), random-initialised, converted through convert.load.llava_
frozen, compared on (a) the packed multimodal forward's logits and (b) the
text->image attention block that feeds the mask head.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from flmm_tpu.convert import load as load_mod
from flmm_tpu.models.frozen.grounding import GroundingConfig, _project
from flmm_tpu.models.llm import decoder as llm
from flmm_tpu.models.llm.decoder import DecoderConfig
from flmm_tpu.models.vision import vit
from flmm_tpu.models.vision.vit import ViTConfig

IMG_TOKEN = 30  # HF image_token_index


@pytest.fixture(scope="module")
def tiny_hf_llava():
    from transformers import (
        CLIPVisionConfig, LlamaConfig, LlavaConfig,
        LlavaForConditionalGeneration,
    )

    torch.manual_seed(0)
    vision_cfg = CLIPVisionConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8,
        layer_norm_eps=1e-5, hidden_act="quick_gelu",
    )
    text_cfg = LlamaConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-6,
    )
    cfg = LlavaConfig(
        vision_config=vision_cfg, text_config=text_cfg,
        image_token_index=IMG_TOKEN, vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        attn_implementation="eager",
    )
    model = LlavaForConditionalGeneration(cfg).eval()
    return model


def test_multimodal_forward_parity(tiny_hf_llava):
    model = tiny_hf_llava
    llm_cfg = DecoderConfig(
        vocab_size=64, hidden_size=64, num_layers=3, num_heads=4,
        num_kv_heads=2, head_dim=16, intermediate_size=128,
        dtype=jnp.float32,
    )
    vis_cfg = ViTConfig(
        hidden_size=48, num_layers=2, num_heads=4, patch_size=8,
        image_size=32, mlp_dim=96, use_class_token=True, use_pre_norm=True,
        patch_bias=False, act="quick_gelu", ln_eps=1e-5, final_norm=False,
    )
    sd = model.state_dict()

    class FakeGC:  # minimal cfg for the loader helpers
        llm = llm_cfg
        vision = vis_cfg

    from flmm_tpu.convert import hf_weights

    proj_sd = load_mod.submodule(sd, "multi_modal_projector.",
                                 "model.multi_modal_projector.")
    frozen = {
        "llm": hf_weights.llama_decoder_params(
            load_mod.llm_with_head(sd, "language_model.model.",
                                   "model.language_model."),
            llm_cfg, prefix=""),
        "vision": hf_weights.clip_vit_params(
            load_mod.submodule(sd, "vision_tower.", "model.vision_tower."),
            vis_cfg),
        "projector": [
            {"w": jnp.asarray(proj_sd["linear_1.weight"].numpy().T),
             "b": jnp.asarray(proj_sd["linear_1.bias"].numpy())},
            {"w": jnp.asarray(proj_sd["linear_2.weight"].numpy().T),
             "b": jnp.asarray(proj_sd["linear_2.bias"].numpy())},
        ],
    }

    # build a prompt with a single expanded image block (16 patches)
    rng = np.random.default_rng(0)
    n_img = (32 // 8) ** 2
    img_start = 3
    text_after = rng.integers(1, 29, (7,))
    input_ids = np.concatenate([
        rng.integers(1, 29, (img_start,)),
        np.full((n_img,), IMG_TOKEN),
        text_after,
    ]).astype(np.int32)
    S = len(input_ids)
    px = (rng.standard_normal((1, 32, 32, 3)) * 0.4).astype(np.float32)

    with torch.no_grad():
        hf = model(
            input_ids=torch.from_numpy(input_ids[None].astype(np.int64)),
            pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2)),
            attention_mask=torch.ones((1, S), dtype=torch.long),
            output_attentions=True,
        )

    # our pipeline
    feats = vit.forward(frozen["vision"], vis_cfg, jnp.asarray(px),
                        select_layer=-2)[:, 1:]
    img_embeds = _project(feats, frozen["projector"])
    embeds = llm.embed_tokens(frozen["llm"], llm_cfg,
                              jnp.asarray(input_ids)[None])
    embeds = jax.lax.dynamic_update_slice(embeds, img_embeds,
                                          (0, img_start, 0))
    out = llm.forward_capture(
        frozen["llm"], llm_cfg, embeds, jnp.ones((1, S), bool),
        img_start=img_start, n_img=n_img,
    )
    got_logits = np.asarray(
        llm.logits(frozen["llm"], llm_cfg, out["last_hidden"]))
    np.testing.assert_allclose(got_logits, hf.logits.numpy(), atol=3e-4)

    want_attn = np.stack(
        [a.numpy()[0][:, :, img_start:img_start + n_img]
         for a in hf.attentions], axis=0)
    np.testing.assert_allclose(np.asarray(out["attn"])[0], want_attn,
                               atol=3e-5)

# heavy (jit compiles / torch oracles) -- excluded from the fast path
# (pytest -m "not slow"; see README Testing strategy)
pytestmark = pytest.mark.slow
