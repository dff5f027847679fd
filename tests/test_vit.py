"""Vision tower parity vs HF CLIP/SigLIP vision models (random weights)."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from flmm_tpu.models.vision.vit import ViTConfig, forward, init_params
from flmm_tpu.convert.hf_weights import clip_vit_params, siglip_vit_params


def _pixels(b, size, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((b, size, size, 3)).astype(np.float32) * 0.5


def test_clip_vision_parity():
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(0)
    hf_cfg = CLIPVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=3,
        num_attention_heads=4, image_size=32, patch_size=8,
        layer_norm_eps=1e-5, hidden_act="quick_gelu",
        attn_implementation="eager",
    )
    model = CLIPVisionModel(hf_cfg).eval()
    cfg = ViTConfig(hidden_size=64, num_layers=3, num_heads=4, patch_size=8,
                    image_size=32, mlp_dim=128, use_class_token=True,
                    use_pre_norm=True, patch_bias=False, act="quick_gelu",
                    ln_eps=1e-5, final_norm=False)
    params = clip_vit_params(model.state_dict(), cfg)
    px = _pixels(2, 32, seed=1)
    with torch.no_grad():
        hf = model(torch.from_numpy(px.transpose(0, 3, 1, 2)),
                   output_hidden_states=True)
    # LLaVA convention: hidden_states[-2]
    got = np.asarray(forward(params, cfg, jnp.asarray(px), select_layer=-2))
    np.testing.assert_allclose(got, hf.hidden_states[-2].numpy(), atol=2e-5)
    # final (post-norm) output
    got_last = np.asarray(forward(params, cfg, jnp.asarray(px), select_layer=-1))
    np.testing.assert_allclose(got_last, hf.last_hidden_state.numpy(), atol=2e-5)


def test_siglip_vision_parity():
    from transformers import SiglipVisionConfig, SiglipVisionModel

    torch.manual_seed(1)
    hf_cfg = SiglipVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=3,
        num_attention_heads=4, image_size=32, patch_size=8,
        layer_norm_eps=1e-6, hidden_act="gelu_pytorch_tanh",
        attn_implementation="eager",
    )
    model = SiglipVisionModel(hf_cfg).eval()
    cfg = ViTConfig(hidden_size=64, num_layers=3, num_heads=4, patch_size=8,
                    image_size=32, mlp_dim=128, use_class_token=False,
                    use_pre_norm=False, patch_bias=True, act="gelu_tanh",
                    ln_eps=1e-6)
    params = siglip_vit_params(model.state_dict(), cfg)
    px = _pixels(2, 32, seed=2)
    with torch.no_grad():
        hf = model(torch.from_numpy(px.transpose(0, 3, 1, 2)),
                   output_hidden_states=True)
    got = np.asarray(forward(params, cfg, jnp.asarray(px), select_layer=-1))
    np.testing.assert_allclose(got, hf.last_hidden_state.numpy(), atol=2e-5)


def test_pos_embed_resample_shapes():
    import jax

    cfg = ViTConfig(hidden_size=32, num_layers=2, num_heads=2, patch_size=8,
                    image_size=32, mlp_dim=64)
    params = init_params(cfg, jax.random.key(0))
    # feed a larger image: pos embeds resample 4x4 -> 6x6
    px = _pixels(1, 48, seed=3)
    out = forward(params, cfg, jnp.asarray(px), select_layer=-1)
    assert out.shape == (1, 36, 32)
