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


def _load_reference_eva():
    """Import the reference's vendored eva_encoder.py standalone: stub the
    timm/video-processor deps it only needs at tower-assembly time, fake
    the parent packages so its relative import resolves."""
    import importlib.util
    import sys
    import types

    from tests.conftest import REFERENCE

    def stub(name, **attrs):
        mod = sys.modules.get(name) or types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        return mod

    tm = stub("timm")
    tm.__path__ = []
    stub("timm.models").__path__ = []
    stub("timm.models.layers",
         drop_path=lambda x, p=0.0, training=False: x,
         to_2tuple=lambda v: v if isinstance(v, tuple) else (v, v),
         trunc_normal_=torch.nn.init.trunc_normal_)
    stub("timm.models.registry", register_model=lambda f: f)
    for pkg in ("mgm", "mgm.model", "mgm.model.multimodal_encoder",
                "mgm.model.processor"):
        stub(pkg).__path__ = []
    stub("mgm.model.processor.video_processor", VideoFramesProcessor=None)
    path = REFERENCE / "mgm/model/multimodal_encoder/eva_encoder.py"
    spec = importlib.util.spec_from_file_location(
        "mgm.model.multimodal_encoder.eva_encoder", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_eva_vision_parity():
    """EVA-G trunk oracle (reference eva_encoder.py VisionTransformer as
    EVAVisionTower builds it, :453-465): fused qkv with separate
    q_bias/zero-k/v_bias, cls token, abs pos embed, and NO final norm
    (``self.norm`` is commented out at :285-287, so the checkpoint's
    norm.* keys never apply)."""
    from functools import partial

    from tests.conftest import reference_available
    from flmm_tpu.convert.hf_weights import eva_vit_params

    if not reference_available():
        pytest.skip("reference not mounted")
    eva = _load_reference_eva()
    torch.manual_seed(3)
    dim, depth, heads = 32, 3, 4
    vt = eva.VisionTransformer(
        img_size=28, patch_size=14, embed_dim=dim, depth=depth,
        num_heads=heads, mlp_ratio=4.3637, qkv_bias=True,
        use_mean_pooling=False, drop_path_rate=0.0,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
    ).eval()
    # noise up the zero-init biases/cls so the conversion is exercised
    with torch.no_grad():
        for n, p in vt.named_parameters():
            if float(p.detach().abs().max()) == 0.0:
                p.copy_(torch.randn_like(p) * 0.05)
    sd = {k: v for k, v in vt.state_dict().items()}
    assert "norm.weight" not in sd  # the vendored model really has no norm
    cfg = ViTConfig(hidden_size=dim, num_layers=depth, num_heads=heads,
                    patch_size=14, image_size=28,
                    mlp_dim=int(dim * 4.3637), use_class_token=True,
                    use_pre_norm=False, patch_bias=True, act="gelu",
                    ln_eps=1e-6, final_norm=False)
    params = eva_vit_params(sd, cfg)
    px = _pixels(2, 28, seed=4)
    with torch.no_grad():
        want = vt(torch.from_numpy(px.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(forward(params, cfg, jnp.asarray(px), select_layer=-1))
    np.testing.assert_allclose(got, want, atol=2e-5)
