"""``convert.load.reference_trained`` — the released-F-LMM-checkpoint
bridge — regression-tested at tiny dims.

Fabricates the exact requires_grad save layout the reference runner
emits (flmm/runner.py:131-139: ``mask_head.*`` mmseg U-Net,
``text_proj.*``, ``text_layer_weights`` and the fine-tuned
``sam.model.{prompt_encoder,mask_decoder}.*``), converts it, and checks
numeric forward parity of every converted piece against the torch
originals.  The full-dimension version of this chain lives in
``scripts/parity_sam_full.py`` (run on demand); this test pins the key
-layout contract in the suite.
"""

import pathlib
import sys
import types

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from tests.conftest import REFERENCE, reference_available

SCRIPTS = pathlib.Path(__file__).resolve().parent.parent / "scripts"


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return mod


@pytest.fixture(scope="module")
def bridge(tmp_path_factory):
    if not reference_available():
        pytest.skip("reference not mounted")
    sys.path.insert(0, str(REFERENCE))
    sys.path.insert(0, str(SCRIPTS))
    tv = _stub("torchvision")
    tv.__path__ = []
    _stub("torchvision.ops")
    _stub("torchvision.ops.boxes", batched_nms=None, box_area=None)
    _stub("torchvision.transforms")
    _stub("torchvision.transforms.functional", resize=None, to_pil_image=None)
    _stub("cv2")
    from segment_anything.modeling.prompt_encoder import PromptEncoder
    from segment_anything.modeling.mask_decoder import MaskDecoder
    from segment_anything.modeling.transformer import TwoWayTransformer
    from parity_sam_full import MMsegUNetOracle

    torch.manual_seed(0)
    pe = PromptEncoder(embed_dim=16, image_embedding_size=(4, 4),
                       input_image_size=(64, 64), mask_in_chans=8).eval()
    dec = MaskDecoder(
        transformer_dim=16,
        transformer=TwoWayTransformer(depth=2, embedding_dim=16, mlp_dim=32,
                                      num_heads=2),
        num_multimask_outputs=3).eval()
    unet = MMsegUNetOracle(in_channels=8, base=8, upsample_input=16).eval()
    text_proj = torch.nn.Linear(24, 16)
    # constant-init leaves (GroupNorm scales) would convert trivially;
    # give them noise so the forward comparison exercises them
    with torch.no_grad():
        for p in unet.parameters():
            if p.numel() > 1 and float(p.detach().std()) == 0.0:
                p.copy_(p.mean() + torch.randn_like(p) * 0.05)

    sd = {"text_proj.weight": text_proj.weight.detach(),
          "text_proj.bias": text_proj.bias.detach(),
          "text_layer_weights": torch.randn(3) * 0.1}
    for k, v in unet.state_dict().items():
        sd["mask_head." + k] = v
    for k, v in pe.state_dict().items():
        sd["sam.model.prompt_encoder." + k] = v
    for k, v in dec.state_dict().items():
        sd["sam.model.mask_decoder." + k] = v
    path = tmp_path_factory.mktemp("ref_trained") / "trained.pth"
    torch.save({"state_dict": sd}, path)
    return path, pe, dec, unet, text_proj, sd


def test_reference_trained_bridge(bridge):
    from flmm_tpu.convert import load as load_mod
    from flmm_tpu.models.mask_head import unet as unet_mod
    from flmm_tpu.models.mask_head.unet import UNetConfig
    from flmm_tpu.models.sam.mask_decoder import MaskDecoderConfig
    from flmm_tpu.models.sam.mask_decoder import forward as dec_forward
    from flmm_tpu.models.sam.transformer import TwoWayConfig
    from flmm_tpu.models.sam.prompt_encoder import (
        PromptEncoderConfig, dense_pe,
    )

    path, pe, dec, unet, text_proj, sd_raw = bridge
    pcfg = PromptEncoderConfig(embed_dim=16, image_embedding_size=4,
                               input_image_size=64, mask_in_chans=8)
    dcfg = MaskDecoderConfig(
        transformer_dim=16,
        transformer=TwoWayConfig(depth=2, embed_dim=16, num_heads=2,
                                 mlp_dim=32))
    ucfg = UNetConfig(in_channels=8, base_channels=8, upsample_input=16)
    cfg = types.SimpleNamespace(
        unet=ucfg, sam=types.SimpleNamespace(prompt=pcfg, decoder=dcfg))

    trainable = load_mod.reference_trained(str(path), cfg)

    # text_layer_weights: direct copy
    np.testing.assert_allclose(
        np.asarray(trainable["text_layer_weights"]),
        sd_raw["text_layer_weights"].numpy(), atol=1e-6)

    # text_proj: (in, out) layout == torch Linear
    rng = np.random.default_rng(0)
    pre = rng.standard_normal((3, 24)).astype(np.float32)
    with torch.no_grad():
        want_tp = text_proj(torch.from_numpy(pre)).numpy()
    got_tp = (pre @ np.asarray(trainable["text_proj"]["w"])
              + np.asarray(trainable["text_proj"]["b"]))
    np.testing.assert_allclose(got_tp, want_tp, atol=1e-5)

    # U-Net head forward parity (mmseg key layout through unet_params)
    attn = np.abs(rng.standard_normal((2, 8, 6, 6))).astype(np.float32)
    with torch.no_grad():
        want_unet = unet(torch.from_numpy(attn)).numpy()
    got_unet = np.asarray(unet_mod.forward(
        trainable["unet"], ucfg, jnp.asarray(attn.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got_unet, want_unet[:, 0], atol=1e-4)

    # fine-tuned SAM prompt-encoder + mask-decoder forward parity
    img_pe = np.asarray(dense_pe(trainable["sam"]["prompt"], pcfg))
    want_pe = pe.get_dense_pe().numpy()[0].transpose(1, 2, 0)
    np.testing.assert_allclose(img_pe, want_pe, atol=1e-5)

    img_emb = rng.standard_normal((4, 4, 16)).astype(np.float32)
    sparse = rng.standard_normal((3, 2, 16)).astype(np.float32)
    dense = rng.standard_normal((3, 4, 4, 16)).astype(np.float32)
    with torch.no_grad():
        want_masks, want_iou = dec(
            image_embeddings=torch.from_numpy(
                img_emb.transpose(2, 0, 1)[None]),
            image_pe=torch.from_numpy(
                img_pe.transpose(2, 0, 1)[None].copy()),
            sparse_prompt_embeddings=torch.from_numpy(sparse),
            dense_prompt_embeddings=torch.from_numpy(
                dense.transpose(0, 3, 1, 2)),
            multimask_output=False)
    masks, iou = dec_forward(
        trainable["sam"]["decoder"], dcfg, jnp.asarray(img_emb),
        jnp.asarray(img_pe), jnp.asarray(sparse), jnp.asarray(dense))
    np.testing.assert_allclose(np.asarray(masks)[:, :1], want_masks.numpy(),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(iou)[:, :1], want_iou.numpy(),
                               atol=3e-5)

# heavy (jit compiles / torch oracles) -- excluded from the fast path
# (pytest -m "not slow"; see README Testing strategy)
pytestmark = pytest.mark.slow
