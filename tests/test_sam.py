"""JAX SAM parity vs the reference torch implementation (random weights).

The reference segment_anything package (torch-only) serves as the oracle;
missing optional deps (torchvision, cv2) are stubbed so only the modeling
code loads.
"""

import sys
import types

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from tests.conftest import REFERENCE, reference_available


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return mod


@pytest.fixture(scope="module")
def ref_sam():
    if not reference_available():
        pytest.skip("reference not mounted")
    sys.path.insert(0, str(REFERENCE))
    tv = _stub("torchvision")
    tv.__path__ = []  # mark as package so submodule stubs resolve
    _stub("torchvision.ops")
    _stub("torchvision.ops.boxes", batched_nms=None, box_area=None)
    _stub("torchvision.transforms")
    _stub("torchvision.transforms.functional", resize=None, to_pil_image=None)
    _stub("cv2")
    from segment_anything.modeling.image_encoder import ImageEncoderViT
    from segment_anything.modeling.prompt_encoder import PromptEncoder
    from segment_anything.modeling.mask_decoder import MaskDecoder
    from segment_anything.modeling.transformer import TwoWayTransformer

    torch.manual_seed(0)
    # tiny geometry: img 64, patch 16 -> grid 4; window 2; 1 global block
    enc = ImageEncoderViT(
        img_size=64, patch_size=16, embed_dim=32, depth=3, num_heads=4,
        mlp_ratio=2.0, out_chans=16, qkv_bias=True, use_rel_pos=True,
        window_size=2, global_attn_indexes=(1,),
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
    ).eval()
    # randomise rel-pos (zero-init by default)
    with torch.no_grad():
        for blk in enc.blocks:
            blk.attn.rel_pos_h.normal_(0, 0.1)
            blk.attn.rel_pos_w.normal_(0, 0.1)
        enc.pos_embed.normal_(0, 0.02)
    pe = PromptEncoder(
        embed_dim=16, image_embedding_size=(4, 4), input_image_size=(64, 64),
        mask_in_chans=8,
    ).eval()
    dec = MaskDecoder(
        transformer_dim=16,
        transformer=TwoWayTransformer(depth=2, embedding_dim=16, mlp_dim=32,
                                      num_heads=2),
        num_multimask_outputs=3,
    ).eval()
    return enc, pe, dec


def test_image_encoder_parity(ref_sam):
    from flmm_tpu.models.sam.image_encoder import SamEncoderConfig, forward
    from flmm_tpu.convert.sam_weights import encoder_params

    enc, _, _ = ref_sam
    cfg = SamEncoderConfig(img_size=64, patch_size=16, embed_dim=32, depth=3,
                           num_heads=4, mlp_ratio=2.0, out_chans=16,
                           window_size=2, global_attn_indexes=(1,))
    params = encoder_params(enc.state_dict(), cfg, prefix="")
    rng = np.random.default_rng(0)
    px = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = enc(torch.from_numpy(px.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(forward(params, cfg, jnp.asarray(px)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=2e-5)


def test_prompt_encoder_parity(ref_sam):
    from flmm_tpu.models.sam.prompt_encoder import (
        PromptEncoderConfig, dense_pe, embed_boxes, embed_masks, no_mask_dense,
    )
    from flmm_tpu.convert.sam_weights import prompt_encoder_params

    _, pe, _ = ref_sam
    cfg = PromptEncoderConfig(embed_dim=16, image_embedding_size=4,
                              input_image_size=64, mask_in_chans=8)
    params = prompt_encoder_params(pe.state_dict(), cfg, prefix="")

    boxes = np.array([[4.0, 8.0, 40.0, 60.0], [0.0, 0.0, 64.0, 64.0]],
                     np.float32)
    rng = np.random.default_rng(1)
    masks = rng.standard_normal((2, 16, 16)).astype(np.float32)
    with torch.no_grad():
        sparse, dense = pe(points=None, boxes=torch.from_numpy(boxes),
                           masks=torch.from_numpy(masks[:, None]))
        ref_pe = pe.get_dense_pe().numpy()

    got_sparse = np.asarray(embed_boxes(params, cfg, jnp.asarray(boxes)))
    np.testing.assert_allclose(got_sparse, sparse.numpy(), atol=2e-5)
    got_dense = np.asarray(embed_masks(params, cfg, jnp.asarray(masks[..., None])))
    np.testing.assert_allclose(got_dense.transpose(0, 3, 1, 2), dense.numpy(),
                               atol=2e-5)
    got_pe = np.asarray(dense_pe(params, cfg))
    np.testing.assert_allclose(got_pe.transpose(2, 0, 1), ref_pe[0], atol=2e-5)

    with torch.no_grad():
        _, dense_none = pe(points=None, boxes=torch.from_numpy(boxes), masks=None)
    got_none = np.asarray(no_mask_dense(params, cfg, 2))
    np.testing.assert_allclose(got_none.transpose(0, 3, 1, 2),
                               dense_none.detach().numpy(), atol=2e-5)


def test_mask_decoder_parity(ref_sam):
    from flmm_tpu.models.sam.mask_decoder import MaskDecoderConfig, forward
    from flmm_tpu.models.sam.transformer import TwoWayConfig
    from flmm_tpu.models.sam.prompt_encoder import PromptEncoderConfig, dense_pe
    from flmm_tpu.convert.sam_weights import (
        mask_decoder_params, prompt_encoder_params,
    )

    _, pe, dec = ref_sam
    cfg = MaskDecoderConfig(
        transformer_dim=16,
        transformer=TwoWayConfig(depth=2, embed_dim=16, num_heads=2, mlp_dim=32),
    )
    params = mask_decoder_params(dec.state_dict(), cfg, prefix="")
    pcfg = PromptEncoderConfig(embed_dim=16, image_embedding_size=4,
                               input_image_size=64, mask_in_chans=8)
    pparams = prompt_encoder_params(pe.state_dict(), pcfg, prefix="")

    rng = np.random.default_rng(2)
    img_emb = rng.standard_normal((4, 4, 16)).astype(np.float32)
    sparse = rng.standard_normal((3, 2, 16)).astype(np.float32)
    dense = rng.standard_normal((3, 4, 4, 16)).astype(np.float32)
    img_pe = np.asarray(dense_pe(pparams, pcfg))

    with torch.no_grad():
        want_masks, want_iou = dec(
            image_embeddings=torch.from_numpy(
                img_emb.transpose(2, 0, 1)[None]),
            image_pe=torch.from_numpy(img_pe.transpose(2, 0, 1)[None]),
            sparse_prompt_embeddings=torch.from_numpy(sparse),
            dense_prompt_embeddings=torch.from_numpy(
                dense.transpose(0, 3, 1, 2)),
            multimask_output=False,
        )
    masks, iou = forward(params, cfg, jnp.asarray(img_emb),
                         jnp.asarray(img_pe), jnp.asarray(sparse),
                         jnp.asarray(dense))
    got_masks = np.asarray(masks)[:, :1]
    np.testing.assert_allclose(got_masks, want_masks.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(iou)[:, :1], want_iou.numpy(),
                               atol=3e-5)


def test_mask_decoder_token_padding_isolation(ref_sam):
    """Padded text slots must not change predictions."""
    from flmm_tpu.models.sam.mask_decoder import MaskDecoderConfig, forward
    from flmm_tpu.models.sam.transformer import TwoWayConfig
    from flmm_tpu.models.sam.prompt_encoder import PromptEncoderConfig, dense_pe
    from flmm_tpu.convert.sam_weights import (
        mask_decoder_params, prompt_encoder_params,
    )

    _, pe, dec = ref_sam
    cfg = MaskDecoderConfig(
        transformer_dim=16,
        transformer=TwoWayConfig(depth=2, embed_dim=16, num_heads=2, mlp_dim=32),
    )
    params = mask_decoder_params(dec.state_dict(), cfg, prefix="")
    pcfg = PromptEncoderConfig(embed_dim=16, image_embedding_size=4,
                               input_image_size=64, mask_in_chans=8)
    pparams = prompt_encoder_params(pe.state_dict(), pcfg, prefix="")
    img_pe = jnp.asarray(dense_pe(pparams, pcfg))

    rng = np.random.default_rng(3)
    img_emb = jnp.asarray(rng.standard_normal((4, 4, 16)).astype(np.float32))
    sparse = rng.standard_normal((2, 5, 16)).astype(np.float32)
    dense = jnp.asarray(rng.standard_normal((2, 4, 4, 16)).astype(np.float32))
    valid = np.array([[True] * 5, [True, True, True, False, False]])

    m_full, _ = forward(params, cfg, img_emb, img_pe,
                        jnp.asarray(sparse[1:, :3]), dense[1:])
    m_pad, _ = forward(params, cfg, img_emb, img_pe, jnp.asarray(sparse),
                       dense, sparse_valid=jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(m_pad)[1], np.asarray(m_full)[0],
                               atol=2e-5)


def test_refiner_multimask_selection():
    """multimask_output picks the candidate maximising IoU vs the coarse
    mask (reference mask_refiner.py:114-118)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from flmm_tpu.configs.deepseek_vl import tiny
    from flmm_tpu.models.mask_head import refiner
    from flmm_tpu.models.sam import image_encoder as se
    from flmm_tpu.models.sam import mask_decoder as smd
    from flmm_tpu.models.sam import prompt_encoder as spe

    cfg = dataclasses.replace(tiny().sam, multimask_output=True)
    params = {
        "prompt": spe.init_params(cfg.prompt, jax.random.key(1)),
        "decoder": smd.init_params(cfg.decoder, jax.random.key(2)),
    }
    enc = se.init_params(cfg.encoder, jax.random.key(0))
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal(
        (1, cfg.encoder.img_size, cfg.encoder.img_size, 3)).astype(np.float32))
    emb = se.forward(enc, cfg.encoder, px)[0]
    M = 2
    coarse = jnp.asarray(
        rng.standard_normal((M, 16, 16)).astype(np.float32))
    geom = {k: jnp.asarray(v, jnp.float32) for k, v in
            dict(crop_y=0.0, crop_x=0.0, crop_h=16.0, crop_w=16.0,
                 sam_h=float(cfg.encoder.img_size),
                 sam_w=float(cfg.encoder.img_size)).items()}
    text = jnp.zeros((M, 3, cfg.prompt.embed_dim), jnp.float32)
    tvalid = jnp.ones((M, 3), bool)
    out = refiner.refine(params, cfg, emb, coarse, geom, text, tvalid)
    assert out["low_res_logits"].shape == (M, cfg.prompt_size,
                                           cfg.prompt_size)
    assert np.isfinite(np.asarray(out["low_res_logits"])).all()
    assert out["iou_pred"].shape == (M,)


def test_resize_rel_pos_matches_torch_interpolate():
    """resize_rel_pos == the reference get_rel_pos resize
    (image_encoder.py:292-308: F.interpolate mode='linear')."""
    from flmm_tpu.convert.sam_weights import resize_rel_pos

    rng = np.random.default_rng(5)
    for L, target in ((127, 55), (27, 27), (7, 13), (31, 95)):
        table = rng.standard_normal((L, 16)).astype(np.float32)
        want = torch.nn.functional.interpolate(
            torch.from_numpy(table).reshape(1, L, -1).permute(0, 2, 1),
            size=target, mode="linear",
        ).reshape(-1, target).permute(1, 0).numpy()
        got = resize_rel_pos(table, target)
        # torch interpolates in f32, resize_rel_pos in f64
        np.testing.assert_allclose(got, want, atol=5e-5)


def test_reduced_resolution_sam_schedule():
    """sam_vit_l(img_size=...) reduced-resolution schedule: converted
    weights resample (pos-embed bicubic, global rel-pos linear), the
    geometry threads through prompt/refiner configs, and encode+refine
    run end-to-end at the new grid."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from flmm_tpu.configs.deepseek_vl import sam_vit_l
    from flmm_tpu.convert.sam_weights import encoder_params
    from flmm_tpu.models.mask_head import refiner
    from flmm_tpu.models.sam import image_encoder as se
    from flmm_tpu.models.sam import mask_decoder as smd
    from flmm_tpu.models.sam import prompt_encoder as spe

    # a small encoder standing in for the checkpoint at native "1024-like"
    # geometry (img 64 -> grid 4), loaded into a half-resolution config
    base = sam_vit_l(dtype=jnp.float32, flash=False, img_size=1024)
    small = dataclasses.replace(
        base.encoder, img_size=64, patch_size=16, embed_dim=32, depth=3,
        num_heads=4, mlp_ratio=2.0, out_chans=16, window_size=2,
        global_attn_indexes=(1,))
    native = se.init_params(small, jax.random.key(0))
    # fabricate a torch-style state dict from the native params
    sd = {}
    sd["pos_embed"] = np.asarray(native["pos_embed"])[None]
    sd["patch_embed.proj.weight"] = np.asarray(
        native["patch_kernel"]).transpose(3, 2, 0, 1)
    sd["patch_embed.proj.bias"] = np.asarray(native["patch_bias"])
    for j in (0, 1):
        sd[f"neck.{2 * j}.weight"] = np.asarray(
            native[f"neck{j}_kernel"]).transpose(3, 2, 0, 1)
        sd[f"neck.{2 * j + 1}.weight"] = np.asarray(native[f"neck{j}_ln_w"])
        sd[f"neck.{2 * j + 1}.bias"] = np.asarray(native[f"neck{j}_ln_b"])
    rng = np.random.default_rng(6)
    for i, bp in enumerate(native["blocks"]):
        b = f"blocks.{i}."
        sd[b + "norm1.weight"] = np.asarray(bp["ln1_w"])
        sd[b + "norm1.bias"] = np.asarray(bp["ln1_b"])
        sd[b + "norm2.weight"] = np.asarray(bp["ln2_w"])
        sd[b + "norm2.bias"] = np.asarray(bp["ln2_b"])
        sd[b + "attn.qkv.weight"] = np.asarray(bp["wqkv"]).T
        sd[b + "attn.qkv.bias"] = np.asarray(bp["bqkv"])
        sd[b + "attn.proj.weight"] = np.asarray(bp["wo"]).T
        sd[b + "attn.proj.bias"] = np.asarray(bp["bo"])
        sd[b + "mlp.lin1.weight"] = np.asarray(bp["mlp"]["w1"]).T
        sd[b + "mlp.lin1.bias"] = np.asarray(bp["mlp"]["b1"])
        sd[b + "mlp.lin2.weight"] = np.asarray(bp["mlp"]["w2"]).T
        sd[b + "mlp.lin2.bias"] = np.asarray(bp["mlp"]["b2"])
        sd[b + "attn.rel_pos_h"] = rng.standard_normal(
            bp["rel_pos_h"].shape).astype(np.float32) * 0.1
        sd[b + "attn.rel_pos_w"] = rng.standard_normal(
            bp["rel_pos_w"].shape).astype(np.float32) * 0.1

    # load into a reduced (img 32 -> grid 2) config: global rel tables
    # must land at 2*2-1=3, pos-embed at (2, 2)
    reduced = dataclasses.replace(small, img_size=32)
    params = encoder_params(sd, reduced, prefix="", dtype=np.float32)
    assert params["pos_embed"].shape == (2, 2, 32)
    assert params["blocks"][1]["rel_pos_h"].shape[0] == 3  # global block
    assert params["blocks"][0]["rel_pos_h"].shape[0] == 3  # window 2

    emb = se.forward(params, reduced, jnp.asarray(
        rng.standard_normal((1, 32, 32, 3)).astype(np.float32)))
    assert emb.shape == (1, 2, 2, 16)
    assert np.isfinite(np.asarray(emb)).all()

    # geometry threads through the factory: prompt/refiner sizes follow
    half = sam_vit_l(dtype=jnp.float32, flash=False, img_size=448)
    assert half.encoder.grid == 28
    assert half.prompt.image_embedding_size == 28
    assert half.prompt.input_image_size == 448
    assert half.prompt_size == 112

    # full reduced-geometry refine roundtrip on a tiny stand-in
    rcfg = dataclasses.replace(
        sam_vit_l(dtype=jnp.float32, flash=False, img_size=32),
        encoder=reduced,
        prompt=spe.PromptEncoderConfig(
            embed_dim=16, image_embedding_size=2, input_image_size=32,
            mask_in_chans=8, dtype=jnp.float32),
        decoder=smd.MaskDecoderConfig(
            transformer_dim=16, dtype=jnp.float32,
            transformer=smd.twoway.TwoWayConfig(
                depth=2, embed_dim=16, mlp_dim=32, num_heads=2)),
        prompt_size=8)
    rparams = {
        "prompt": spe.init_params(rcfg.prompt, jax.random.key(1)),
        "decoder": smd.init_params(rcfg.decoder, jax.random.key(2)),
    }
    M = 2
    coarse = jnp.asarray(rng.standard_normal((M, 16, 16)).astype(np.float32))
    geom = {k: jnp.asarray(v, jnp.float32) for k, v in
            dict(crop_y=0.0, crop_x=0.0, crop_h=16.0, crop_w=16.0,
                 sam_h=32.0, sam_w=32.0).items()}
    out = refiner.refine(rparams, rcfg, emb[0], coarse, geom,
                         jnp.zeros((M, 3, 16), jnp.float32),
                         jnp.ones((M, 3), bool))
    assert out["low_res_logits"].shape == (M, 8, 8)
    assert np.isfinite(np.asarray(out["low_res_logits"])).all()

# heavy (jit compiles / torch oracles) -- excluded from the fast path
# (pytest -m "not slow"; see README Testing strategy)
pytestmark = pytest.mark.slow
