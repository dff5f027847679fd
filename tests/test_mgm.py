"""MGM family tests: resampler parity, attention re-assembly, tiny e2e."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp
from PIL import Image

from flmm_tpu.configs.mgm import tiny_mgm
from flmm_tpu.data.collate import BatchSpec
from flmm_tpu.data.mgm import MGMProcessSpec, build_mgm_batch, mgm_process
from flmm_tpu.data.processors import ProcessorConfig
from flmm_tpu.models.frozen import mgm as model


def test_unified_resampler_matches_reference_math():
    """Oracle: the torch formula from mgm_arch.py:295-313."""
    rng = np.random.default_rng(0)
    B, pn, D, C, A = 2, 4, 16, 24, 16
    clip = rng.standard_normal((B, pn * pn, D)).astype(np.float32)
    aux = rng.standard_normal((B, A, A, C)).astype(np.float32)

    def ln_lin_params(i, o, seed):
        r = np.random.default_rng(seed)
        return {
            "ln_w": jnp.asarray(r.standard_normal(i).astype(np.float32)),
            "ln_b": jnp.asarray(r.standard_normal(i).astype(np.float32)),
            "w": jnp.asarray(r.standard_normal((i, o)).astype(np.float32) / 4),
            "b": jnp.asarray(r.standard_normal(o).astype(np.float32)),
        }

    fro = {
        "uni_query": ln_lin_params(D, D, 1),
        "uni_aux": ln_lin_params(C, D, 2),
        "uni_val": ln_lin_params(C, D, 3),
    }
    got = np.asarray(model.unified_resampler(
        fro, jnp.asarray(clip), jnp.asarray(aux), pn))

    # torch oracle
    def t_ln_lin(x, p):
        y = torch.nn.functional.layer_norm(
            x, (x.shape[-1],), torch.from_numpy(np.asarray(p["ln_w"])),
            torch.from_numpy(np.asarray(p["ln_b"])), eps=1e-5)
        return y @ torch.from_numpy(np.asarray(p["w"])) + torch.from_numpy(
            np.asarray(p["b"]))

    ps = A // pn
    taux = torch.from_numpy(aux).reshape(B, pn, ps, pn, ps, C)
    taux = taux.permute(0, 1, 3, 2, 4, 5).reshape(B, pn * pn, ps * ps, C)
    q = t_ln_lin(torch.from_numpy(clip), fro["uni_query"])
    k = t_ln_lin(taux, fro["uni_aux"])
    v = t_ln_lin(taux, fro["uni_val"])
    att = q[:, :, None] @ (k.transpose(-1, -2) / (k.shape[-1] ** 0.5))
    want = (att.softmax(-1) @ v).mean(2).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_assemble_attention_hd_tiling():
    cfg = tiny_mgm(hd=True)
    B, L, H, M = 1, 3, 4, 2
    pn = cfg.base.clip_shape
    n = cfg.base.num_img_tokens
    rng = np.random.default_rng(1)
    attn = rng.random((B, L, H, M, n)).astype(np.float32)
    maps = np.asarray(model.assemble_attention(cfg, jnp.asarray(attn)))
    assert maps.shape == (B * M, 8, 8, 2 * L * H)
    # check one HD tile position: token t in crop (r=1, c=0), cell (2, 3)
    crop_r, crop_c, cr, cc = 1, 0, 2, 3
    tok = pn * pn + ((crop_r * 2 + crop_c) * pn * pn) + cr * pn + cc
    got = maps[0, crop_r * pn + cr, crop_c * pn + cc, L * H + 5]
    # channel L*H+5 = hd stream, layer-major flat index 5 -> (l=1, h=1)
    want = attn[0, 1, 1, 0, tok]
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("hd", [False, True])
def test_mgm_tiny_e2e(hd):
    from tests.test_data import FakeTokenizer, IMAGE_TOKEN_ID
    from flmm_tpu.data import tokenization as tok

    cfg = tiny_mgm(hd=hd)
    t = FakeTokenizer()
    spec = tok.PromptSpec(
        tok.TEMPLATES["gemma"],
        "<image_placeholder>" * cfg.base.num_img_tokens + " describe",
    )
    prompt_ids = tok.encode_prompt(t, spec)
    img_start, n = tok.find_image_block(prompt_ids, IMAGE_TOKEN_ID)
    assert n == cfg.base.num_img_tokens
    import dataclasses
    cfg = dataclasses.replace(
        cfg, base=dataclasses.replace(cfg.base, img_start=img_start))

    rng = np.random.default_rng(0)
    samples = []
    for w, h in [(70, 50), (40, 80)]:
        mask = np.zeros((h, w), np.uint8)
        mask[5:h // 2, 5:w // 2] = 1
        stream = tok.caption_stream(
            t, [{"utterance": "blue box", "has_mask": True}], len(prompt_ids))
        samples.append({
            "input_ids": np.asarray(prompt_ids + stream["caption_ids"],
                                    np.int32),
            "mask_ids": np.asarray(stream["mask_ids"], np.int32),
            "spans": stream["spans"],
            "masks": mask[None],
            "image": Image.fromarray(
                rng.integers(0, 255, (h, w, 3), np.uint8), "RGB"),
            "img_start": img_start,
            "mask_infos": [{"plural": False, "isthing": True}],
        })
    mspec = MGMProcessSpec(crop_size=32, aux_size=cfg.aux.image_size,
                           image_grid=cfg.image_grid,
                           image_global=cfg.image_global)
    bspec = BatchSpec(seq_len=len(prompt_ids) + 12, max_masks=2,
                      text_per_mask=4, coarse_hw=(16, 16), sam_size=128,
                      prompt_size=32, processor=ProcessorConfig(size=32))
    batch = build_mgm_batch(samples, bspec, mspec)
    mb = {k: jax.tree.map(jnp.asarray, v) for k, v in batch.items()
          if k != "infos"}
    params = model.init_params(cfg, jax.random.key(0))
    loss, metrics = model.loss_fn(params, cfg, mb)
    assert np.isfinite(float(loss))


def test_open_clip_bin_filename_loads(tmp_path):
    """The released ConvNeXt aux checkpoint is ONE file named
    open_clip_pytorch_model.bin (reference openclip_encoder.py:29) --
    NOT the HF pytorch_model*.bin pattern; the loader must fall back to
    *.bin (round-4 converter-parity finding)."""
    import torch

    from flmm_tpu.convert import load as load_mod
    from flmm_tpu.models.vision.convnext import ConvNeXtConfig

    cfg = ConvNeXtConfig(depths=(1, 1, 1, 1), dims=(4, 8, 16, 32),
                         image_size=64, dtype=jnp.float32)
    sd = {}
    torch.manual_seed(0)
    sd["visual.trunk.stem.0.weight"] = torch.randn(4, 3, 4, 4)
    sd["visual.trunk.stem.0.bias"] = torch.randn(4)
    sd["visual.trunk.stem.1.weight"] = torch.randn(4)
    sd["visual.trunk.stem.1.bias"] = torch.randn(4)
    for s, dim in enumerate(cfg.dims):
        if s > 0:
            prev = cfg.dims[s - 1]
            sd[f"visual.trunk.stages.{s}.downsample.0.weight"] = torch.randn(prev)
            sd[f"visual.trunk.stages.{s}.downsample.0.bias"] = torch.randn(prev)
            sd[f"visual.trunk.stages.{s}.downsample.1.weight"] = torch.randn(dim, prev, 2, 2)
            sd[f"visual.trunk.stages.{s}.downsample.1.bias"] = torch.randn(dim)
        base = f"visual.trunk.stages.{s}.blocks.0."
        sd[base + "conv_dw.weight"] = torch.randn(dim, 1, 7, 7)
        sd[base + "conv_dw.bias"] = torch.randn(dim)
        sd[base + "norm.weight"] = torch.randn(dim)
        sd[base + "norm.bias"] = torch.randn(dim)
        sd[base + "mlp.fc1.weight"] = torch.randn(4 * dim, dim)
        sd[base + "mlp.fc1.bias"] = torch.randn(4 * dim)
        sd[base + "mlp.fc2.weight"] = torch.randn(dim, 4 * dim)
        sd[base + "mlp.fc2.bias"] = torch.randn(dim)
        sd[base + "gamma"] = torch.randn(dim)
    torch.save(sd, tmp_path / "open_clip_pytorch_model.bin")
    loaded = load_mod.load_state_dict(tmp_path)
    params = load_mod.convnext_params(loaded, cfg)
    assert params["stem_k"].shape == (4, 4, 3, 4)

# heavy (jit compiles / torch oracles) -- excluded from the fast path
# (pytest -m "not slow"; see README Testing strategy)
pytestmark = pytest.mark.slow
