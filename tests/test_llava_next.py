"""LLaVA-Next anyres: layout math, batch assembly, e2e tiny model."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from flmm_tpu.configs.llava_next import tiny_anyres_spec, tiny_llava_next
from flmm_tpu.data.collate import BatchSpec
from flmm_tpu.data.llava_next import (
    AnyresSpec, anyres_process, block_layout, build_anyres_batch,
    select_best_resolution, unpad_feature_hw,
)
from flmm_tpu.data.processors import ProcessorConfig
from flmm_tpu.models.frozen import llava_next as model


class TestAnyresMath:
    def test_select_best_resolution_matches_hf(self):
        from transformers.image_processing_utils import (
            select_best_resolution as hf_sbr,
        )
        pins = [[336, 672], [672, 336], [672, 672], [1008, 336], [336, 1008]]
        rng = np.random.default_rng(0)
        for _ in range(30):
            oh, ow = int(rng.integers(50, 2000)), int(rng.integers(50, 2000))
            assert select_best_resolution((oh, ow), pins) == tuple(
                hf_sbr((oh, ow), pins))

    def test_unpad_matches_reference_math(self):
        import torch

        def ref_unpad_hw(orig, canvas):
            t = torch.zeros((1,) + tuple(canvas))
            oh, ow = orig
            ch, cw = canvas
            if ow / oh > cw / ch:
                new_h = int(oh * (cw / ow))
                p = (ch - new_h) // 2
                t = t[:, p:ch - p]
            else:
                new_w = int(ow * (ch / oh))
                p = (cw - new_w) // 2
                t = t[:, :, p:cw - p]
            return tuple(t.shape[1:])

        rng = np.random.default_rng(1)
        for _ in range(30):
            orig = (int(rng.integers(30, 800)), int(rng.integers(30, 800)))
            canvas = (24 * int(rng.integers(1, 4)), 24 * int(rng.integers(1, 4)))
            fh, fw, _, _ = unpad_feature_hw(orig, canvas)
            assert (fh, fw) == ref_unpad_hw(orig, canvas)

    def test_block_layout_roundtrip(self):
        spec = tiny_anyres_spec()
        # wide image -> (32, 64) resolution -> grid (1, 2), canvas 4x8
        proc_grid = (1, 2)
        fh, fw, pr, pc = unpad_feature_hw((40, 100), (4, 8))
        lo = block_layout(spec, proc_grid, (fh, fw), (pr, pc))
        g2 = spec.grid ** 2
        # base slots identity
        np.testing.assert_array_equal(lo["block_index"][:g2], np.arange(g2))
        # newline slots appear once per fine row
        newline_idx = g2 * (1 + spec.max_tiles)
        assert (lo["block_index"] == newline_idx).sum() == fh
        # fine gather points inside the block and respects validity
        fg = lo["fine_gather"].reshape(spec.max_fine_hw)
        fv = lo["fine_valid"].reshape(spec.max_fine_hw)
        assert fv[:fh, :fw].all() and not fv[fh:].any() and not fv[:, fw:].any()
        assert (fg[fv] >= g2).all()
        assert (fg[fv] < g2 + fh * (fw + 1)).all()

    def test_anyres_process_shapes(self):
        spec = tiny_anyres_spec()
        img = Image.new("RGB", (100, 40), (10, 20, 30))
        out = anyres_process(img, spec)
        assert out["grid"] == (1, 2)
        assert out["tiles"].shape == (2, 32, 32, 3)
        assert out["base"].shape == (32, 32, 3)
        fh, fw = out["fine_hw"]
        assert fh <= 4 and fw == 8


@pytest.fixture(scope="module")
def anyres_batch():
    from tests.test_data import FakeTokenizer, IMAGE_TOKEN_ID
    from flmm_tpu.data import tokenization as tok

    spec = tiny_anyres_spec()
    t = FakeTokenizer()
    prompt_spec = tok.PromptSpec(
        tok.TEMPLATES["vicuna"],
        "<image_placeholder>" * spec.n_img_max + " describe",
    )
    prompt_ids = tok.encode_prompt(t, prompt_spec)
    img_start, n = tok.find_image_block(prompt_ids, IMAGE_TOKEN_ID)
    assert n == spec.n_img_max

    samples = []
    rng = np.random.default_rng(0)
    for i, (w, h) in enumerate([(100, 40), (50, 90)]):
        mask = np.zeros((h, w), np.uint8)
        mask[h // 4:h // 2, w // 4:w // 2] = 1
        segs = [{"utterance": "a red thing", "has_mask": True}]
        stream = tok.caption_stream(t, segs, len(prompt_ids))
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
    bspec = BatchSpec(seq_len=img_start + spec.n_img_max + 12, max_masks=2,
                      text_per_mask=4, coarse_hw=(16, 16), sam_size=128,
                      prompt_size=32, processor=ProcessorConfig(size=32))
    return build_anyres_batch(samples, bspec, spec), img_start


def test_anyres_batch_invariants(anyres_batch):
    batch, img_start = anyres_batch
    spec = tiny_anyres_spec()
    # positions skip masked image-pad slots: caption positions contiguous
    pos = batch["position_ids"][0]
    valid = batch["attn_mask"][0]
    vp = pos[valid]
    assert (np.diff(vp) == 1).all()
    # block_valid embedded into attn_mask at the image block
    nb = batch["block_valid"][0].sum()
    assert valid[img_start:img_start + spec.n_img_max].sum() == nb


def test_llava_next_tiny_e2e(anyres_batch):
    batch, img_start = anyres_batch
    cfg = tiny_llava_next(img_start=img_start)
    params = model.init_params(cfg, jax.random.key(0))
    mb = {k: jax.tree.map(jnp.asarray, v) for k, v in batch.items()
          if k != "infos"}

    def loss(trainable):
        p = {"frozen": params["frozen"], "trainable": trainable}
        return model.loss_fn(p, cfg, mb)[0]

    val, grads = jax.jit(jax.value_and_grad(loss))(params["trainable"])
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(grads))


def test_anyres_decode_capture_matches_forward(anyres_batch):
    """KV-decode prefill over the packed anyres prompt (masked pad slots
    in the image block, pad-skipping position ids) reproduces the
    training forward's raw attention rows -- decode-time grounding for
    the non-contiguous-feature families (VERDICT round-1 item 9)."""
    import jax
    import jax.numpy as jnp

    from flmm_tpu.configs.llava_next import tiny_llava_next
    from flmm_tpu.generation.decode import DecodeConfig, decode, prefill
    from flmm_tpu.models.frozen import llava_next as model
    from flmm_tpu.models.llm import decoder as llm

    batch, img_start = anyres_batch
    cfg = tiny_llava_next(img_start=img_start)
    params = model.init_params(cfg, jax.random.key(0))
    batch = jax.tree.map(jnp.asarray, batch)

    embeds = model.pack_embeds(params, cfg, batch)
    gcfg = cfg.base

    b = 0
    S = embeds.shape[1]
    state = prefill(
        params["frozen"]["llm"], gcfg.llm, embeds[b], gcfg.img_start,
        cfg.n_img_max, max_new_tokens=4,
        attn_mask=batch["attn_mask"][b],
        position_ids=batch["position_ids"][b])
    out = decode(params["frozen"]["llm"], gcfg.llm, state,
                 DecodeConfig(max_new_tokens=4), gcfg.img_start,
                 cfg.n_img_max)
    assert np.asarray(out["tokens"]).shape == (4,)

    # prompt capture rows == raw full-forward attention
    full = llm.forward_capture(
        params["frozen"]["llm"], gcfg.llm, embeds[b:b + 1],
        batch["attn_mask"][b:b + 1], img_start=gcfg.img_start,
        n_img=cfg.n_img_max, position_ids=batch["position_ids"][b:b + 1])
    want = np.asarray(full["attn"])[0]  # (L, H, S, n_img)
    got = np.asarray(state["attn"])
    np.testing.assert_allclose(got, want, atol=3e-5)

# heavy (jit compiles / torch oracles) -- excluded from the fast path
# (pytest -m "not slow"; see README Testing strategy)
pytestmark = pytest.mark.slow
