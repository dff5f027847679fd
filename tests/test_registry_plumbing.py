"""Per-family prompt/image-token plumbing through the registry.

Covers VERDICT round-1 weak #4/#5: vicuna-style tokenizers fragment the
'<image>' placeholder string, so the prompt encoder must split-splice
(reference mgm/mm_utils.tokenizer_image_token + constants.py:8), and the
batch builders must assert the tokenizer-derived img_start against the
model config.
"""

import numpy as np
import pytest
from PIL import Image

from flmm_tpu.data import tokenization as tok
from flmm_tpu.registry import (
    FAMILY_SIZE_RULES, build_prompt, resolve_family_setup,
)


class FragmentingTokenizer:
    """Vicuna-style: no dedicated image token -- '<image>' fragments into
    per-character ids, like real SentencePiece vocabularies."""

    def encode(self, text, add_special_tokens=False):
        ids = [1] if add_special_tokens else []
        for w in text.split():
            if any(c in w for c in "<>|"):
                ids += [200 + (ord(c) % 50) for c in w]
            else:
                ids.append(10 + (hash(w) % 150))
        return ids


class DeepseekTokenizer:
    """Has a dedicated single-id '<image_placeholder>' token."""

    IMAGE_ID = 7

    def encode(self, text, add_special_tokens=False):
        ids = [1] if add_special_tokens else []
        buf = text
        while "<image_placeholder>" in buf:
            pre, buf = buf.split("<image_placeholder>", 1)
            ids += [10 + (hash(w) % 150) for w in pre.split()]
            ids.append(self.IMAGE_ID)
        ids += [10 + (hash(w) % 150) for w in buf.split()]
        return ids


def test_fragmenting_tokenizer_prompt():
    t = FragmentingTokenizer()
    # the raw placeholder string really does fragment
    assert len(t.encode("<image>", add_special_tokens=False)) > 1
    rp = tok.encode_multimodal_prompt(
        t, tok.TEMPLATES["vicuna"], "<image>\nPlease describe.", "<image>",
        n_img=6)
    assert rp.n_img == 6
    block = rp.ids[rp.img_start:rp.img_start + 6]
    assert block == [rp.image_token_id] * 6
    assert rp.image_token_id == 0  # sentinel, never the fragmented pieces
    # text before/after the block is the split-tokenised pre/post
    pre = t.encode(
        tok.PromptSpec(tok.TEMPLATES["vicuna"],
                       "<image>\nPlease describe.").render().split(
                           "<image>")[0], add_special_tokens=True)
    assert rp.ids[:rp.img_start] == pre


def test_deepseek_tokenizer_prompt_single_token():
    t = DeepseekTokenizer()
    rp = tok.encode_multimodal_prompt(
        t, tok.TEMPLATES["deepseek"],
        "<image_placeholder>Please describe.", "<image_placeholder>",
        n_img=4)
    assert rp.image_token_id == DeepseekTokenizer.IMAGE_ID
    assert rp.ids[rp.img_start:rp.img_start + 4] == [7, 7, 7, 7]


@pytest.mark.parametrize("family", ["llava", "hpt", "mgm"])
def test_resolve_family_setup_fragmenting(family):
    preset = {"llava": "1_5_7b", "hpt": "air", "mgm": "gemma_2b"}[family]
    cfg, rp, spec_kwargs = resolve_family_setup(
        family, preset, FragmentingTokenizer())
    base = cfg.base if hasattr(cfg, "base") else cfg
    # config img_start rebuilt to the tokenizer-derived truth
    assert base.img_start == rp.img_start
    assert spec_kwargs["expected_img_start"] == rp.img_start
    assert spec_kwargs["processor"].size_rule == FAMILY_SIZE_RULES[family]


def test_resolve_family_setup_deepseek_aligns_128():
    # flash-capture presets (img_start % 128 == 0) get 128-alignment
    cfg, rp, spec_kwargs = resolve_family_setup(
        "deepseek_vl", "1_3b", DeepseekTokenizer(), img_start=128)
    assert cfg.img_start == 128
    assert cfg.llm.use_flash_capture
    assert spec_kwargs["align_image_block"] == 128
    assert spec_kwargs["expected_img_start"] == 128
    assert rp.img_start < 128  # raw prompt offset; builder pads the rest
    # the default short-sequence recipe keeps the raw tokenizer layout
    cfg2, rp2, sk2 = resolve_family_setup(
        "deepseek_vl", "1_3b", DeepseekTokenizer())
    assert cfg2.img_start == rp2.img_start
    assert sk2["align_image_block"] is None


def test_mgm_hd_flash_capture_gate():
    """MGM-HD (5x576 image tokens) routes through the flash-capture
    kernel iff the image block is 128-aligned (same contract as
    configs/deepseek_vl); single-crop presets keep the eager layout."""
    from flmm_tpu.registry import get_config

    hd = get_config("mgm", "vicuna_7b_hd", img_start=128)
    assert hd.base.llm.use_flash_capture
    hd_raw = get_config("mgm", "vicuna_7b_hd")  # released offset 35
    assert not hd_raw.base.llm.use_flash_capture
    single = get_config("mgm", "gemma_2b", img_start=128)
    assert not single.base.llm.use_flash_capture


def _mini_sample(rp, n_extra=6):
    ids = list(rp.ids) + [50] * n_extra
    mask_ids = [-1] * len(rp.ids) + [0] * n_extra
    img = Image.new("RGB", (64, 48))
    return {
        "input_ids": np.asarray(ids, np.int32),
        "mask_ids": np.asarray(mask_ids, np.int32),
        "spans": [(len(rp.ids), len(rp.ids) + n_extra)],
        "masks": np.ones((1, 48, 64), np.uint8),
        "image": img,
        "img_start": rp.img_start,
        "num_img_tokens": rp.n_img,
    }


def test_build_batch_asserts_img_start_drift():
    from flmm_tpu.data.collate import BatchSpec, build_batch
    from flmm_tpu.data.processors import ProcessorConfig

    t = DeepseekTokenizer()
    rp = build_prompt("deepseek_vl", t, n_img=8)
    spec = BatchSpec(seq_len=160, max_masks=2, coarse_hw=(8, 8),
                     sam_size=64, prompt_size=16,
                     processor=ProcessorConfig(size=32),
                     align_image_block=128, expected_img_start=128)
    batch = build_batch([_mini_sample(rp)], spec)
    # image block landed at 128 and pads are masked out
    assert batch["input_ids"][0, 128] == rp.image_token_id
    assert not batch["attn_mask"][0, rp.img_start:128].any()
    # drifted config: must raise, not silently scatter
    bad = BatchSpec(seq_len=160, max_masks=2, coarse_hw=(8, 8),
                    sam_size=64, prompt_size=16,
                    processor=ProcessorConfig(size=32),
                    align_image_block=128, expected_img_start=256)
    with pytest.raises(AssertionError, match="drifted"):
        build_batch([_mini_sample(rp)], bad)


def test_hpt15_fit_box_meta_golden():
    """size_rule='hpt15' matches reference hpt_processors.py:138-192 on a
    table of odd aspect ratios."""
    from flmm_tpu.data.processors import (
        ProcessorConfig, square_pad_preprocess,
    )

    tar = 448
    for (w, h) in [(640, 480), (111, 999), (999, 111), (448, 448),
                   (450, 449), (13, 1000), (1000, 13), (500, 375)]:
        # reference formula (tar_h == tar_w == 448)
        if tar / h < tar / w:
            rh, rw = tar, int(w * tar / h)
        else:
            rh, rw = int(h * tar / w), tar
        size = max(rh, rw)
        pad_h, pad_w = size - rh, size - rw
        want = {
            "padding": {"before_height": pad_h // 2,
                        "after_height": pad_h - pad_h // 2,
                        "before_width": pad_w // 2,
                        "after_width": pad_w - pad_w // 2},
            "image_shape": {"height": rh, "width": rw},
            "padded_shape": {"height": size, "width": size},
        }
        got = square_pad_preprocess(
            Image.new("RGB", (w, h)),
            ProcessorConfig(size=tar, size_rule="hpt15"))
        assert got["meta"] == want, (w, h)
        assert got["pixel_values"].shape == (tar, tar, 3)


def test_concat_chunking_scores_every_expression():
    from flmm_tpu.data.refcoco import refcoco_to_sample

    t = DeepseekTokenizer()
    rp = build_prompt("deepseek_vl", t, n_img=4)
    item = {
        "expressions": [f"expr number {i}" for i in range(11)],
        "masks": [np.full((8, 8), i, np.uint8) for i in range(11)],
        "image": Image.new("RGB", (32, 32)),
        "file_name": "x.jpg",
    }
    out = refcoco_to_sample(item, t, rp, concat=True, max_expressions=4)
    # 11 expressions, chunks of 4 -> 3 samples covering all exactly once
    assert len(out) == 3
    assert [s["masks"].shape[0] for s in out] == [4, 4, 3]
    seen = np.concatenate([np.unique(s["masks"]) for s in out])
    assert sorted(seen.tolist()) == list(range(11))
    # split mode unaffected
    out_split = refcoco_to_sample(item, t, rp, concat=False)
    assert len(out_split) == 11


def test_resolve_family_setup_sam_size():
    """--sam-size threads the reduced-resolution SAM schedule through the
    config AND the batch-spec geometry consistently."""
    cfg, rp, spec_kwargs = resolve_family_setup(
        "deepseek_vl", "1_3b", DeepseekTokenizer(), sam_size=448)
    assert cfg.sam.encoder.img_size == 448
    assert cfg.sam.prompt.image_embedding_size == 28
    assert cfg.sam.prompt.input_image_size == 448
    assert cfg.sam.prompt_size == 112
    assert spec_kwargs["sam_size"] == 448
    assert spec_kwargs["prompt_size"] == 112
    # default: native geometry, spec matches
    cfg, _, sk = resolve_family_setup(
        "deepseek_vl", "1_3b", DeepseekTokenizer())
    assert sk["sam_size"] == cfg.sam.encoder.img_size == 1024
    assert sk["prompt_size"] == cfg.sam.prompt_size == 256


@pytest.mark.parametrize("family,preset", [
    ("llava", "tiny"), ("llava_next", "tiny"), ("mgm", "tiny"),
    ("hpt", "tiny"), ("deepseek_vl", "tiny"),
])
def test_with_sam_size_every_family(family, preset):
    """with_sam_size threads consistently through every family's config
    shape (wrapper configs keep their .base geometry in sync)."""
    from flmm_tpu.registry import get_config, with_sam_size

    cfg = get_config(family, preset)
    out = with_sam_size(cfg, 448)
    base = out.base if hasattr(out, "base") else out
    assert base.sam.encoder.img_size == 448
    grid = 448 // base.sam.encoder.patch_size
    assert base.sam.prompt.image_embedding_size == grid
    assert base.sam.prompt.input_image_size == 448
    assert base.sam.prompt_size == 4 * grid
