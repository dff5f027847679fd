"""Grounder API smoke tests on the tiny config (answer/ground/visual CoT)."""

import numpy as np
import pytest
import jax
from PIL import Image

from flmm_tpu.configs.deepseek_vl import tiny
from flmm_tpu.data import tokenization as tok
from flmm_tpu.data.processors import ProcessorConfig
from flmm_tpu.generation.api import Grounder, mask2box_scaled
from flmm_tpu.models.frozen import grounding as model
from tests.test_data import IMAGE_TOKEN_ID, FakeTokenizer


class DecodingFakeTokenizer(FakeTokenizer):
    def decode(self, ids, **kw):
        return " ".join(f"tok{i}" for i in ids)


@pytest.fixture(scope="module")
def grounder():
    tokenizer = DecodingFakeTokenizer()
    # determine img_start under the template with 64 placeholders
    spec = tok.PromptSpec(tok.TEMPLATES["deepseek"], "<image_placeholder>" * 64)
    ids = tok.encode_prompt(tokenizer, spec)
    start, n = tok.find_image_block(ids, IMAGE_TOKEN_ID)
    assert n == 64
    cfg = tiny(img_start=start)
    params = model.init_params(cfg, jax.random.key(0))
    return Grounder(
        cfg=cfg, params=params, tokenizer=tokenizer,
        prompt_template=tok.TEMPLATES["deepseek"],
        processor=ProcessorConfig(size=cfg.input_size),
        max_new_tokens=6, max_thought_tokens=4,
    )


def _image():
    rng = np.random.default_rng(0)
    return Image.fromarray(
        rng.integers(0, 255, (60, 90, 3), np.uint8), "RGB")


def test_mask2box_scaled():
    m = np.zeros((50, 50), bool)
    m[10:30, 20:40] = True
    assert mask2box_scaled(m, 1.0) == (20, 10, 39, 29)
    x0, y0, x1, y1 = mask2box_scaled(m, 2.0)
    assert x0 < 20 and y0 < 10 and x1 > 39 and y1 > 29
    assert mask2box_scaled(np.zeros((5, 7), bool)) == (0, 0, 7, 5)


def test_answer_and_ground(grounder):
    img = _image()
    out = grounder.answer(img, "what is this?")
    assert out["attention_maps"].shape[0] == grounder.cfg.llm.num_layers
    t = out["attention_maps"].shape[2]
    assert t >= 1
    coarse, masks = grounder.ground(out, [(0, t)])
    assert masks.shape == (1, 60, 90)
    assert masks.dtype == np.uint8


def test_visual_cot_v1(grounder):
    thought, bbox, answer, mask = grounder.visual_cot_v1(_image(), "why?")
    assert isinstance(answer, str)
    x0, y0, x1, y1 = bbox
    assert 0 <= x0 < x1 <= 90 and 0 <= y0 < y1 <= 60
    assert mask.shape == (60, 90)


def test_visual_cot_v2_and_v3(grounder):
    img = _image()
    _, bbox, answer, mask = grounder.visual_cot_v2(img, "where?")
    assert isinstance(answer, str) and mask.shape == (60, 90)
    _, bbox3, answer3, _ = grounder.visual_cot_v3(img, "what?")
    assert bbox3 == (0, 0, 90, 60)
    assert isinstance(answer3, str)


def test_anyres_grounder_answer_and_ground():
    """AnyresGrounder: KV-decode chat + grounding over the packed anyres
    prompt (masked image-block pads, pad-skipping positions)."""
    from flmm_tpu.configs.llava_next import tiny_llava_next
    from flmm_tpu.generation.api import AnyresGrounder
    from flmm_tpu.models.frozen import llava_next as mln

    tokenizer = DecodingFakeTokenizer()
    cfg0 = tiny_llava_next()
    n_img = cfg0.n_img_max
    spec = tok.PromptSpec(tok.TEMPLATES["vicuna"],
                          "<image_placeholder>" * n_img)
    ids = tok.encode_prompt(tokenizer, spec)
    start, n = tok.find_image_block(ids, IMAGE_TOKEN_ID)
    assert n == n_img
    cfg = tiny_llava_next(img_start=start)
    params = mln.init_params(cfg, jax.random.key(0))
    g = AnyresGrounder(
        cfg=cfg, params=params, tokenizer=tokenizer,
        prompt_template=tok.TEMPLATES["vicuna"], max_new_tokens=5,
    )
    img = _image()
    out = g.answer(img, "what is this?")
    L, H = cfg.base.llm.num_layers, cfg.base.llm.num_heads
    assert out["attention_maps"].shape[:2] == (L, H)
    assert out["attention_maps"].shape[3] == n_img
    t = out["attention_maps"].shape[2]
    assert t >= 1
    # pad slots of the packed block carry (near-)zero attention
    pad_cols = ~np.asarray(out["fine_valid"])  # fine pads only
    coarse, masks = g.ground(out, [(0, t)])
    assert masks.shape == (1, 60, 90)
    assert masks.dtype == np.uint8
    assert np.isfinite(coarse).all()


@pytest.mark.parametrize("hd", [False, True])
def test_mgm_grounder_answer_and_ground(hd):
    """MGMGrounder: base decode path (contiguous image block) + dual-tower
    encoding + HD tile re-assembly in ground()."""
    from flmm_tpu.configs.mgm import tiny_mgm
    from flmm_tpu.generation.api import MGMGrounder
    from flmm_tpu.models.frozen import mgm as mgm_model

    tokenizer = DecodingFakeTokenizer()
    cfg0 = tiny_mgm(hd=hd)
    n_img = cfg0.base.num_img_tokens
    spec = tok.PromptSpec(tok.TEMPLATES["vicuna"],
                          "<image_placeholder>" * n_img)
    ids = tok.encode_prompt(tokenizer, spec)
    start, n = tok.find_image_block(ids, IMAGE_TOKEN_ID)
    assert n == n_img
    cfg = tiny_mgm(img_start=start, hd=hd)
    params = mgm_model.init_params(cfg, jax.random.key(0))
    g = MGMGrounder(
        cfg=cfg, params=params, tokenizer=tokenizer,
        prompt_template=tok.TEMPLATES["vicuna"], max_new_tokens=5,
    )
    img = _image()
    out = g.answer(img, "what is this?")
    L, H = cfg.base.llm.num_layers, cfg.base.llm.num_heads
    assert out["attention_maps"].shape[:2] == (L, H)
    assert out["attention_maps"].shape[3] == n_img
    t = out["attention_maps"].shape[2]
    coarse, masks = g.ground(out, [(0, t)])
    assert masks.shape == (1, 60, 90)
    assert np.isfinite(coarse).all()


def test_anyres_grounder_visual_cot():
    from flmm_tpu.configs.llava_next import tiny_llava_next
    from flmm_tpu.generation.api import AnyresGrounder
    from flmm_tpu.models.frozen import llava_next as mln

    tokenizer = DecodingFakeTokenizer()
    cfg0 = tiny_llava_next()
    n_img = cfg0.n_img_max
    spec = tok.PromptSpec(tok.TEMPLATES["vicuna"],
                          "<image_placeholder>" * n_img)
    ids = tok.encode_prompt(tokenizer, spec)
    start, _ = tok.find_image_block(ids, IMAGE_TOKEN_ID)
    cfg = tiny_llava_next(img_start=start)
    params = mln.init_params(cfg, jax.random.key(0))
    g = AnyresGrounder(
        cfg=cfg, params=params, tokenizer=tokenizer,
        prompt_template=tok.TEMPLATES["vicuna"], max_new_tokens=4,
    )
    img = _image()
    _, bbox, final, mask = g.visual_cot_v2(img, "where?")
    x0, y0, x1, y1 = bbox
    assert 0 <= x0 < x1 <= 90 and 0 <= y0 < y1 <= 60
    assert isinstance(final, str)
    assert mask.shape == (60, 90)
    _, bbox3, final3, _ = g.visual_cot_v3(img, "what?")
    assert bbox3 == (0, 0, 90, 60)
    assert isinstance(final3, str)


class FragmentingFakeTokenizer(DecodingFakeTokenizer):
    """No single id for '<image>': the placeholder fragments into several
    pieces, as real vicuna/gemma tokenizers do.  The grounders must use
    the split-splice convention (encode_with_images) -- encoding the
    placeholder string and scanning for one id would break here."""

    def encode(self, text, add_special_tokens=False):
        ids = [1] if add_special_tokens else []
        pieces = text.replace("<", " < ").replace(">", " > ").split()
        ids += [10 + (hash(w) % 200) for w in pieces]
        return ids


def test_grounder_with_fragmenting_tokenizer():
    """answer/ground work when the image token has no single-id mapping:
    the sentinel id 0 is spliced and the block start is tracked, never
    scanned (round-2 advisor finding)."""
    tokzr = FragmentingFakeTokenizer()
    assert len(tokzr.encode("<image>", add_special_tokens=False)) > 1
    cfg = tiny()
    params = model.init_params(cfg, jax.random.key(0))
    g = Grounder(
        cfg=cfg, params=params, tokenizer=tokzr,
        prompt_template=tok.TEMPLATES["vicuna"], image_token="<image>",
        processor=ProcessorConfig(size=cfg.input_size), max_new_tokens=4,
    )
    assert g.image_token_id == 0  # sentinel, not a fragment piece
    ids, starts = g._encode_content("<image>what?")
    n = cfg.num_img_tokens
    assert list(ids[starts[0]:starts[0] + n]) == [0] * n
    out = g.answer(_image(), "what is this?")
    assert out["attention_maps"].shape[3] == n
    t = out["attention_maps"].shape[2]
    _, masks = g.ground(out, [(0, t)])
    assert masks.shape == (1, 60, 90)

# heavy (jit compiles / torch oracles) -- excluded from the fast path
# (pytest -m "not slow"; see README Testing strategy)
pytestmark = pytest.mark.slow
