"""High-level grounding/generation API.

Re-creates the reference's interactive surface on the TPU stack:

* ``answer``: free-form generation caching per-step text->image attention
  and layer-weighted hidden states (reference frozen_deepseek_vl.py:514).
* ``ground``: mask arbitrary token spans of a finished generation
  (frozen_deepseek_vl.py:568).
* ``visual_cot_v1/v2/v3``: think -> ground -> crop -> re-answer pipelines
  (frozen_deepseek_vl.py:271,374,478).
* ``mask2box`` with scale expansion (frozen_deepseek_vl.py:458-475).

Host code orchestrates; the heavy steps (prefill, decode, tower, U-Net,
SAM) are jitted functions cached per input shape.
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from flmm_tpu.data import geometry
from flmm_tpu.data.processors import ProcessorConfig, sam_preprocess, \
    square_pad_preprocess
from flmm_tpu.data import tokenization as tok
from flmm_tpu.evalsuite.runner import sam_logits_to_masks
from flmm_tpu.generation import decode as dec
from flmm_tpu.models.frozen.grounding import GroundingConfig, _project
from flmm_tpu.models.llm import decoder as llm
from flmm_tpu.models.mask_head import refiner as sam_refiner
from flmm_tpu.models.mask_head import unet
from flmm_tpu.models.mask_head.unet import output_hw
from flmm_tpu.models.sam import image_encoder as sam_encoder
from flmm_tpu.models.vision import vit


def make_grounder(family: str, cfg, params, tokenizer, **kw):
    """Family-correct grounder with the family's registry template +
    image token: AnyresGrounder for llava_next, MGMGrounder for mgm(-HD),
    the base Grounder otherwise.  Extra kwargs are filtered to the fields
    the selected class supports (e.g. ``max_thought_tokens`` only exists
    on the base/MGM CoT surface).  Shared by the demo and Visual-CoT CLIs
    so their ``--family`` dispatch cannot drift."""
    from flmm_tpu.data.processors import ProcessorConfig
    from flmm_tpu.registry import (
        FAMILY_IMAGE_TOKENS, FAMILY_SIZE_RULES, FAMILY_TEMPLATES,
    )

    template = tok.TEMPLATES[FAMILY_TEMPLATES[family]]
    image_token = FAMILY_IMAGE_TOKENS[family]
    base = cfg.base if hasattr(cfg, "base") else cfg
    if family == "llava_next":
        cls, cfg_arg = AnyresGrounder, cfg
    elif family == "mgm":
        cls, cfg_arg = MGMGrounder, cfg
        kw.setdefault("processor", ProcessorConfig(
            size=base.input_size, size_rule=FAMILY_SIZE_RULES[family]))
    else:
        cls, cfg_arg = Grounder, base
        kw.setdefault("processor", ProcessorConfig(
            size=base.input_size, size_rule=FAMILY_SIZE_RULES[family]))
    fields = {f.name for f in dataclasses.fields(cls)}
    dropped = sorted(k for k in kw if k not in fields)
    if dropped:
        warnings.warn(
            f"make_grounder: {cls.__name__} (family {family!r}) does not "
            f"support {dropped}; these arguments are ignored", stacklevel=2)
    kw = {k: v for k, v in kw.items() if k in fields}
    return cls(cfg=cfg_arg, params=params, tokenizer=tokenizer,
               prompt_template=template, image_token=image_token, **kw)


def _sentinel_image_token_id(tokenizer, image_token: str) -> int:
    """The id spliced into the prompt at image slots: the token's own id
    when the tokenizer maps it to a single token (DeepSeek-VL's
    ``<image_placeholder>``), else the 0 sentinel -- real vicuna/gemma
    tokenizers fragment ``<image>`` into several pieces, and the spliced
    embedding is overwritten by projected image features anyway (mirrors
    tokenization.encode_multimodal_prompt)."""
    enc = tokenizer.encode(image_token, add_special_tokens=False)
    return enc[-1] if len(enc) == 1 else 0


def encode_with_images(tokenizer, template: dict, content: str,
                       image_token: str, n_img: int, image_token_id: int,
                       suffix: str = "",
                       n_markers: int | None = 1) -> tuple[np.ndarray, list[int]]:
    """Tokenise a template-rendered prompt containing one ``image_token``
    marker per image, splicing ``n_img`` sentinel ids at each marker.

    This is the reference's ``tokenizer_image_token`` split-splice
    (mgm/mm_utils.py, constants.py IMAGE_TOKEN_INDEX) generalised to any
    marker count: the placeholder string never reaches the tokenizer, so
    tokenizers that would fragment it (``<image>`` under vicuna/gemma)
    still produce a clean contiguous image block.  ``suffix`` is appended
    after the rendered template (forced generation prefixes, reference
    visual_cot_v1:252).  ``n_markers`` bounds the split (default 1, the
    single-image grounding convention): a *question* containing the
    literal marker string is then tokenised as text instead of being
    mis-spliced into an extra image block.  Pass ``None`` for unbounded
    multi-image prompts.  Returns ``(ids, starts)`` with one block start
    per marker.
    """
    rendered = tok.PromptSpec(template, content).render() + suffix
    parts = (rendered.split(image_token) if n_markers is None
             else rendered.split(image_token, n_markers))
    if len(parts) < 2:
        raise ValueError(f"prompt does not contain {image_token!r}")
    ids: list[int] = list(tokenizer.encode(parts[0], add_special_tokens=True))
    starts: list[int] = []
    for part in parts[1:]:
        starts.append(len(ids))
        ids += [image_token_id] * n_img
        ids += list(tokenizer.encode(part, add_special_tokens=False))
    return np.asarray(ids, np.int32), starts


def mask2box_scaled(mask: np.ndarray, scale: float = 1.0) -> tuple:
    """Box of a binary mask with centre-scale expansion (reference
    frozen_deepseek_vl.py:458-475); returns the full image box if empty."""
    h, w = mask.shape
    ys, xs = np.where(mask)
    if len(ys) == 0:
        return 0, 0, w, h
    y0, y1 = ys.min(), ys.max()
    x0, x1 = xs.min(), xs.max()
    yd, xd = max((y1 - y0) / 2, 8), max((x1 - x0) / 2, 8)
    yc, xc = (y1 + y0) / 2, (x1 + x0) / 2
    x0, x1 = max(0, xc - xd * scale), min(w, xc + xd * scale)
    y0, y1 = max(0, yc - yd * scale), min(h, yc + yd * scale)
    return int(x0), int(y0), int(x1), int(y1)


@dataclasses.dataclass
class Grounder:
    cfg: GroundingConfig
    params: dict
    tokenizer: Any
    prompt_template: dict
    image_token: str = "<image_placeholder>"
    processor: ProcessorConfig = dataclasses.field(
        default_factory=ProcessorConfig
    )
    max_new_tokens: int = 64
    max_thought_tokens: int = 16
    box_scale: float = 1.0
    use_sam: bool = True
    additional_prompt: str = " Please briefly answer the question."

    def __post_init__(self):
        self.image_token_id = _sentinel_image_token_id(
            self.tokenizer, self.image_token)
        stop_words = list(self.prompt_template.get("STOP_WORDS", []))
        self.stop_ids = tuple(
            self.tokenizer.encode(w, add_special_tokens=False)[-1]
            for w in stop_words
        )
        # thought generation also stops at '.' (reference :252)
        dot = self.tokenizer.encode(".", add_special_tokens=False)
        self.thought_stop_ids = self.stop_ids + ((dot[-1],) if dot else ())
        self._jit_cache: dict = {}

    # -- jitted building blocks -------------------------------------------

    def _embed_tokens_with_image(self, input_ids: np.ndarray,
                                 pixel_list: list[np.ndarray],
                                 starts: list[int]) -> jnp.ndarray:
        """Token embeddings with image features scattered at the block
        starts (supports the multi-image round-2 CoT conversation)."""
        cfg, fro = self.cfg, self.params["frozen"]
        ids = jnp.asarray(input_ids)
        embeds = llm.embed_tokens(fro["llm"], cfg.llm, ids).astype(cfg.dtype)
        assert len(starts) == len(pixel_list), (starts, len(pixel_list))
        feats = self._tower(jnp.asarray(np.stack(pixel_list)))
        for i, start in enumerate(starts):
            embeds = jax.lax.dynamic_update_slice(
                embeds, feats[i].astype(cfg.dtype), (int(start), 0)
            )
        return embeds

    def _tower(self, pixels: jnp.ndarray) -> jnp.ndarray:
        cfg, fro = self.cfg, self.params["frozen"]
        feats = vit.forward(fro["vision"], cfg.vision, pixels,
                            select_layer=cfg.vision_select_layer)
        if cfg.vision_drop_cls:
            feats = feats[:, 1:]
        return _project(feats, fro["projector"])

    def _generate(self, embeds: jnp.ndarray, img_start: int,
                  max_new: int, stop_ids: tuple):
        cfg = self.cfg
        lw = jax.nn.softmax(self.params["trainable"]["text_layer_weights"])
        key = ("gen", embeds.shape[0], max_new, stop_ids, img_start)
        if key not in self._jit_cache:
            def run(params, embeds, lw):
                state = dec.prefill(
                    params["frozen"]["llm"], cfg.llm, embeds, img_start,
                    cfg.num_img_tokens, max_new, layer_weights=lw,
                )
                out = dec.decode(
                    params["frozen"]["llm"], cfg.llm, state,
                    dec.DecodeConfig(max_new_tokens=max_new,
                                     stop_token_ids=stop_ids),
                    img_start, cfg.num_img_tokens, layer_weights=lw,
                )
                return {
                    "prompt_attn": state["attn"],
                    "prompt_hidden": state["hidden"],
                    "tokens": out["tokens"], "valid": out["valid"],
                    "attn": out["attn"], "hidden": out["hidden"],
                }
            self._jit_cache[key] = jax.jit(run)
        return self._jit_cache[key](self.params, embeds, lw)

    def _ground_maps(self, mask_attentions: jnp.ndarray,
                     text_embeds: jnp.ndarray, text_valid: jnp.ndarray,
                     sam_pixels: jnp.ndarray, geom: dict):
        """(M, C, g, g) merged attention maps -> coarse + SAM mask logits."""
        cfg = self.cfg
        tra = self.params["trainable"]
        key = ("ground", mask_attentions.shape)
        if key not in self._jit_cache:
            def run(params, attn, text, tvalid, sam_px, geom):
                tra = params["trainable"]
                coarse = unet.forward(
                    tra["unet"], cfg.unet, attn.transpose(0, 2, 3, 1)
                ).astype(jnp.float32)
                img_emb = sam_encoder.forward(
                    params["frozen"]["sam_encoder"], cfg.sam.encoder,
                    sam_px[None],
                )[0]
                refined = sam_refiner.refine(
                    tra["sam"], cfg.sam, img_emb, coarse, geom, text, tvalid
                )
                return coarse, refined["low_res_logits"]
            self._jit_cache[key] = jax.jit(run)
        return self._jit_cache[key](self.params, mask_attentions, text_embeds,
                                    text_valid, sam_pixels, geom)

    # -- public API --------------------------------------------------------

    def _prepare_image(self, image):
        proc = square_pad_preprocess(image, self.processor)
        sam = sam_preprocess(image, self.cfg.sam.encoder.img_size)
        return proc, sam

    def _encode_content(self, content: str, suffix: str = "",
                        n_markers: int = 1) -> tuple[np.ndarray, list[int]]:
        """Tokenise template-rendered ``content`` (one ``image_token``
        marker per image) via the split-splice convention.  ``n_markers``
        is the number of images the caller actually supplies — any
        further occurrences of the marker string (e.g. in a user
        question) are kept as plain text."""
        return encode_with_images(
            self.tokenizer, self.prompt_template, content, self.image_token,
            self.cfg.num_img_tokens, self.image_token_id, suffix=suffix,
            n_markers=n_markers)

    def answer(self, image, question: str, max_new_tokens: int | None = None,
               history: list | None = None):
        """Generate an answer while caching attention/hidden per step.

        ``history``: optional completed ``(question, answer)`` turns --
        the multi-turn conversation memory of the reference's
        ``_conversation`` helper (frozen_deepseek_vl.py:492-512): the
        image rides the FIRST user turn, follow-ups are text-only, each
        past turn closes with the template suffix."""
        if history:
            content = self.image_token + history[0][0]
            rendered = tok.PromptSpec(self.prompt_template, content).render()
            rendered += " " + history[0][1] + self.prompt_template.get(
                "SUFFIX", "")
            for q, a in history[1:]:
                rendered += self.prompt_template["INSTRUCTION"].format(
                    input=q)
                rendered += " " + a + self.prompt_template.get("SUFFIX", "")
            rendered += self.prompt_template["INSTRUCTION"].format(
                input=question)
            parts = rendered.split(self.image_token, 1)
            ids_l = list(self.tokenizer.encode(
                parts[0], add_special_tokens=True))
            starts = [len(ids_l)]
            ids_l += [self.image_token_id] * self.cfg.num_img_tokens
            ids_l += list(self.tokenizer.encode(
                parts[1], add_special_tokens=False))
            ids = np.asarray(ids_l, np.int32)
        else:
            ids, starts = self._encode_content(self.image_token + question)
        img_start = starts[0]
        proc, sam = self._prepare_image(image)
        embeds = self._embed_tokens_with_image(ids, [proc["pixel_values"]],
                                               starts)
        out = self._generate(
            embeds, img_start, max_new_tokens or self.max_new_tokens,
            self.stop_ids,
        )
        valid = np.asarray(out["valid"])
        tvalid = int(valid.sum())
        tokens = np.asarray(out["tokens"])[:tvalid]
        # reference drops the final (stop) token from the text (answer:562)
        text = self.tokenizer.decode(tokens[:-1]) if len(tokens) else ""
        return {
            "output_ids": tokens,
            "output_text": text,
            # (L, H, T, n) generated-token attention rows
            "attention_maps": np.asarray(out["attn"])[:tvalid].transpose(
                1, 2, 0, 3),
            "hidden_states": np.asarray(out["hidden"])[:tvalid],
            "meta_data": proc["meta"],
            "sam_pixels": sam["sam_pixel_values"],
            "sam_input_size": sam["sam_input_size"],
            "orig_size": (image.height, image.width),
        }

    def ground(self, answer_out: dict, positive_spans: list[tuple],
               max_text: int = 16):
        """Ground token spans of a generation; returns (M, oh, ow) masks."""
        cfg = self.cfg
        g = cfg.clip_shape
        attn = answer_out["attention_maps"]  # (L, H, T, n)
        hidden = answer_out["hidden_states"]  # (T, D)
        L, H, T, n = attn.shape
        maps = []
        texts = []
        tvalids = []
        tp = self.params["trainable"]["text_proj"]
        for lo, hi in positive_spans:
            assert hi > lo
            m = attn[:, :, lo:hi].mean(axis=2) if cfg.merge == "mean" else \
                attn[:, :, lo:hi].max(axis=2)
            maps.append(m.reshape(L * H, g, g))
            span_h = hidden[lo:hi]
            proj = span_h @ np.asarray(tp["w"]) + np.asarray(tp["b"])
            pad = np.zeros((max_text, proj.shape[-1]), np.float32)
            k = min(len(proj), max_text)
            pad[:k] = proj[:k]
            texts.append(pad)
            tvalids.append([True] * k + [False] * (max_text - k))
        maps = jnp.asarray(np.stack(maps), jnp.float32)
        texts = jnp.asarray(np.stack(texts), jnp.float32)
        tvalid = jnp.asarray(np.stack(tvalids))

        hc, wc = output_hw(cfg.unet, (g, g))
        cc = geometry.coarse_crop(answer_out["meta_data"], (hc, wc))
        nh, nw = answer_out["sam_input_size"]
        geom = {k: jnp.asarray(v, jnp.float32) for k, v in cc.items()}
        geom["sam_h"] = jnp.asarray(float(nh))
        geom["sam_w"] = jnp.asarray(float(nw))
        coarse, low_res = self._ground_maps(
            maps, texts, tvalid, jnp.asarray(answer_out["sam_pixels"]), geom
        )
        masks = sam_logits_to_masks(
            np.asarray(low_res), (nh, nw), answer_out["orig_size"],
            sam_size=cfg.sam.encoder.img_size,
            prompt_size=cfg.sam.prompt_size,
        )
        return np.asarray(coarse), masks

    # -- visual chain-of-thought ------------------------------------------

    def visual_cot_v1(self, image, question: str):
        """Think (<=16 tokens) -> ground the thought -> crop -> re-answer."""
        thought_q = (question + "First think which object in this image is "
                     "most relevant to the question.")
        ids, starts = self._encode_content(
            self.image_token + thought_q,
            suffix=" The object most relevant to the question is")
        img_start = starts[0]
        proc, sam = self._prepare_image(image)
        embeds = self._embed_tokens_with_image(ids, [proc["pixel_values"]],
                                               starts)
        out = self._generate(embeds, img_start, self.max_thought_tokens,
                             self.thought_stop_ids)
        valid = np.asarray(out["valid"])
        tvalid = max(1, int(valid.sum()))
        tokens = np.asarray(out["tokens"])[:tvalid]
        thought = self.tokenizer.decode(tokens[:-1]) if len(tokens) > 1 else ""
        answer_out = {
            "attention_maps": np.asarray(out["attn"])[:tvalid].transpose(
                1, 2, 0, 3),
            "hidden_states": np.asarray(out["hidden"])[:tvalid],
            "meta_data": proc["meta"],
            "sam_pixels": sam["sam_pixel_values"],
            "sam_input_size": sam["sam_input_size"],
            "orig_size": (image.height, image.width),
        }
        _, masks = self.ground(answer_out, [(0, tvalid)])
        mask = masks[0] > 0
        bbox = mask2box_scaled(mask, self.box_scale)
        final = self._two_image_answer(image, image.crop(bbox), question)
        return thought, bbox, final, mask

    def visual_cot_v2(self, image, question: str):
        """Ground the question tokens directly, then crop + re-answer."""
        ids, starts = self._encode_content(self.image_token + question)
        img_start = starts[0]
        q_start = img_start + self.cfg.num_img_tokens
        proc, sam = self._prepare_image(image)
        embeds = self._embed_tokens_with_image(ids, [proc["pixel_values"]],
                                               starts)
        # prefill-only pass: question attention rows come from the prompt
        state = self._generate(embeds, img_start, 1, self.stop_ids)
        answer_out = {
            "attention_maps": np.asarray(state["prompt_attn"]),  # (L,H,S,n)
            "hidden_states": np.asarray(state["prompt_hidden"]),
            "meta_data": proc["meta"],
            "sam_pixels": sam["sam_pixel_values"],
            "sam_input_size": sam["sam_input_size"],
            "orig_size": (image.height, image.width),
        }
        _, masks = self.ground(answer_out, [(q_start, len(ids))])
        mask = masks[0] > 0
        bbox = mask2box_scaled(mask, self.box_scale)
        final = self._two_image_answer(image, image.crop(bbox), question)
        return "", bbox, final, mask

    def visual_cot_v3(self, image, question: str):
        """No-CoT baseline: answer on the (cropped) image directly."""
        out = self.answer(image, question + self.additional_prompt)
        return "", (0, 0, image.width, image.height), out["output_text"], None

    def _two_image_answer(self, image, crop, question: str) -> str:
        """Round-2 conversation over [full image, crop] (reference
        visual_cot_v1:357-371)."""
        content = (
            f"{self.image_token}the whole image, "
            f"{self.image_token}the image region that "
            f"might help you answer the question: "
            f"{question}{self.additional_prompt}"
        )
        ids, starts = self._encode_content(content, n_markers=2)
        img_start = starts[0]
        px1 = square_pad_preprocess(image, self.processor)["pixel_values"]
        px2 = square_pad_preprocess(crop, self.processor)["pixel_values"]
        embeds = self._embed_tokens_with_image(ids, [px1, px2], starts)
        out = self._generate(embeds, img_start, self.max_new_tokens,
                             self.stop_ids)
        valid = np.asarray(out["valid"])
        tokens = np.asarray(out["tokens"])[:int(valid.sum())]
        return self.tokenizer.decode(tokens[:-1]) if len(tokens) else ""


@dataclasses.dataclass
class AnyresGrounder:
    """Grounded conversation for the anyres (LLaVA-Next) family.

    Beyond-reference: the reference ships generation utilities only for
    DeepSeekVL (frozen_deepseek_vl.py:227-593).  The KV-decode capture
    core here handles the packed anyres prompt (masked pad slots inside
    the image block + pad-skipping RoPE positions), so ``answer`` +
    ``ground`` work for the non-contiguous-feature family too.
    """

    cfg: Any  # LlavaNextConfig (wrapper with .base / .anyres_spec)
    params: dict
    tokenizer: Any
    prompt_template: dict
    image_token: str = "<image_placeholder>"
    max_new_tokens: int = 64

    def __post_init__(self):
        self.base = self.cfg.base
        self.image_token_id = _sentinel_image_token_id(
            self.tokenizer, self.image_token)
        stop_words = list(self.prompt_template.get("STOP_WORDS", []))
        self.stop_ids = tuple(
            self.tokenizer.encode(w, add_special_tokens=False)[-1]
            for w in stop_words)
        self._jit_cache: dict = {}

    def _generate(self, embeds, attn_mask, position_ids, max_new, stop_ids):
        base = self.base
        n_img = self.cfg.n_img_max
        lw = jax.nn.softmax(self.params["trainable"]["text_layer_weights"])
        key = ("agen", embeds.shape[0], max_new, stop_ids)
        if key not in self._jit_cache:
            def run(params, embeds, mask, pos, lw):
                state = dec.prefill(
                    params["frozen"]["llm"], base.llm, embeds,
                    base.img_start, n_img, max_new, layer_weights=lw,
                    attn_mask=mask, position_ids=pos)
                out = dec.decode(
                    params["frozen"]["llm"], base.llm, state,
                    dec.DecodeConfig(max_new_tokens=max_new,
                                     stop_token_ids=stop_ids),
                    base.img_start, n_img, layer_weights=lw)
                return {"tokens": out["tokens"], "valid": out["valid"],
                        "attn": out["attn"], "hidden": out["hidden"],
                        "prompt_attn": state["attn"],
                        "prompt_hidden": state["hidden"]}
            self._jit_cache[key] = jax.jit(run)
        return self._jit_cache[key](self.params, embeds, attn_mask,
                                    position_ids, lw)

    def _pack_prompt(self, image, question: str) -> dict:
        """Build the packed anyres prompt for one image + question:
        aligned ids, masks, positions, packed embeds and the per-image
        grounding extras (layout/meta/sam)."""
        from flmm_tpu.data.llava_next import anyres_process, block_layout
        from flmm_tpu.models.frozen import llava_next as mln

        cfg, base = self.cfg, self.base
        anyres = cfg.anyres_spec()
        n_img = cfg.n_img_max
        ids, starts = encode_with_images(
            self.tokenizer, self.prompt_template,
            self.image_token + question, self.image_token, n_img,
            self.image_token_id)
        img_start0 = starts[0]
        pad_n = base.img_start - img_start0
        assert pad_n >= 0, (
            "prompt image block starts after the config img_start; "
            "rebuild the config via registry.resolve_family_setup")
        pad_id = int(ids[-1])  # any id works: the slots are masked
        ids = np.concatenate([
            ids[:img_start0],
            np.full((pad_n,), pad_id, np.int32),
            ids[img_start0:]])
        img_start = base.img_start

        proc = anyres_process(image, anyres)
        layout = block_layout(anyres, proc["grid"], proc["fine_hw"],
                              proc["fine_pad"])
        S = len(ids)
        attn_mask = np.ones((S,), bool)
        attn_mask[img_start - pad_n:img_start] = False
        attn_mask[img_start:img_start + n_img] = layout["block_valid"]
        position_ids = np.maximum(np.cumsum(attn_mask) - 1, 0).astype(
            np.int32)

        g = anyres.tile_size
        nt = proc["tiles"].shape[0]
        tiles = np.zeros((1, 1 + anyres.max_tiles, g, g, 3), np.float32)
        tiles[0, 0] = proc["base"]
        tiles[0, 1:1 + nt] = proc["tiles"]
        tile_valid = np.zeros((1, 1 + anyres.max_tiles), bool)
        tile_valid[0, :1 + nt] = True
        batch1 = {
            "input_ids": ids[None], "tiles": tiles, "tile_valid": tile_valid,
            "block_index": layout["block_index"][None],
            "block_valid": layout["block_valid"][None],
        }
        embeds = mln.pack_embeds(
            self.params, cfg, jax.tree.map(jnp.asarray, batch1))[0]
        sam = sam_preprocess(image, base.sam.encoder.img_size)
        return {
            "ids": ids, "img_start": img_start,
            "attn_mask": attn_mask, "position_ids": position_ids,
            "embeds": embeds,
            "extras": {
                "fine_gather": layout["fine_gather"],
                "fine_valid": layout["fine_valid"],
                "fine_hw": np.asarray(proc["fine_hw"], np.float32),
                "meta_data": geometry.lmm_meta(image.height, image.width, g),
                "sam_pixels": sam["sam_pixel_values"],
                "sam_input_size": sam["sam_input_size"],
                "orig_size": (image.height, image.width),
            },
        }

    def answer(self, image, question: str, max_new_tokens: int | None = None):
        """Generate an answer over the anyres-packed prompt, caching
        per-step attention rows over the (padded) image block."""
        pk = self._pack_prompt(image, question)
        out = self._generate(pk["embeds"], jnp.asarray(pk["attn_mask"]),
                             jnp.asarray(pk["position_ids"]),
                             max_new_tokens or self.max_new_tokens,
                             self.stop_ids)
        valid = np.asarray(out["valid"])
        tvalid = int(valid.sum())
        tokens = np.asarray(out["tokens"])[:tvalid]
        text = self.tokenizer.decode(tokens[:-1]) if len(tokens) else ""
        return {
            "output_ids": tokens,
            "output_text": text,
            # (L, H, T, n_img) generated-token attention rows over the
            # PACKED image block (pad slots zero via the decode mask)
            "attention_maps": np.asarray(out["attn"])[:tvalid].transpose(
                1, 2, 0, 3),
            "hidden_states": np.asarray(out["hidden"])[:tvalid],
            **pk["extras"],
        }

    def visual_cot_v2(self, image, question: str):
        """Ground the question tokens from the prompt capture, crop, then
        answer on the crop (reference visual_cot_v2, frozen_deepseek_vl
        .py:374; the reference's final round converses over [image, crop]
        -- the anyres packer is single-block, so the final answer here
        sees the crop alone)."""
        pk = self._pack_prompt(image, question)
        out = self._generate(pk["embeds"], jnp.asarray(pk["attn_mask"]),
                             jnp.asarray(pk["position_ids"]), 1,
                             self.stop_ids)
        q_start = pk["img_start"] + self.cfg.n_img_max
        answer_out = {
            "attention_maps": np.asarray(out["prompt_attn"]),
            "hidden_states": np.asarray(out["prompt_hidden"]),
            **pk["extras"],
        }
        _, masks = self.ground(answer_out, [(q_start, len(pk["ids"]))])
        mask = masks[0] > 0
        bbox = mask2box_scaled(mask, 1.0)
        final = self.answer(image.crop(bbox), question)["output_text"]
        return "", bbox, final, mask

    def visual_cot_v3(self, image, question: str):
        """No-CoT baseline: answer on the full image directly."""
        out = self.answer(image, question)
        return ("", (0, 0, image.width, image.height),
                out["output_text"], None)

    def ground(self, answer_out: dict, positive_spans: list[tuple],
               max_text: int = 16):
        """Ground token spans of a generation; returns (M, oh, ow) masks."""
        from flmm_tpu.models.frozen import llava_next as mln

        cfg, base = self.cfg, self.base
        attn = answer_out["attention_maps"]  # (L, H, T, n_img)
        hidden = answer_out["hidden_states"]
        L, H, T, n = attn.shape
        merged, texts, tvalids = [], [], []
        tp = self.params["trainable"]["text_proj"]
        for lo, hi in positive_spans:
            assert hi > lo
            m = attn[:, :, lo:hi].mean(axis=2) if base.merge == "mean" else \
                attn[:, :, lo:hi].max(axis=2)
            merged.append(m)  # (L, H, n_img)
            span_h = hidden[lo:hi]
            proj = span_h @ np.asarray(tp["w"]) + np.asarray(tp["b"])
            pad = np.zeros((max_text, proj.shape[-1]), np.float32)
            k = min(len(proj), max_text)
            pad[:k] = proj[:k]
            texts.append(pad)
            tvalids.append([True] * k + [False] * (max_text - k))
        M = len(merged)
        # (1, L, H, M, n_img) -> canonical square dual-stream frames
        attn_b = jnp.asarray(np.stack(merged, axis=2)[None], jnp.float32)
        Hc, Wc = cfg.coarse_frame
        nh, nw = answer_out["sam_input_size"]
        gbatch = {
            "fine_gather": jnp.asarray(answer_out["fine_gather"][None]),
            "fine_valid": jnp.asarray(answer_out["fine_valid"][None]),
            "fine_hw": jnp.asarray(answer_out["fine_hw"][None]),
            "geom": jax.tree.map(jnp.asarray, geometry.batch_geom(
                [answer_out["meta_data"]], (Hc, Wc),
                [answer_out["sam_input_size"]])),
        }
        maps = mln.assemble_frames(cfg, attn_b, gbatch)  # (M, Hc, Wc, 2LH)

        texts_j = jnp.asarray(np.stack(texts), jnp.float32)
        tvalid_j = jnp.asarray(np.stack(tvalids))
        hcu, wcu = output_hw(base.unet, (Hc, Wc))
        cc = geometry.coarse_crop(answer_out["meta_data"], (hcu, wcu))
        geom = {k: jnp.asarray(v, jnp.float32) for k, v in cc.items()}
        geom["sam_h"] = jnp.asarray(float(nh))
        geom["sam_w"] = jnp.asarray(float(nw))

        key = ("aground", maps.shape)
        if key not in self._jit_cache:
            def run(params, maps, text, tvalid, sam_px, geom):
                tra = params["trainable"]
                coarse = unet.forward(tra["unet"], base.unet,
                                      maps).astype(jnp.float32)
                img_emb = sam_encoder.forward(
                    params["frozen"]["sam_encoder"], base.sam.encoder,
                    sam_px[None])[0]
                refined = sam_refiner.refine(
                    tra["sam"], base.sam, img_emb, coarse, geom, text,
                    tvalid)
                return coarse, refined["low_res_logits"]
            self._jit_cache[key] = jax.jit(run)
        coarse, low_res = self._jit_cache[key](
            self.params, maps, texts_j, tvalid_j,
            jnp.asarray(answer_out["sam_pixels"]), geom)
        masks = sam_logits_to_masks(
            np.asarray(low_res), (nh, nw), answer_out["orig_size"],
            sam_size=base.sam.encoder.img_size,
            prompt_size=base.sam.prompt_size,
        )
        return np.asarray(coarse), masks


@dataclasses.dataclass
class MGMGrounder(Grounder):
    """Grounded conversation for the MGM(-HD) family.

    Beyond-reference (the reference ships generation only for DeepSeekVL):
    MGM's image block is contiguous in the packed sequence, so the base
    KV-decode capture path applies unchanged; only the image encoding
    (dual CLIP + ConvNeXt towers with patch-info mining, HD crop grid)
    and the grounding map re-assembly (HD tile stitch + upsampled global
    concat) differ.  ``cfg`` is the MGMConfig wrapper; the base-class
    machinery sees its ``.base`` GroundingConfig.
    """

    mgm_cfg: Any = None  # set in __post_init__ from cfg

    def __post_init__(self):
        self.mgm_cfg = self.cfg
        self.cfg = self.cfg.base
        super().__post_init__()

    def _mgm_spec(self):
        from flmm_tpu.data.mgm import MGMProcessSpec

        m = self.mgm_cfg
        return MGMProcessSpec(
            crop_size=self.cfg.input_size, aux_size=m.aux.image_size,
            image_grid=m.image_grid, image_global=m.image_global)

    def _prepare_image(self, image):
        from flmm_tpu.data.mgm import mgm_process

        proc = mgm_process(image, self._mgm_spec())
        sam = sam_preprocess(image, self.cfg.sam.encoder.img_size)
        return {"pixel_values": proc, "meta": proc["meta"]}, sam

    def _embed_tokens_with_image(self, input_ids: np.ndarray,
                                 pixel_list: list,
                                 starts: list[int]) -> jnp.ndarray:
        from flmm_tpu.models.frozen import mgm as mgm_model

        base, fro = self.cfg, self.params["frozen"]
        ids = jnp.asarray(input_ids)
        embeds = llm.embed_tokens(fro["llm"], base.llm, ids).astype(
            base.dtype)
        assert len(starts) == len(pixel_list), (starts, len(pixel_list))
        for px, start in zip(pixel_list, starts):
            feats = mgm_model.encode_images(
                self.params, self.mgm_cfg,
                jnp.asarray(px["crops"])[None],
                jnp.asarray(px["aux"])[None])[0]
            embeds = jax.lax.dynamic_update_slice(
                embeds, feats.astype(base.dtype), (int(start), 0))
        return embeds

    def ground(self, answer_out: dict, positive_spans: list[tuple],
               max_text: int = 16):
        """Ground token spans; HD maps re-assembled per the reference's
        _process_attention (frozen_mgm.py:171-202)."""
        from flmm_tpu.models.frozen import mgm as mgm_model

        base = self.cfg
        attn = answer_out["attention_maps"]  # (L, H, T, n_img)
        hidden = answer_out["hidden_states"]
        merged, texts, tvalids = [], [], []
        tp = self.params["trainable"]["text_proj"]
        for lo, hi in positive_spans:
            assert hi > lo
            m = attn[:, :, lo:hi].mean(axis=2) if base.merge == "mean" \
                else attn[:, :, lo:hi].max(axis=2)
            merged.append(m)
            span_h = hidden[lo:hi]
            proj = span_h @ np.asarray(tp["w"]) + np.asarray(tp["b"])
            pad = np.zeros((max_text, proj.shape[-1]), np.float32)
            k = min(len(proj), max_text)
            pad[:k] = proj[:k]
            texts.append(pad)
            tvalids.append([True] * k + [False] * (max_text - k))
        attn_b = jnp.asarray(np.stack(merged, axis=2)[None], jnp.float32)
        maps = mgm_model.assemble_attention(self.mgm_cfg, attn_b)
        # base _ground_maps expects channel-first (M, C, h, w)
        maps = maps.transpose(0, 3, 1, 2)

        texts_j = jnp.asarray(np.stack(texts), jnp.float32)
        tvalid_j = jnp.asarray(np.stack(tvalids))
        mh, mw = self.mgm_cfg.map_hw
        hc, wc = output_hw(base.unet, (mh, mw))
        cc = geometry.coarse_crop(answer_out["meta_data"], (hc, wc))
        nh, nw = answer_out["sam_input_size"]
        geom = {k: jnp.asarray(v, jnp.float32) for k, v in cc.items()}
        geom["sam_h"] = jnp.asarray(float(nh))
        geom["sam_w"] = jnp.asarray(float(nw))
        coarse, low_res = self._ground_maps(
            maps, texts_j, tvalid_j,
            jnp.asarray(answer_out["sam_pixels"]), geom)
        masks = sam_logits_to_masks(
            np.asarray(low_res), (nh, nw), answer_out["orig_size"],
            sam_size=base.sam.encoder.img_size,
            prompt_size=base.sam.prompt_size,
        )
        return np.asarray(coarse), masks

    def _two_image_answer(self, image, crop, question: str) -> str:
        content = (
            f"{self.image_token}the whole image, "
            f"{self.image_token}the image region "
            f"that might help you answer the question: "
            f"{question}{self.additional_prompt}"
        )
        ids, starts = self._encode_content(content, n_markers=2)
        img_start = starts[0]
        from flmm_tpu.data.mgm import mgm_process

        spec = self._mgm_spec()
        px1 = mgm_process(image, spec)
        px2 = mgm_process(crop, spec)
        embeds = self._embed_tokens_with_image(ids, [px1, px2], starts)
        out = self._generate(embeds, img_start, self.max_new_tokens,
                             self.stop_ids)
        valid = np.asarray(out["valid"])
        tokens = np.asarray(out["tokens"])[:int(valid.sum())]
        return self.tokenizer.decode(tokens[:-1]) if len(tokens) else ""
