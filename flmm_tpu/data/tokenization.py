"""Prompt templating and caption/mask-id token streams.

Reproduces the reference's parallel ``input_ids``/``mask_ids`` construction
(flmm/datasets/png.py:114-141, 186-188) and the prompt templates
(configs/deepseek_vl/...py:47-55, xtuner PROMPT_TEMPLATE) without xtuner.

A tokenizer here is any object with ``encode(text, add_special_tokens=...)``
returning a list of ids (HF tokenizers qualify; tests use a fake).
"""

from __future__ import annotations

import dataclasses

IGNORE_INDEX = -100

# Prompt templates the released configs use (xtuner PROMPT_TEMPLATE values).
TEMPLATES = {
    "deepseek": {
        "SYSTEM": "",
        "INSTRUCTION": "User: {input}\n\nAssistant:",
        "SUFFIX": "<｜end▁of▁sentence｜>",
        "STOP_WORDS": ["<｜end▁of▁sentence｜>"],
    },
    "vicuna": {
        "SYSTEM": ("A chat between a curious user and an artificial "
                   "intelligence assistant. The assistant gives helpful, "
                   "detailed, and polite answers to the user's questions. "),
        "INSTRUCTION": "USER: {input} ASSISTANT:",
        "SUFFIX": "</s>",
        "STOP_WORDS": ["</s>"],
    },
    "mistral": {
        "SYSTEM": "",
        "INSTRUCTION": "[INST] {input} [/INST]",
        "SUFFIX": "</s>",
        "STOP_WORDS": ["</s>"],
    },
    "internlm2_chat": {
        "SYSTEM": "<|im_start|>system\n{system}<|im_end|>\n",
        "INSTRUCTION": ("<|im_start|>user\n{input}<|im_end|>\n"
                        "<|im_start|>assistant\n"),
        "SUFFIX": "<|im_end|>",
        "STOP_WORDS": ["<|im_end|>"],
    },
    "gemma": {
        "SYSTEM": "",
        "INSTRUCTION": ("<start_of_turn>user\n{input}<end_of_turn>\n"
                        "<start_of_turn>model\n"),
        "SUFFIX": "<end_of_turn>",
        "STOP_WORDS": ["<end_of_turn>"],
    },
}


@dataclasses.dataclass(frozen=True)
class PromptSpec:
    template: dict
    prompt: str  # e.g. '<image_placeholder>'*576 + 'Please give me ...'
    system: str | None = None

    def render(self) -> str:
        sys_t = self.template.get("SYSTEM", "")
        if "{system}" in sys_t:
            out = sys_t.format(system=self.system) if self.system else ""
        else:
            out = sys_t
        return out + self.template["INSTRUCTION"].format(input=self.prompt)


def encode_prompt(tokenizer, spec: PromptSpec) -> list[int]:
    """Tokenise the instruction-formatted prompt with special tokens
    (reference png.py:84-87)."""
    return list(tokenizer.encode(spec.render(), add_special_tokens=True))


def caption_stream(
    tokenizer,
    segments: list[dict],
    prompt_len: int,
) -> dict:
    """Build caption ids + aligned mask ids from PNG-style segments.

    Each segment: ``{'utterance': str, 'has_mask': bool}``.  Mirrors
    png.py:123-141: tokens of segments with masks get the running mask
    index; others -1.  The prompt positions are all -1.
    """
    caption_ids: list[int] = []
    mask_ids: list[int] = [-1] * prompt_len
    spans: list[tuple[int, int]] = []  # token spans per mask in seq coords
    mask_cnt = 0
    for seg in segments:
        ids = list(tokenizer.encode(seg["utterance"], add_special_tokens=False))
        start = prompt_len + len(caption_ids)
        caption_ids += ids
        if seg.get("has_mask"):
            mask_ids += [mask_cnt] * len(ids)
            spans.append((start, start + len(ids)))
            mask_cnt += 1
        else:
            mask_ids += [-1] * len(ids)
    return {
        "caption_ids": caption_ids,
        "mask_ids": mask_ids,
        "spans": spans,
        "num_masks": mask_cnt,
    }


def find_image_block(input_ids: list[int], image_token_id: int) -> tuple[int, int]:
    """Locate the contiguous image-token block; returns (start, length)."""
    start = None
    n = 0
    for i, t in enumerate(input_ids):
        if t == image_token_id:
            if start is None:
                start = i
            elif i != start + n:
                raise ValueError("image tokens are not contiguous")
            n += 1
    if start is None:
        raise ValueError("no image tokens found")
    return start, n
