#!/usr/bin/env python
"""Interactive grounded conversation.

Replacement for reference scripts/demo/grounded_conversation.py: generate
an answer with per-step attention capture, extract noun phrases, map them
to token spans, ground each span, and save a colour overlay.

Example:
  python scripts/demo/grounded_conversation.py --family deepseek_vl \
      --preset 1_3b --checkpoint ... --sam-checkpoint ... --trained ... \
      --tokenizer deepseek-ai/deepseek-vl-1.3b-chat \
      --image images/dog.jpg --text "What is the dog doing?" --out out.png
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

PALETTE = [(255, 80, 80), (80, 200, 120), (90, 140, 255), (250, 200, 60),
           (200, 100, 255), (70, 220, 220), (250, 140, 50), (160, 255, 80)]


def overlay(image: Image.Image, masks, labels) -> Image.Image:
    arr = np.asarray(image.convert("RGB")).astype(np.float32)
    for i, m in enumerate(masks):
        color = np.asarray(PALETTE[i % len(PALETTE)], np.float32)
        mm = m.astype(bool)
        arr[mm] = 0.5 * arr[mm] + 0.5 * color
    return Image.fromarray(arr.astype(np.uint8))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--family", default="deepseek_vl")
    p.add_argument("--preset", default="1_3b")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--sam-checkpoint", default=None)
    p.add_argument("--trained", default=None)
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--image", required=True)
    p.add_argument("--text", default=None,
                   help="single-shot question (omit with --interactive)")
    p.add_argument("--out", default="grounded.png")
    p.add_argument("--max-new-tokens", type=int, default=128)
    p.add_argument("--interactive", action="store_true",
                   help="multi-turn conversation on stdin with per-chunk "
                        "grounding confirmation (reference "
                        "grounded_conversation.py:48 asks 'Ground X?' per "
                        "noun chunk; conversation memory per "
                        "frozen_deepseek_vl.py:492-512)")
    args = p.parse_args()
    if args.text is None and not args.interactive:
        p.error("--text is required unless --interactive")

    from transformers import AutoTokenizer

    from flmm_tpu.convert import load as load_mod
    from flmm_tpu.data import tokenization as tok
    from flmm_tpu.generation.noun_chunks import (
        char_span_to_token_span, noun_chunks,
    )
    from flmm_tpu.registry import get_config, get_model
    from flmm_tpu.train import checkpoint as ckpt

    cfg = get_config(args.family, args.preset)
    base = cfg.base if hasattr(cfg, "base") else cfg
    model = get_model(args.family)
    params = model.init_params(cfg, jax.random.key(0))
    from flmm_tpu.registry import get_loader

    frozen = get_loader(args.family)(args.checkpoint, cfg,
                                     args.sam_checkpoint)
    params["frozen"].update(jax.tree.map(jnp.asarray, frozen))
    if args.trained:
        params["trainable"] = ckpt.restore_trainable(
            args.trained, cfg, params["trainable"])

    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
    from flmm_tpu.generation.api import make_grounder

    grounder = make_grounder(
        args.family, cfg, params, tokenizer,
        max_new_tokens=args.max_new_tokens,
    )

    image = Image.open(args.image).convert("RGB")

    def ground_turn(out, out_path, confirm: bool):
        chunks = noun_chunks(out["output_text"])
        spans, labels = [], []
        for s_char, e_char, phrase in chunks:
            if confirm:
                try:
                    resp = input(f"Ground {phrase!r}? [y/N] ").strip().lower()
                except EOFError:
                    resp = "n"
                if resp not in ("y", "yes", "1"):
                    continue
            span = char_span_to_token_span(
                tokenizer, list(out["output_ids"]), (s_char, e_char))
            if span:
                spans.append(span)
                labels.append(phrase)
        if not spans:
            print("no noun phrases found to ground")
            return
        _, masks = grounder.ground(out, spans)
        for phrase, m in zip(labels, masks):
            print(f"  {phrase}: {int(m.sum())} px")
        overlay(image, masks, labels).save(out_path)
        print(f"saved {out_path}")

    if not args.interactive:
        out = grounder.answer(image, args.text)
        print("Answer:", out["output_text"])
        ground_turn(out, args.out, confirm=False)
        return

    # multi-turn loop: conversation memory threads through
    # Grounder.answer(history=...); per-chunk confirmation on stdin
    history = []
    stem = pathlib.Path(args.out)
    while True:
        try:
            q = input("user> ").strip()
        except EOFError:
            break
        if not q or q in ("exit", "quit"):
            break
        out = grounder.answer(image, q, history=history or None)
        print("Answer:", out["output_text"])
        turn_out = stem.with_name(
            f"{stem.stem}_turn{len(history)}{stem.suffix}")
        ground_turn(out, turn_out, confirm=True)
        history.append((q, out["output_text"]))


if __name__ == "__main__":
    main()
