#!/usr/bin/env python
"""Visual Chain-of-Thought benchmark driver.

TPU-native replacement for reference scripts/visual_cot/visual_cot_
inference.py: iterates VisCoT benchmark JSONs, runs
``Grounder.visual_cot_{v1,v2,v3}`` and dumps answers + boxes for the GPT
scorer.

Example:
  python scripts/visual_cot/visual_cot_inference.py \
      --family deepseek_vl --preset 1_3b --version v1 \
      --checkpoint ... --sam-checkpoint ... --trained ... \
      --tokenizer deepseek-ai/deepseek-vl-1.3b-chat \
      --benchmark-dir benchmarks/viscot --image-root data \
      --out results/viscot_v1
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
from PIL import Image


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--family", default="deepseek_vl")
    p.add_argument("--preset", default="1_3b")
    p.add_argument("--version", choices=["v1", "v2", "v3"], default="v1")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--sam-checkpoint", default=None)
    p.add_argument("--trained", default=None)
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--benchmark-dir", required=True)
    p.add_argument("--image-root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--max-thought-tokens", type=int, default=16)
    p.add_argument("--max-new-tokens", type=int, default=512)
    p.add_argument("--box-scale", type=float, default=1.0)
    p.add_argument("--no-sam", action="store_true")
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args()

    from transformers import AutoTokenizer

    from flmm_tpu.convert import load as load_mod
    from flmm_tpu.data import tokenization as tok
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
        max_thought_tokens=args.max_thought_tokens,
        box_scale=args.box_scale, use_sam=not args.no_sam,
    )
    run = getattr(grounder, f"visual_cot_{args.version}", None)
    if run is None:
        p.error(f"--version {args.version} is not available for "
                f"--family {args.family} "
                f"({type(grounder).__name__} has no visual_cot_"
                f"{args.version})")

    out_dir = pathlib.Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    bench_dir = pathlib.Path(args.benchmark_dir)
    for bench_file in sorted(bench_dir.glob("*.json")):
        data = json.loads(bench_file.read_text())
        if args.limit:
            data = data[:args.limit]
        results = []
        for item in data:
            image = Image.open(
                pathlib.Path(args.image_root) / item["image"][0]
                if isinstance(item["image"], list)
                else pathlib.Path(args.image_root) / item["image"]
            ).convert("RGB")
            question = item["conversations"][0]["value"].replace(
                "<image>", "").strip()
            thought, bbox, answer, _ = run(image, question)
            results.append({
                "question": question,
                "thought": thought,
                "bbox": list(bbox),
                "answer": answer,
                "gt": item["conversations"][-1]["value"],
                "image": item["image"],
            })
        out_file = out_dir / bench_file.name
        out_file.write_text(json.dumps(results, indent=1))
        print(f"{bench_file.name}: {len(results)} items -> {out_file}",
              flush=True)


if __name__ == "__main__":
    main()
