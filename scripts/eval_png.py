#!/usr/bin/env python
"""Panoptic Narrative Grounding evaluation (AA + splits + pixel acc).

TPU-native replacement for ``accelerate launch scripts/multiprocess_eval_
png.py`` (reference :69-177).

Example:
  python scripts/eval_png.py --family deepseek_vl --preset 1_3b \
      --checkpoint ... --sam-checkpoint ... --trained ... \
      --tokenizer ... --data-root data/coco [--debug]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--family", default="deepseek_vl")
    p.add_argument("--preset", default="1_3b")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--sam-checkpoint", default=None)
    p.add_argument("--sam-size", type=int, default=None,
                   help="SAM input resolution override (reduced-resolution\n                   deployment schedule; default: config native, 1024)")
    p.add_argument("--clip-checkpoint", default=None,
                   help="CLIP tower checkpoint (mgm)")
    p.add_argument("--aux-checkpoint", default=None,
                   help="open_clip ConvNeXt checkpoint (mgm)")
    p.add_argument("--trained", default=None)
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--template", default=None,
                   help="prompt template override (see TEMPLATES)")
    p.add_argument("--data-root", default="data/coco")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--seq-len", type=int, default=704)
    p.add_argument("--seq-buckets", type=int, nargs="*", default=None,
                   help="optional seq-length buckets (pad per batch)")
    p.add_argument("--max-masks", type=int, default=16)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--sharded-eval", action="store_true",
                   help="data-parallel forward over all devices; scoring "
                        "runs the reference-exact host scorer at original "
                        "GT resolution, so results (incl. per-split "
                        "thing/stuff/plural) match the host path")
    p.add_argument("--int8-sam", action="store_true",
                   help="W8A8-quantize the frozen SAM encoder (see "
                        "ops/quant.py)")
    args = p.parse_args()

    from transformers import AutoTokenizer

    from flmm_tpu.data.collate import BatchSpec
    from flmm_tpu.data.png import PNGDataset
    from flmm_tpu.data.processors import ProcessorConfig
    from flmm_tpu.evalsuite.metrics import PNGAccumulator
    from flmm_tpu.evalsuite.runner import png_score, run_eval
    from flmm_tpu.registry import get_model, resolve_family_setup
    from flmm_tpu.train import checkpoint as ckpt

    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
    cfg, rendered_prompt, spec_kwargs = resolve_family_setup(
        args.family, args.preset, tokenizer, template=args.template,
        sam_size=args.sam_size)
    base = cfg.base if hasattr(cfg, "base") else cfg
    model = get_model(args.family)
    params = model.init_params(cfg, jax.random.key(0))
    from flmm_tpu.registry import get_loader

    extra = ({"clip_checkpoint": args.clip_checkpoint,
              "aux_checkpoint": args.aux_checkpoint}
             if args.family == "mgm" else {})
    frozen = get_loader(args.family)(
        args.checkpoint, cfg, args.sam_checkpoint, **extra)
    params["frozen"].update(jax.tree.map(jnp.asarray, frozen))
    if args.trained:
        params["trainable"] = ckpt.restore_trainable(
            args.trained, cfg, params["trainable"])
    if args.int8_sam:
        from flmm_tpu.models.frozen.grounding import quantize_frozen_sam

        params = quantize_frozen_sam(params)

    root = pathlib.Path(args.data_root)
    ds = PNGDataset(
        json_file=str(root / "annotations/png_coco_val2017.json"),
        panoptic_json_file=str(root / "annotations/panoptic_val2017.json"),
        panoptic_png_path=str(root / "annotations/panoptic_val2017"),
        image_path=str(root / "val2017"),
        tokenizer=tokenizer, prompt_spec=rendered_prompt,
    )
    n = min(len(ds), 100) if args.debug else len(ds)

    from flmm_tpu.registry import get_coarse_hw

    hc, wc = get_coarse_hw(cfg)
    bspec = BatchSpec(seq_len=args.seq_len, max_masks=args.max_masks,
                      coarse_hw=(hc, wc), **spec_kwargs)

    @jax.jit
    def predict(batch):
        return model.forward(params, cfg, batch)["sam_logits"]

    def predict_np(batch):
        batch = {k: v for k, v in batch.items() if k != "infos"}
        return np.asarray(predict(jax.tree.map(jnp.asarray, batch)))

    build = __import__("flmm_tpu.registry",
                       fromlist=["get_batch_builder"]).get_batch_builder(
        args.family)
    if args.sharded_eval:
        from flmm_tpu.evalsuite.sharded import run_eval_sharded
        from flmm_tpu.parallel import mesh as mesh_lib

        n_data = max(d for d in range(1, len(jax.devices()) + 1)
                     if args.batch_size % d == 0)
        mesh = mesh_lib.make_mesh(n_data=n_data, n_model=1)
        out = run_eval_sharded(
            (ds[i] for i in range(n)), params,
            lambda p, b: model.forward(p, cfg, b),
            bspec, args.batch_size, mesh, batch_builder=build,
            accumulator_factory=PNGAccumulator, score_fn=png_score)
        print(json.dumps(out, indent=2))
        return
    acc = run_eval((ds[i] for i in range(n)), predict_np, bspec,
                   args.batch_size, PNGAccumulator, png_score,
                   seq_len_buckets=tuple(args.seq_buckets)
                   if args.seq_buckets else None,
                   batch_builder=build)
    print(json.dumps(acc.results(), indent=2))


if __name__ == "__main__":
    main()
