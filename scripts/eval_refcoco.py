#!/usr/bin/env python
"""RefCOCO/RefCOCO+/RefCOCOg referring-segmentation evaluation.

TPU-native replacement for ``accelerate launch scripts/multiprocess_eval_
refcoco.py`` (reference :20-175): batched jitted inference with host-side
original-resolution cIoU/mIoU scoring over the 8 standard splits.

Example:
  python scripts/eval_refcoco.py --family deepseek_vl --preset 1_3b \
      --checkpoint /ckpts/deepseek-vl-1.3b-chat \
      --sam-checkpoint /ckpts/sam_vit_l.pth \
      --trained work_dirs/run/step_10000 \
      --tokenizer deepseek-ai/deepseek-vl-1.3b-chat \
      --data-root data/coco [--concat] [--debug]
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

SPLITS = [
    ("refcoco", "refs(unc).p", "val"),
    ("refcoco", "refs(unc).p", "testA"),
    ("refcoco", "refs(unc).p", "testB"),
    ("refcoco+", "refs(unc).p", "val"),
    ("refcoco+", "refs(unc).p", "testA"),
    ("refcoco+", "refs(unc).p", "testB"),
    ("refcocog", "refs(umd).p", "val"),
    ("refcocog", "refs(umd).p", "test"),
]


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
    p.add_argument("--trained", default=None,
                   help="trainable params: an Orbax train-state dir or a "
                        "released F-LMM .pth checkpoint (auto-detected)")
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--template", default=None,
                   help="prompt template override (see TEMPLATES)")
    p.add_argument("--data-root", default="data/coco")
    p.add_argument("--image-dir", default=None)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--seq-len", type=int, default=704)
    p.add_argument("--seq-buckets", type=int, nargs="*", default=None,
                   help="optional seq-length buckets (pad per batch)")
    p.add_argument("--max-masks", type=int, default=8)
    p.add_argument("--concat", action="store_true",
                   help="one pass per image instead of per expression")
    p.add_argument("--debug", action="store_true", help="first 100 samples")
    p.add_argument("--sharded-eval", action="store_true",
                   help="data-parallel forward over all devices "
                        "(evalsuite/sharded.py); scoring runs the "
                        "reference-exact host scorer at original GT "
                        "resolution, so results match the host path")
    p.add_argument("--int8-sam", action="store_true",
                   help="W8A8-quantize the frozen SAM encoder (2x MXU / "
                        "half the weight HBM; see ops/quant.py)")
    args = p.parse_args()

    from transformers import AutoTokenizer

    from flmm_tpu.data.collate import BatchSpec
    from flmm_tpu.data.processors import ProcessorConfig
    from flmm_tpu.data.refcoco import RefCocoDataset, refcoco_to_sample
    from flmm_tpu.evalsuite.metrics import RefSegAccumulator
    from flmm_tpu.evalsuite.runner import refcoco_score, run_eval
    from flmm_tpu.registry import get_batch_builder, get_model
    from flmm_tpu.train import checkpoint as ckpt

    from flmm_tpu.registry import resolve_family_setup

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

    spec = rendered_prompt

    from flmm_tpu.registry import get_coarse_hw

    hc, wc = get_coarse_hw(cfg)
    bspec = BatchSpec(seq_len=args.seq_len, max_masks=args.max_masks,
                      coarse_hw=(hc, wc), **spec_kwargs)
    build = get_batch_builder(args.family)

    @jax.jit
    def predict(batch):
        return model.forward(params, cfg, batch)["sam_logits"]

    def predict_np(batch):
        batch = {k: v for k, v in batch.items() if k != "infos"}
        return np.asarray(predict(jax.tree.map(jnp.asarray, batch)))

    results = {}
    root = pathlib.Path(args.data_root)
    for name, split_file, split in SPLITS:
        ds = RefCocoDataset(
            ann_file=str(root / name / "instances.json"),
            split_file=str(root / name / split_file),
            image_path=args.image_dir or str(root / "train2014"),
            split=split,
        )
        n = min(len(ds), 100) if args.debug else len(ds)

        def samples():
            for i in range(n):
                yield from refcoco_to_sample(
                    ds[i], tokenizer, spec,
                    concat=args.concat,
                    max_expressions=args.max_masks if args.concat else None,
                )

        if args.sharded_eval:
            from flmm_tpu.evalsuite.sharded import run_eval_sharded
            from flmm_tpu.parallel import mesh as mesh_lib

            n_data = max(d for d in range(1, len(jax.devices()) + 1)
                         if args.batch_size % d == 0)
            mesh = mesh_lib.make_mesh(n_data=n_data, n_model=1)
            results[f"{name}/{split}"] = run_eval_sharded(
                samples(), params,
                lambda p, b: model.forward(p, cfg, b),
                bspec, args.batch_size, mesh, batch_builder=build)
        else:
            acc = run_eval(samples(), predict_np, bspec, args.batch_size,
                           RefSegAccumulator, refcoco_score,
                           seq_len_buckets=tuple(args.seq_buckets)
                           if args.seq_buckets else None,
                           batch_builder=build)
            results[f"{name}/{split}"] = acc.results()
        print(json.dumps({f"{name}/{split}": results[f"{name}/{split}"]}),
              flush=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
