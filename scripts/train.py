#!/usr/bin/env python
"""Train a frozen-LMM grounding stack.

TPU-native replacement for ``xtuner train <config> --deepspeed zero2``
(reference README.md:92-95): one jitted train step over a
``Mesh('data','model')``, AdamW + warmup-cosine, Orbax trainable-only
checkpoints with auto-resume, PNG + RefCOCO joint data.

Examples:
  # smoke-run on synthetic data (no datasets needed)
  python scripts/train.py --family deepseek_vl --preset tiny --synthetic \
      --steps 20 --batch-size 4

  # real training
  python scripts/train.py --family deepseek_vl --preset 1_3b \
      --checkpoint /ckpts/deepseek-vl-1.3b-chat \
      --sam-checkpoint /ckpts/sam_vit_l_0b3195.pth \
      --data-root data/coco --epochs 8 --batch-size 8 \
      --tokenizer deepseek-ai/deepseek-vl-1.3b-chat
"""

from __future__ import annotations

import argparse
import itertools
import json
import pathlib
import random
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--family", default="deepseek_vl")
    p.add_argument("--preset", default="tiny")
    p.add_argument("--synthetic", action="store_true",
                   help="train on schema-exact synthetic data")
    p.add_argument("--synthetic-task", default="random",
                   choices=["random", "grounding"],
                   help="synthetic data flavour: 'random' (schema smoke) "
                        "or 'grounding' (derivable colored-rectangle "
                        "task -- the learns-to-ground receipt)")
    p.add_argument("--checkpoint", default=None,
                   help="frozen LMM checkpoint dir")
    p.add_argument("--sam-checkpoint", default=None)
    p.add_argument("--sam-size", type=int, default=None,
                   help="SAM input resolution override (reduced-resolution\n                   deployment schedule; default: config native, 1024)")
    p.add_argument("--clip-checkpoint", default=None,
                   help="CLIP tower checkpoint (mgm)")
    p.add_argument("--aux-checkpoint", default=None,
                   help="open_clip ConvNeXt checkpoint (mgm)")
    p.add_argument("--tokenizer", default=None,
                   help="HF tokenizer name/path")
    p.add_argument("--template", default=None,
                   help="prompt template override (see TEMPLATES)")
    p.add_argument("--data-root", default="data/coco")
    p.add_argument("--work-dir", default="work_dirs/run")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--seq-len", type=int, default=704)
    p.add_argument("--max-masks", type=int, default=8)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--save-steps", type=int, default=500)
    p.add_argument("--log-interval", type=int, default=10)
    p.add_argument("--n-model", type=int, default=1,
                   help="model-parallel axis size")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--profile", type=int, default=0, metavar="N",
                   help="capture an XLA trace of N steps (from step 3) "
                        "into <work-dir>/xplane for XProf/TensorBoard")
    p.add_argument("--nonfinite-guard", action="store_true",
                   help="skip optimizer updates when grads are non-finite "
                        "(optax.apply_if_finite; bf16-era loss-scale "
                        "replacement)")
    p.add_argument("--metrics-file", default=None,
                   help="JSONL metric log path (default "
                        "<work-dir>/metrics.jsonl)")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() for multi-host "
                        "pods (TPU slices over DCN); single-host runs skip "
                        "it")
    return p.parse_args()


def synthetic_stream(args, cfg, steps):
    """Schema-exact random batches for any family."""
    from flmm_tpu.data.collate import BatchSpec
    from flmm_tpu.data.processors import ProcessorConfig
    from flmm_tpu.data.synthetic import synthetic_batch, synthetic_samples
    from flmm_tpu.registry import get_batch_builder, get_coarse_hw

    base = cfg.base if hasattr(cfg, "base") else cfg
    if getattr(args, "synthetic_task", "random") == "grounding":
        # the DERIVABLE colored-rectangles task (learns-to-ground
        # receipt); standard-batch families only
        from flmm_tpu.data.synthetic import synthetic_grounding_batch

        assert args.family in ("deepseek_vl", "llava", "hpt"), args.family
        for i in range(steps):
            yield synthetic_grounding_batch(
                base, batch_size=args.batch_size, seed=i)
        return
    if args.family in ("deepseek_vl", "llava", "hpt"):
        for i in range(steps):
            yield synthetic_batch(base, batch_size=args.batch_size, seed=i)
        return
    if args.family == "mgm":
        build = get_batch_builder(
            "mgm", crop_size=base.vision.image_size,
            aux_size=cfg.aux.image_size, image_grid=cfg.image_grid,
            image_global=cfg.image_global)
    else:  # llava_next
        a = cfg.anyres_spec()
        build = get_batch_builder(
            "llava_next", tile_size=a.tile_size, patch_size=a.patch_size,
            pinpoints=a.pinpoints)
    sam_size = base.sam.encoder.img_size
    for i in range(steps):
        samples = synthetic_samples(cfg, args.batch_size, seed=i)
        spec = BatchSpec(
            seq_len=max(len(s["input_ids"]) for s in samples) + 16,
            max_masks=2, text_per_mask=8,
            coarse_hw=get_coarse_hw(cfg), sam_size=sam_size,
            prompt_size=base.sam.prompt_size,
            processor=ProcessorConfig(size=base.input_size))
        b = build(samples, spec)
        b.pop("infos", None)
        yield b


def real_stream(args, cfg, steps, rendered_prompt=None, spec_kwargs=None):
    """PNG + RefCOCO/+/g joint stream (reference configs/...:134-167)."""
    from transformers import AutoTokenizer

    from flmm_tpu.data.collate import BatchSpec
    from flmm_tpu.data.png import PNGDataset
    from flmm_tpu.data.processors import ProcessorConfig
    from flmm_tpu.data.refcoco import RefCocoDataset, refcoco_to_sample
    from flmm_tpu.registry import get_batch_builder

    base = cfg.base if hasattr(cfg, "base") else cfg
    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
    if rendered_prompt is None:
        from flmm_tpu.registry import build_prompt

        rendered_prompt = build_prompt(
            args.family, tokenizer, base.num_img_tokens,
            template=getattr(args, "template", None))
    spec = rendered_prompt
    spec_kwargs = spec_kwargs or {}

    root = pathlib.Path(args.data_root)
    datasets = [PNGDataset(
        json_file=str(root / "annotations/png_coco_train2017.json"),
        panoptic_json_file=str(root / "annotations/panoptic_train2017.json"),
        panoptic_png_path=str(root / "annotations/panoptic_train2017"),
        image_path=str(root / "train2017"),
        tokenizer=tokenizer, prompt_spec=spec,
    )]
    ref_sets = []
    for name, split_file in (("refcoco", "refs(unc).p"),
                             ("refcoco+", "refs(unc).p"),
                             ("refcocog", "refs(umd).p")):
        d = root / name
        if d.exists():
            ref_sets.append(RefCocoDataset(
                ann_file=str(d / "instances.json"),
                split_file=str(d / split_file),
                image_path=str(root / "train2014"),
                split="train",
            ))

    from flmm_tpu.registry import get_coarse_hw

    hc, wc = get_coarse_hw(cfg)
    if "processor" not in spec_kwargs:
        spec_kwargs["processor"] = ProcessorConfig(size=base.input_size)
    bspec = BatchSpec(
        seq_len=args.seq_len, max_masks=args.max_masks,
        coarse_hw=(hc, wc),
        **spec_kwargs,
    )
    build = get_batch_builder(args.family)

    # joint index space over PNG + RefCOCO datasets (reference
    # concat_datasets, configs/...:134-167)
    sizes = [len(d) for d in datasets] + [len(d) for d in ref_sets]
    offsets = []
    acc = 0
    for sz in sizes:
        offsets.append(acc)
        acc += sz

    def sample_one(gidx):
        for di, (off, sz) in enumerate(zip(offsets, sizes)):
            if gidx < off + sz:
                local = gidx - off
                if di < len(datasets):
                    return datasets[di][local]
                ds = ref_sets[di - len(datasets)]
                return refcoco_to_sample(
                    ds[local], tokenizer, spec,
                    concat=True, max_expressions=args.max_masks,
                    subsample=True,
                )[0]
        raise IndexError(gidx)

    from flmm_tpu.data.loader import EpochSampler, PrefetchLoader

    loader = PrefetchLoader(
        sample_one,
        lambda samples: {k: v for k, v in build(samples, bspec).items()
                         if k != "infos"},
        EpochSampler(acc, seed=0, shuffle=True),
        batch_size=args.batch_size, num_workers=args.num_workers,
    )
    emitted = 0
    epoch = 0
    while emitted < steps:
        for batch in loader.epoch(epoch):
            yield batch
            emitted += 1
            if emitted >= steps:
                return
        epoch += 1


def main():
    args = parse_args()
    if args.multihost:
        # multi-host pod: one process per host; coordinator/address come
        # from the TPU environment (the NCCL/DeepSpeed launcher equivalent)
        jax.distributed.initialize()
        print(f"multihost: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")
    from flmm_tpu.parallel import mesh as mesh_lib
    from flmm_tpu.registry import get_config, get_model
    from flmm_tpu.train import checkpoint as ckpt
    from flmm_tpu.train import loop as train_loop

    rendered_prompt = None
    spec_kwargs = None
    if args.synthetic or not args.tokenizer:
        cfg = get_config(args.family, args.preset)
        if args.sam_size:
            from flmm_tpu.registry import with_sam_size

            cfg = with_sam_size(cfg, args.sam_size)
    else:
        from transformers import AutoTokenizer

        from flmm_tpu.registry import resolve_family_setup

        cfg, rendered_prompt, spec_kwargs = resolve_family_setup(
            args.family, args.preset,
            AutoTokenizer.from_pretrained(args.tokenizer),
            template=args.template, sam_size=args.sam_size)
    model = get_model(args.family)
    params = model.init_params(cfg, jax.random.key(0))

    if args.checkpoint:
        from flmm_tpu.convert import load as load_mod
        from flmm_tpu.registry import get_loader

        extra = {}
        if args.family == "mgm":
            extra = {"clip_checkpoint": args.clip_checkpoint,
                     "aux_checkpoint": args.aux_checkpoint}
        frozen = get_loader(args.family)(
            args.checkpoint, cfg, args.sam_checkpoint, **extra)
        params["frozen"].update(jax.tree.map(jnp.asarray, frozen))
        if args.sam_checkpoint:
            base = cfg.base if hasattr(cfg, "base") else cfg
            params["trainable"]["sam"] = jax.tree.map(
                jnp.asarray,
                load_mod.sam_trainable(args.sam_checkpoint, base.sam))

    steps = args.steps or 10000
    opt = train_loop.make_optimizer(train_loop.OptimConfig(
        lr=args.lr, total_steps=steps))
    if args.nonfinite_guard:
        from flmm_tpu.train.diagnostics import nonfinite_guard

        opt = nonfinite_guard(opt)
    state = train_loop.init_state(params["trainable"], opt)

    workdir = pathlib.Path(args.work_dir)
    workdir.mkdir(parents=True, exist_ok=True)
    if args.resume:
        latest = ckpt.latest(workdir)
        if latest is not None:
            state = ckpt.restore(latest, state)
            print(f"resumed from {latest}")

    # data axis must divide the batch
    avail = len(jax.devices()) // args.n_model
    n_data = max(d for d in range(1, avail + 1)
                 if args.batch_size % d == 0)
    mesh = mesh_lib.make_mesh(n_data=n_data, n_model=args.n_model)
    loss_fn = lambda p, b: model.loss_fn(p, cfg, b)

    stream = (synthetic_stream(args, cfg, steps)
              if args.synthetic else real_stream(
                  args, cfg, steps, rendered_prompt=rendered_prompt,
                  spec_kwargs=spec_kwargs))
    from flmm_tpu.train.diagnostics import MetricLogger, StepTimer, profile

    mlog = MetricLogger(
        path=args.metrics_file or str(workdir / "metrics.jsonl"),
        interval=args.log_interval)
    timer = StepTimer(window=args.log_interval)
    profile_ctx = None

    step_fn = None
    frozen_sharded = None
    t0 = time.time()
    for i, batch in enumerate(stream):
        if args.profile and i == 2:  # past compile + first dispatch
            profile_ctx = profile(workdir / "xplane")
            profile_ctx.__enter__()
        batch = jax.tree.map(jnp.asarray, batch)
        if step_fn is None:
            with mesh:
                step_fn = train_loop.jit_train_step(
                    loss_fn, opt, mesh, state, params["frozen"], batch)
                frozen_sharded = jax.device_put(
                    params["frozen"],
                    mesh_lib.param_shardings(mesh, params["frozen"]))
                state = jax.device_put(state,
                                       mesh_lib.replicated(mesh, state))
        with mesh:
            batch = jax.device_put(batch,
                                   mesh_lib.batch_shardings(mesh, batch))
            state, metrics = step_fn(state, frozen_sharded, batch)
        timer.tick()
        if profile_ctx is not None and i == 2 + args.profile - 1:
            jax.block_until_ready(state["params"])
            profile_ctx.__exit__(None, None, None)
            profile_ctx = None
            print(f"profile: wrote xplane trace to {workdir / 'xplane'}")
        if (i + 1) % args.log_interval == 0:
            m = {k: float(v) for k, v in metrics.items()}
            m["sec_per_step"] = timer.mean
            m["imgs_per_sec"] = args.batch_size / max(timer.mean, 1e-9)
            mlog.log(i + 1, m)
            m["step"] = i + 1
            m["wall"] = time.time() - t0
            print(json.dumps(m), flush=True)
        if (i + 1) % args.save_steps == 0 or i + 1 == steps:
            ckpt.save(workdir / f"step_{i + 1}", state)
            print(f"saved step_{i + 1}")
    if profile_ctx is not None:
        profile_ctx.__exit__(None, None, None)
    mlog.close()


if __name__ == "__main__":
    main()
