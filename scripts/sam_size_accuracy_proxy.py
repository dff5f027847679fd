#!/usr/bin/env python
"""Accuracy proxy for the reduced-resolution SAM deployment schedule.

The ``--sam-size`` schedule (configs/deepseek_vl.py sam_vit_l docstring)
trades SAM encoder resolution for throughput (1024 -> 448 measured 12.7
-> 31.6 img/s, README); its cIoU cost on real checkpoints is unmeasurable
here (no network egress).  This script produces the closest measurable
substitute (VERDICT r2 item 5): train the tiny twin on the DERIVABLE
colored-rectangles grounding task (data/synthetic.py:
synthetic_grounding_batch) at the native SAM resolution and at half
resolution, and report the final fresh-batch aiou/sam_aiou side by side.
Same seeds, same step budget, only the SAM geometry differs (threaded
through with_sam_size, exactly like the deployment knob).

Usage: python scripts/sam_size_accuracy_proxy.py [--steps 400]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def run(cfg, steps: int, lr: float, tail: int) -> dict:
    from flmm_tpu.data.synthetic import synthetic_grounding_batch
    from flmm_tpu.models.frozen import grounding as model
    from flmm_tpu.train import loop as train_loop

    params = model.init_params(cfg, jax.random.key(0))
    opt = train_loop.make_optimizer(train_loop.OptimConfig(
        lr=lr, total_steps=steps, warmup_ratio=0.05))
    state = train_loop.init_state(params["trainable"], opt)
    step = jax.jit(train_loop.make_train_step(
        lambda p, b: model.loss_fn(p, cfg, b), opt))
    tail_m: list[dict] = []
    for i in range(steps):
        batch = jax.tree.map(
            jnp.asarray, synthetic_grounding_batch(cfg, 8, seed=i))
        state, m = step(state, params["frozen"], batch)
        if i >= steps - tail:
            tail_m.append({k: float(v) for k, v in m.items()})
    n = len(tail_m)
    return {k: round(sum(m[k] for m in tail_m) / n, 4)
            for k in ("aiou", "sam_aiou", "loss")}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--tail", type=int, default=40,
                    help="steps averaged for the final metrics")
    args = ap.parse_args()

    from flmm_tpu.configs.deepseek_vl import tiny
    from flmm_tpu.registry import with_sam_size

    native = tiny()
    half = with_sam_size(tiny(), native.sam.encoder.img_size // 2)
    results = {}
    for name, cfg in (("native", native), ("half", half)):
        size = cfg.sam.encoder.img_size
        print(f"training {name} (sam_size={size})...", flush=True)
        results[name] = {"sam_size": size,
                         **run(cfg, args.steps, args.lr, args.tail)}
        print(json.dumps({name: results[name]}), flush=True)
    delta = round(results["half"]["sam_aiou"] - results["native"]["sam_aiou"],
                  4)
    print(json.dumps({"proxy": "tiny-twin derivable grounding task",
                      "steps": args.steps,
                      "sam_aiou_delta_half_vs_native": delta,
                      **{k: v for k, v in results.items()}}))


if __name__ == "__main__":
    main()
