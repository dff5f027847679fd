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

# hermetic CPU run: the session presets the axon TPU platform, and the
# env var alone is not enough once the plugin registered (verify skill)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def run(cfg, steps: int, lr: float, tail: int, seed: int = 0) -> dict:
    from flmm_tpu.data.synthetic import synthetic_grounding_batch
    from flmm_tpu.models.frozen import grounding as model
    from flmm_tpu.train import loop as train_loop

    params = model.init_params(cfg, jax.random.key(seed))
    opt = train_loop.make_optimizer(train_loop.OptimConfig(
        lr=lr, total_steps=steps, warmup_ratio=0.05))
    state = train_loop.init_state(params["trainable"], opt)
    step = jax.jit(train_loop.make_train_step(
        lambda p, b: model.loss_fn(p, cfg, b), opt))
    tail_m: list[dict] = []
    for i in range(steps):
        batch = jax.tree.map(
            jnp.asarray,
            synthetic_grounding_batch(cfg, 8, seed=i + 100000 * seed))
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
    ap.add_argument("--sizes", type=float, nargs="*",
                    default=[1.0, 0.75, 0.625, 0.5, 0.375],
                    help="SAM-size fractions of native (tiny twin native "
                         "128 ~ deployment 1024; 0.75~768, 0.625~640, "
                         "0.5~512, 0.375~384; 448 is not patch-divisible "
                         "at tiny scale)")
    ap.add_argument("--seeds", type=int, default=3,
                    help="independent init+data seeds per size")
    args = ap.parse_args()

    from flmm_tpu.configs.deepseek_vl import tiny
    from flmm_tpu.registry import with_sam_size

    native_size = tiny().sam.encoder.img_size
    patch = tiny().sam.encoder.patch_size
    results = {}
    for frac in args.sizes:
        size = int(round(native_size * frac / patch)) * patch
        cfg = with_sam_size(tiny(), size)
        per_seed = []
        for s in range(args.seeds):
            m = run(cfg, args.steps, args.lr, args.tail, seed=s)
            per_seed.append(m)
            print(json.dumps({"frac": frac, "sam_size": size, "seed": s,
                              **m}), flush=True)
        keys = per_seed[0].keys()
        mean = {k: round(sum(m[k] for m in per_seed) / len(per_seed), 4)
                for k in keys}
        spread = {k: round(max(m[k] for m in per_seed)
                           - min(m[k] for m in per_seed), 4) for k in keys}
        results[f"{frac}"] = {"sam_size": size, "mean": mean,
                              "spread": spread}
        print(json.dumps({f"{frac}": results[f"{frac}"]}), flush=True)
    print(json.dumps({"proxy": "tiny-twin derivable grounding task",
                      "steps": args.steps, "seeds": args.seeds,
                      "curve": results}))


if __name__ == "__main__":
    main()
