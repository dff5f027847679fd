#!/usr/bin/env python
"""Measured full-size training step: device time vs host data overlap.

VERDICT r3 item 8: the README's "~4-8 s/step at bs4" conflated the
device step with inline host-side 1024^2 synthetic data generation.
This driver separates the two on the real chip:

  a) device-only steady state: N pre-built batches, steps chained
     through the carried train state (the optimizer state is a device
     dependency, so the device serialises all N steps; one final fetch);
  b) host generation cost: wall time to synthesize one batch on host;
  c) overlapped loop: PrefetchLoader (worker threads) feeding the same
     jitted step -- the production shape.  overlap factor =
     (a+b)/c per step.

Run: JAX_PLATFORMS=axon python scripts/train_overlap_bench.py \
        [--batch-size 4] [--steps 6] [--preset 1_3b]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--family", default="deepseek_vl")
    ap.add_argument("--preset", default="1_3b")
    ap.add_argument("--workers", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from flmm_tpu.data.loader import EpochSampler, PrefetchLoader
    from flmm_tpu.data.synthetic import synthetic_batch
    from flmm_tpu.registry import get_config, get_model
    from flmm_tpu.train import loop as train_loop

    cfg = get_config(args.family, args.preset)
    model = get_model(args.family)
    params = model.init_params(cfg, jax.random.key(0))
    opt = train_loop.make_optimizer(train_loop.OptimConfig())
    state = train_loop.init_state(params["trainable"], opt)
    step = jax.jit(train_loop.make_train_step(
        lambda p, b: model.loss_fn(p, cfg, b), opt))
    frozen = params["frozen"]

    # b) host generation cost (one batch, after a warm call)
    synthetic_batch(cfg, batch_size=args.batch_size, seed=999)
    t0 = time.perf_counter()
    synthetic_batch(cfg, batch_size=args.batch_size, seed=998)
    host_s = time.perf_counter() - t0

    # a) device-only: pre-built batches, chained through the train state
    batches = [jax.tree.map(jnp.asarray, synthetic_batch(
        cfg, batch_size=args.batch_size, seed=i))
        for i in range(args.steps + 1)]
    state, m = step(state, frozen, batches[0])  # compile + warm
    float(np.asarray(m["loss"]))
    t0 = time.perf_counter()
    for b in batches[1:]:
        state, m = step(state, frozen, b)
    float(np.asarray(m["loss"]))  # one fetch serialises all steps
    device_s = (time.perf_counter() - t0) / args.steps

    # c) overlapped: PrefetchLoader workers build batches while the
    # device steps (batch_size=1 at the loader level: collate_fn builds
    # the full batch per index so the device sees identical shapes)
    def sample_fn(i):
        return synthetic_batch(cfg, batch_size=args.batch_size,
                               seed=1000 + i)

    loader = PrefetchLoader(
        sample_fn, lambda xs: xs[0], EpochSampler(args.steps + 1, seed=0),
        batch_size=1, num_workers=args.workers, prefetch=2)
    it = loader.epoch(0)
    state, m = step(state, frozen, jax.tree.map(jnp.asarray, next(it)))
    float(np.asarray(m["loss"]))
    t0 = time.perf_counter()
    n = 0
    for b in it:
        state, m = step(state, frozen, jax.tree.map(jnp.asarray, b))
        n += 1
    float(np.asarray(m["loss"]))
    overlapped_s = (time.perf_counter() - t0) / max(1, n)

    print(json.dumps({
        "preset": args.preset, "batch_size": args.batch_size,
        "device_step_s": round(device_s, 3),
        "host_batch_gen_s": round(host_s, 3),
        "overlapped_step_s": round(overlapped_s, 3),
        "overlap_factor": round((device_s + host_s)
                                / max(overlapped_s, 1e-9), 3),
        "steps_per_s_overlapped": round(1.0 / max(overlapped_s, 1e-9), 4),
    }))


if __name__ == "__main__":
    main()
