"""Pinned short-budget torch-twin race (VERDICT r4 item 3).

The full 400-step result lives in RACE.json / README ("Torch-twin
race"): jax coarse aIoU 0.61 vs torch 0.00 (the reference transcription's
coarse head collapses to all-negative under the shared recipe), SAM aIoU
0.50 vs 0.52.  This test pins the two load-bearing facts at CI budget:

1. the two stacks compute the SAME function at init (identical converted
   weights -> step-0 coarse logits match to ~1e-6), so the race compares
   designs, not transcription bugs;
2. at a 60-step budget the jax stack's learning signal is at least as
   strong as the torch reference transcription's on identical batches.
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.conftest import reference_available

SCRIPTS = pathlib.Path(__file__).resolve().parent.parent / "scripts"
if str(SCRIPTS) not in sys.path:
    sys.path.insert(0, str(SCRIPTS))


@pytest.mark.slow
@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_twin_race_short_budget():
    from torch_twin_race import TorchTwin, run_jax, run_torch, tail_mean

    from flmm_tpu.configs.deepseek_vl import tiny
    from flmm_tpu.data.synthetic import synthetic_grounding_batch
    from flmm_tpu.models.frozen import deepseek_vl as model

    cfg = tiny()
    twin = TorchTwin(cfg, seed=0)
    params = twin.jax_params()

    # --- 1. identical function at init --------------------------------
    batch0 = synthetic_grounding_batch(cfg, 2, seed=0, orig_masks=True)
    attns, hidden, _ = twin._frozen_forward(batch0)
    mask_ids = np.asarray(batch0["mask_ids"])
    g = cfg.clip_shape
    maps = []
    for b in range(2):
        for m in range(2):
            matched = torch.tensor(mask_ids[b] == m)
            am = attns[:, b][:, :, matched].mean(2)
            maps.append(am.reshape(-1, g, g))
    with torch.no_grad():
        coarse_t = twin.unet(torch.stack(maps))[:, 0].numpy()
    jb = jax.tree.map(jnp.asarray,
                      {k: v for k, v in batch0.items() if k != "gt_orig"})
    coarse_j = np.asarray(model.forward(params, cfg, jb)[
        "coarse_logits"]).reshape(coarse_t.shape)
    np.testing.assert_allclose(coarse_j, coarse_t, atol=1e-4)

    # --- 2. short race on identical fresh batches ---------------------
    # 100 steps: the jax curve's rise starts ~step 65 (README: 0.0 @20,
    # 0.46 @80), so the tail-10 window must sit past it
    steps, bs, lr = 100, 8, 5e-3
    batches = [synthetic_grounding_batch(cfg, bs, seed=i, orig_masks=True)
               for i in range(steps)]
    tc = run_torch(twin, batches, lr, steps)
    jc = run_jax(cfg, params, batches, lr, steps)
    t_a, j_a = tail_mean(tc, "aiou", 10), tail_mean(jc, "aiou", 10)
    t_s, j_s = tail_mean(tc, "sam_aiou", 10), tail_mean(jc, "sam_aiou", 10)
    # jax must match-or-beat the torch transcription (margin for seed
    # noise; the 400-step margins are far larger, see RACE.json).
    # NB: this tree starts from the TORCH modules' init distributions,
    # whose coarse-head rise comes later than our native init's (the
    # absolute learns-to-ground receipt with native init is pinned by
    # tests/test_train.py); at this budget the discriminative signal is
    # the SAM head, measured jax 0.109 vs torch 0.041 at step 90-100.
    assert j_a >= t_a - 0.05, (j_a, t_a)
    assert j_s >= t_s - 0.05, (j_s, t_s)
    assert j_s > 0.06, (j_s, [c["sam_aiou"] for c in jc[-10:]])
