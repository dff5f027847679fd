"""End-to-end grounding throughput benchmark (single chip).

Measures the full F-LMM predict path on the flagship DeepSeek-VL-1.3B
geometry with random bf16 weights: SigLIP-L/384 tower -> aligner -> frozen
1.3B decoder with fused attention capture -> U-Net -> SAM ViT-L encoder ->
prompt/mask decoder.  Metric: grounded images/sec/chip end-to-end
(BASELINE.json target: >= 20 on v5e).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp


def build(batch_size: int):
    import os

    from flmm_tpu.configs.deepseek_vl import deepseek_vl_1_3b
    from flmm_tpu.data.synthetic import synthetic_batch
    from flmm_tpu.models.frozen import deepseek_vl as model

    # S=672 with the raw prompt layout (img_start=5): measured faster on
    # v5e than the 128-aligned flash-capture layout at this length (the
    # capture kernel only wins at anyres scale; see configs/deepseek_vl).
    # BENCH_SAM_SIZE (default 1024 = reference-exact) selects the SAM
    # reduced-resolution schedule for speed/accuracy-tradeoff measurement.
    cfg = deepseek_vl_1_3b(
        sam_img_size=int(os.environ.get("BENCH_SAM_SIZE", "1024")))
    if os.environ.get("BENCH_GLOBAL_BLOCK") == "1":
        # A/B knob for the whole-block global-layer kernel experiment
        # (ops/global_block.py; see SamEncoderConfig.global_block_fused)
        import dataclasses
        cfg = dataclasses.replace(cfg, sam=dataclasses.replace(
            cfg.sam, encoder=dataclasses.replace(
                cfg.sam.encoder, global_block_fused=True)))
    params = model.init_params(cfg, jax.random.key(0))
    batch = jax.tree.map(
        jnp.asarray,
        synthetic_batch(cfg, batch_size=batch_size, seq_len=672, max_masks=8,
                        text_tokens_per_mask=12),
    )

    @jax.jit
    def predict(params, batch, chain):
        # ``chain`` is the previous iteration's checksum (device scalar,
        # never fetched mid-run): folding it into the input makes every
        # iteration data-depend on the one before, so the device MUST
        # serialise the full compute of all iterations even though the
        # host only fetches the final scalar -- the honest steady-state
        # throughput pattern (per-iteration fetches would bill the
        # ~34 ms relay RTT floor to every batch).
        b = dict(batch)
        b["pixel_values"] = batch["pixel_values"] + 1e-12 * chain
        out = model.forward(params, cfg, b)
        # tiny checksum output: forces real execution on relay backends
        # whose block_until_ready can return before compute finishes
        return jnp.sum(out["sam_logits"][:, :, ::64, ::64])

    return predict, params, batch


def run(batch_size: int, iters: int = 6) -> float:
    import numpy as np

    predict, params, batch = build(batch_size)
    # Distinct inputs per iteration: identical dispatches can be memoised by
    # remote-relay backends, which would fake the timing.  (The chained
    # checksum also perturbs them, but keep an explicit offset too.)
    batches = []
    for i in range(iters + 2):
        b = dict(batch)
        b["pixel_values"] = batch["pixel_values"] + 0.001 * (i + 1)
        batches.append(b)
    # warmup + compile; fetch the checksum to ensure completion
    chain = jnp.float32(0.0)
    for b in batches[:2]:
        chain = predict(params, b, chain)
        float(np.asarray(chain))
    t0 = time.perf_counter()
    for b in batches[2:]:
        chain = predict(params, b, chain)
    # ONE fetch: its value transitively depends on every iteration's
    # compute, so this serialises on true completion of the whole run.
    float(np.asarray(chain))
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def main():
    import os

    target = 20.0  # images/sec/chip (BASELINE.json)
    last_err = None
    # bs 4 is the measured-best serving point on v5e at SAM-1024 (18.4
    # img/s vs 17.2 at bs 8; kernel_bench shows the refine/tower stages
    # scale sub-linearly below bs 8 while the MXU-bound stages are flat
    # per image).  Batch size is a server tunable; the bench reports the
    # best measured point and falls through on OOM.
    sizes = tuple(int(b) for b in os.environ.get(
        "BENCH_BS", "4,8,2,1").split(","))
    for bs in sizes:
        try:
            ips = run(bs)
            print(json.dumps({
                "metric": "grounded_images_per_sec_per_chip",
                "value": round(ips, 3),
                "unit": "img/s",
                "vs_baseline": round(ips / target, 3),
            }))
            return
        except Exception as e:  # OOM etc: retry smaller
            last_err = e
            print(f"bench batch={bs} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    raise SystemExit(f"bench failed at all batch sizes: {last_err}")


if __name__ == "__main__":
    main()
