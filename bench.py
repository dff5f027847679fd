"""End-to-end grounding throughput benchmark (single chip).

Measures the full F-LMM predict path at real released-model geometry
with random bf16 weights.  Default: the flagship DeepSeek-VL-1.3B
(SigLIP-L/384 tower -> aligner -> frozen 1.3B decoder with fused
attention capture -> U-Net -> SAM ViT-L encoder -> prompt/mask decoder).
Metric: grounded images/sec/chip end-to-end (BASELINE.json target: >= 20
on v5e).

Env knobs (the driver contract -- ONE JSON line on stdout -- holds for
any combination):
  BENCH_FAMILY   deepseek_vl (default) | llava_next | mgm | llava | hpt
  BENCH_PRESET   family preset (default: the flagship per family)
  BENCH_SAM_SIZE SAM encoder resolution (default 1024 = reference-exact;
                 the reduced-resolution deployment schedule)
  BENCH_BS       comma list of batch sizes to try (default "4,8,2,1")
  BENCH_ITERS    chained steady-state iterations (default 6)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

FLAGSHIP = {
    "deepseek_vl": "1_3b",
    "llava": "1_5_7b",
    "llava_next": "vicuna_7b",
    "mgm": "gemma_2b",
    "hpt": "air_1_5",
}


def _family_batch(cfg, family: str, batch_size: int, seq_len: int):
    """Schema-exact synthetic batch at the family's real geometry."""
    base = cfg.base if hasattr(cfg, "base") else cfg
    if family in ("deepseek_vl", "llava", "hpt"):
        from flmm_tpu.data.synthetic import synthetic_batch

        return synthetic_batch(cfg, batch_size=batch_size, seq_len=seq_len,
                               max_masks=8, text_tokens_per_mask=12)
    from flmm_tpu.data.collate import BatchSpec
    from flmm_tpu.data.processors import ProcessorConfig
    from flmm_tpu.data.synthetic import synthetic_samples
    from flmm_tpu.registry import get_batch_builder, get_coarse_hw

    if family == "mgm":
        build = get_batch_builder(
            "mgm", crop_size=base.vision.image_size,
            aux_size=cfg.aux.image_size, image_grid=cfg.image_grid,
            image_global=cfg.image_global)
    else:  # llava_next: anyres tiles (~5x image tokens)
        a = cfg.anyres_spec()
        build = get_batch_builder(
            "llava_next", tile_size=a.tile_size, patch_size=a.patch_size,
            pinpoints=a.pinpoints)
    samples = synthetic_samples(cfg, batch_size, seed=0, max_masks=8,
                                caption_tokens=12)
    S = max(seq_len, max(len(s["input_ids"]) for s in samples) + 8)
    # the anyres preset routes the decoder through the flash-capture
    # kernel (the eager S x S path OOMs at ~3k tokens): the kernel needs
    # S % 128 == 0 and a 128-aligned image block (decoder.flash_capture_ok)
    align = 128 if getattr(base.llm, "use_flash_capture", False) else None
    if align:
        S = -(-S // align) * align
    spec = BatchSpec(
        seq_len=S,
        max_masks=8, text_per_mask=12, coarse_hw=get_coarse_hw(cfg),
        sam_size=base.sam.encoder.img_size,
        prompt_size=base.sam.prompt_size,
        align_image_block=align, expected_img_start=base.img_start,
        processor=ProcessorConfig(size=base.input_size))
    b = build(samples, spec)
    b.pop("infos", None)
    return b


def _fabricate_int8_llm(llm_cfg, key):
    """Random int8-quantized decoder tree, built directly on device.

    For the random-weight throughput bench, materializing the bf16 tree
    only to stream-quantize it wastes HBM: Llama-3-8B bf16 is 16.1 GB
    and OOMs a 16 GB chip in init_params itself, before
    ``llm.decoder.quantize_params`` can run (measured: hpt air-1.5).
    Fabricate the exact tree quantize_params would return -- the layers'
    3-D projections as ``<name>_q`` int8 + ``<name>_s`` f32 per-(layer,
    out-channel) scales, embed/norms in the config dtype -- one leaf at
    a time, so peak HBM is the int8 resident size (~8 GB at 8B).
    """
    import jax.tree_util as jtu

    from flmm_tpu.models.llm import decoder as llm_dec

    abstract = jax.eval_shape(lambda k: llm_dec.init_params(llm_cfg, k),
                              key)
    abstract.pop("lm_head", None)
    layers = dict(abstract["layers"])
    for name in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        w = layers.get(name)
        if w is None or w.ndim != 3:  # absent, or (L, E, ...) MoE stack
            continue
        layers.pop(name)
        layers[name + "_q"] = jax.ShapeDtypeStruct(w.shape, jnp.int8)
        layers[name + "_s"] = jax.ShapeDtypeStruct(
            w.shape[:-2] + w.shape[-1:], jnp.float32)
    abstract = dict(abstract, layers=layers)

    flat, treedef = jtu.tree_flatten_with_path(abstract)
    keys = jax.random.split(key, len(flat))
    vals = []
    for k, (path, a) in zip(keys, flat):
        name = getattr(path[-1], "key", "")
        if a.dtype == jnp.int8:
            def one(kk, shape=a.shape[1:]):
                return jax.random.randint(kk, shape, -127, 128,
                                          jnp.int32).astype(jnp.int8)
            if a.size > 2**28 and a.ndim > 2:
                # randint materializes int32 first: whole-tensor that is
                # a 7.5 GB transient at the 8B (L, d, f) stacks -- bound
                # it to one layer slice (same discipline as
                # llm.decoder.init_params' big-tensor branch)
                v = jax.lax.map(one, jax.random.split(k, a.shape[0]))
            else:
                v = one(k, a.shape)
        elif name.endswith("_s"):
            # scale so q*s has weight-like magnitude (~1/sqrt(fan_in))
            v = jnp.full(a.shape, 3e-4, jnp.float32)
        elif name.startswith("ln") or name == "final_norm":
            v = (jnp.zeros(a.shape, a.dtype)
                 if llm_cfg.gemma_norm else jnp.ones(a.shape, a.dtype))
        else:  # embed / attn biases
            v = (0.02 * jax.random.normal(k, a.shape,
                                          jnp.float32)).astype(a.dtype)
        jax.block_until_ready(v)
        vals.append(v)
    return jtu.tree_unflatten(treedef, vals)


def _patch_layer_weights(tree, num_layers: int):
    """Re-shape any ``text_layer_weights`` leaf to the real layer count
    (the surrounding tree was initialised with a 1-layer llm twin)."""
    if isinstance(tree, dict):
        return {k: (jnp.ones((num_layers,), jnp.float32)
                    if k == "text_layer_weights"
                    else _patch_layer_weights(v, num_layers))
                for k, v in tree.items()}
    return tree


def build(batch_size: int):
    family = os.environ.get("BENCH_FAMILY", "deepseek_vl")
    preset = os.environ.get("BENCH_PRESET", FLAGSHIP[family])
    from flmm_tpu.registry import get_config, get_model, with_sam_size

    # S=672 with the raw prompt layout (img_start=5): measured faster on
    # v5e than the 128-aligned flash-capture layout at this length (the
    # capture kernel only wins at anyres scale; see configs/deepseek_vl).
    # BENCH_SAM_SIZE (default 1024 = reference-exact) selects the SAM
    # reduced-resolution schedule for speed/accuracy-tradeoff measurement.
    sam_size = int(os.environ.get("BENCH_SAM_SIZE", "1024"))
    cfg = get_config(family, preset)
    base = cfg.base if hasattr(cfg, "base") else cfg
    # flash-capture presets (anyres) need a 128-aligned image block: carry
    # the aligned offset in the config exactly like resolve_family_setup
    # does for the real tokenizer path, so model slice == data layout.
    if ((getattr(base.llm, "use_flash_capture", False)
         or base.num_img_tokens >= 1024)
            and base.img_start % 128):
        cfg = get_config(family, preset,
                         img_start=-(-base.img_start // 128) * 128)
        base = cfg.base if hasattr(cfg, "base") else cfg
    if sam_size != base.sam.encoder.img_size:
        cfg = with_sam_size(cfg, sam_size)
    enc_over = {}
    if os.environ.get("BENCH_GLOBAL_BLOCK") == "1":
        # A/B knob for the whole-block global-layer kernel experiment
        # (ops/global_block.py; see SamEncoderConfig.global_block_fused)
        enc_over["global_block_fused"] = True
    if os.environ.get("BENCH_GLOBAL_KERNEL"):
        # A/B knob for global-attention kernel variants (v8 production,
        # v11 no-max experiment in ops/sam_flash_experiments.py)
        enc_over["global_kernel"] = os.environ["BENCH_GLOBAL_KERNEL"]
    if enc_over:
        import dataclasses

        base = cfg.base if hasattr(cfg, "base") else cfg
        new_base = dataclasses.replace(base, sam=dataclasses.replace(
            base.sam, encoder=dataclasses.replace(
                base.sam.encoder, **enc_over)))
        cfg = (dataclasses.replace(cfg, base=new_base)
               if hasattr(cfg, "base") else new_base)
    model = get_model(family)
    quant = os.environ.get("BENCH_QUANT_LLM") == "1"
    base = cfg.base if hasattr(cfg, "base") else cfg
    if quant and family in ("deepseek_vl", "llava", "hpt"):
        # W8A8 int8 frozen decoder: the serving mode that fits the
        # 7B/8B flagships on one 16 GB chip.  Grounding-family benches
        # never materialize the bf16 decoder at all: init the rest of
        # the model with a 1-layer llm twin, then splice in a directly
        # fabricated int8 tree (Llama-3-8B bf16 is 16.1 GB -- init
        # itself OOMs before streaming quantization could help).
        import dataclasses

        small = dataclasses.replace(
            base, llm=dataclasses.replace(base.llm, num_layers=1))
        params = model.init_params(small, jax.random.key(0))
        params = _patch_layer_weights(params, base.llm.num_layers)
        params["frozen"]["llm"] = _fabricate_int8_llm(
            base.llm, jax.random.key(1))
    else:
        params = model.init_params(cfg, jax.random.key(0))
        if quant:
            # non-grounding families: stream-quantize the resident tree
            # (llm.decoder.quantize_params donates per leaf)
            from flmm_tpu.models.llm import decoder as llm_dec

            params["frozen"]["llm"] = llm_dec.quantize_params(
                params["frozen"]["llm"], consume=True)
    # the grounding forward never projects to vocab: drop the lm_head
    # (262 MB bf16 at 7B) so it does not occupy HBM in the serving graph
    if isinstance(params.get("frozen", {}).get("llm"), dict):
        params["frozen"]["llm"].pop("lm_head", None)
    seq_len = int(os.environ.get("BENCH_SEQ", "672"))
    # S=672 is the measured-best deepseek layout, but the image block must
    # fit: hpt air-1.5 carries 1024 image tokens at a 128-aligned start,
    # so lower-bound S to img_start + num_img_tokens + caption room
    # (128-aligned when the preset realigned the image block).
    base = cfg.base if hasattr(cfg, "base") else cfg
    need = (base.img_start + base.num_img_tokens + 40
            if family in ("deepseek_vl", "llava", "hpt") else 0)
    if seq_len < need:
        seq_len = (-(-need // 128) * 128 if base.img_start % 128 == 0
                   else need)
    batch = jax.tree.map(
        jnp.asarray, _family_batch(cfg, family, batch_size, seq_len))

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
        px_key = "pixel_values" if "pixel_values" in batch else "tiles"
        b[px_key] = batch[px_key] + 1e-12 * chain
        out = model.forward(params, cfg, b)
        # tiny checksum output: forces real execution on relay backends
        # whose block_until_ready can return before compute finishes
        return jnp.sum(out["sam_logits"][:, :, ::64, ::64])

    return predict, params, batch


def run(batch_size: int, iters: int | None = None) -> float:
    import numpy as np

    iters = iters or int(os.environ.get("BENCH_ITERS", "6"))
    predict, params, batch = build(batch_size)
    # Distinct inputs per iteration: identical dispatches can be memoised by
    # remote-relay backends, which would fake the timing.  (The chained
    # checksum also perturbs them, but keep an explicit offset too.)
    px_key = "pixel_values" if "pixel_values" in batch else "tiles"
    batches = []
    for i in range(iters + 2):
        b = dict(batch)
        b[px_key] = batch[px_key] + 0.001 * (i + 1)
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
                "bs": bs,
            }))
            return
        except Exception as e:  # OOM etc: retry smaller
            last_err = e
            print(f"bench batch={bs} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    raise SystemExit(f"bench failed at all batch sizes: {last_err}")


if __name__ == "__main__":
    main()
