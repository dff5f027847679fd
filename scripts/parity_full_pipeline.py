#!/usr/bin/env python
"""COMPOSED full-size full-pipeline parity vs one torch oracle chain.

Rounds 2-3 proved each half at real dimensions in isolation
(``parity_full_size.py``: decoder/SigLIP/aligner; ``parity_sam_full.py``:
SAM + U-Net + refine chain).  The capture -> merge -> unpad -> prompt-build
seam between them was pinned only at tiny dims.  This script closes that
gap (VERDICT r3 item 3): ONE fabricated random-weight checkpoint set at
the real DeepSeek-VL-1.3B + SAM ViT-L dimensions is pushed through our
converters, and ONE ``model.forward`` over a real non-square image is
compared against a single composed torch oracle transcribed from the
reference end to end:

  torch:  embed -> aligner(vit(px)) overwrite -> LlamaModel(eager,
          output_attentions) -> per-mask mean-merge over matched token
          columns (frozen_deepseek_vl.py:116-161) -> mmseg U-Net ->
          meta unpad -> SAMWrapper.forward transcription
          (mask_refiner.py:71-124: ResizeLongestSide encode, box from
          thresholded sigmoid at original res, 256^2 dense prompt, text
          tokens appended to sparse embeddings, mask decoder).
  ours:   data pipeline (square-pad + SAM preprocess + collate) ->
          models.frozen.deepseek_vl.forward (one jitted call).

Compared: (a) coarse U-Net logits after identical meta unpad (tight
tolerance -- same f32 math end to end), (b) SAM low-res logits (loose
tolerance: the TPU redesign quantises the box in a fixed 256 frame and
resamples the dense prompt in one bilinear pass instead of the
reference's 64 -> 1024 -> 256 double pass; both conventions documented in
models/mask_head/refiner.py), (c) thresholded SAM masks by IoU.

Run on CPU (~20-40 min, ~25 GB RAM):
``JAX_PLATFORMS=cpu python scripts/parity_full_pipeline.py``
"""

from __future__ import annotations

import json
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np
import torch
import torch.nn.functional as F

from parity_full_size import TimmViTOracle
from parity_sam_full import MMsegUNetOracle, _stub_torchvision

RESULTS = []


def report(component: str, value: float, threshold: float, kind: str):
    ok = value < threshold
    RESULTS.append(ok)
    print(json.dumps({"component": component, kind: round(value, 6),
                      "threshold": threshold, "ok": bool(ok)}), flush=True)


def compare(component, got, want, tol):
    got = np.asarray(got, np.float32).ravel()
    want = np.asarray(want, np.float32).ravel()
    corr = float(np.corrcoef(got, want)[0, 1])
    print(json.dumps({"component": component + "_corr",
                      "corr": round(corr, 8)}), flush=True)
    report(component, float(np.abs(got - want).max()), tol, "max_abs_diff")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from PIL import Image
    from transformers import LlamaConfig, LlamaForCausalLM

    _stub_torchvision()
    sys.path.insert(0, "/root/reference")
    from segment_anything import sam_model_registry
    from segment_anything.utils.transforms import ResizeLongestSide

    from flmm_tpu.configs.deepseek_vl import deepseek_vl_1_3b
    from flmm_tpu.convert import load as load_mod
    from flmm_tpu.data.collate import BatchSpec, build_batch
    from flmm_tpu.data.processors import (
        ProcessorConfig, square_pad_preprocess,
    )
    from flmm_tpu.models.frozen import deepseek_vl as model
    from flmm_tpu.registry import FAMILY_SIZE_RULES

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    cfg = deepseek_vl_1_3b(dtype=jnp.float32)
    d = cfg.llm
    n_img, g = cfg.num_img_tokens, cfg.clip_shape  # 576, 24

    # ---- 1. fabricate all three checkpoints at real dims ------------
    hf_cfg = LlamaConfig(
        vocab_size=d.vocab_size, hidden_size=d.hidden_size,
        num_hidden_layers=d.num_layers, num_attention_heads=d.num_heads,
        num_key_value_heads=d.num_kv_heads, head_dim=d.head_dim,
        intermediate_size=d.intermediate_size, rope_theta=d.rope_theta,
        rms_norm_eps=d.rms_eps, attn_implementation="eager",
        tie_word_embeddings=False,
    )
    print("building torch LlamaForCausalLM (1.3B, f32)...", flush=True)
    torch_llm = LlamaForCausalLM(hf_cfg).eval()
    vit_oracle = TimmViTOracle().eval()
    al0 = torch.nn.Linear(1024, d.hidden_size)
    al2 = torch.nn.Linear(d.hidden_size, d.hidden_size)

    sd = {}
    for k, v in torch_llm.state_dict().items():
        sd["language_model." + k] = v
    for k, v in vit_oracle.timm_state_dict().items():
        sd["vision_model.vision_tower." + k] = v
    sd["aligner.layers.0.weight"] = al0.weight
    sd["aligner.layers.0.bias"] = al0.bias
    sd["aligner.layers.2.weight"] = al2.weight
    sd["aligner.layers.2.bias"] = al2.bias
    tmp = pathlib.Path(tempfile.mkdtemp(prefix="fabricated_pipeline_"))
    torch.save({k: v.detach().clone() for k, v in sd.items()},
               tmp / "pytorch_model.bin")
    del sd

    print("building torch SAM ViT-L...", flush=True)
    sam = sam_model_registry["vit_l"](checkpoint=None).float().eval()
    with torch.no_grad():
        for p in sam.parameters():
            if float(p.detach().std()) == 0.0 and p.numel() > 1:
                p.copy_(p.mean() + torch.randn_like(p) * 0.05)
    sam_pth = tmp / "sam_vit_l_fab.pth"
    torch.save(sam.state_dict(), sam_pth)

    unet_oracle = MMsegUNetOracle().eval()
    text_proj = torch.nn.Linear(d.hidden_size, 256)
    trained_sd = {"text_proj.weight": text_proj.weight.detach(),
                  "text_proj.bias": text_proj.bias.detach(),
                  "text_layer_weights": torch.randn(d.num_layers) * 0.1}
    for k, v in unet_oracle.state_dict().items():
        trained_sd["mask_head." + k] = v
    for k, v in sam.prompt_encoder.state_dict().items():
        trained_sd["sam.model.prompt_encoder." + k] = v
    for k, v in sam.mask_decoder.state_dict().items():
        trained_sd["sam.model.mask_decoder." + k] = v
    trained_pth = tmp / "flmm_trained_fab.pth"
    torch.save({"state_dict": trained_sd}, trained_pth)

    # ---- 2. one real input -------------------------------------------
    W0, H0 = 640, 480  # non-square so the unpad/geometry seam is real
    img_arr = rng.integers(0, 255, (H0, W0, 3)).astype(np.uint8)
    image = Image.fromarray(img_arr)
    masks = np.zeros((2, H0, W0), np.float32)
    masks[0, 60:240, 80:320] = 1.0
    masks[1, 260:440, 360:600] = 1.0

    img_start = cfg.img_start  # 5
    text_tail = 24
    ids = np.concatenate([
        rng.integers(10, 1000, (img_start,)),
        np.full((n_img,), 100515),  # image placeholder id (any: overwritten)
        rng.integers(10, 1000, (text_tail,)),
    ]).astype(np.int32)
    S_real = len(ids)
    mask_ids_arr = np.full((S_real,), -1, np.int32)
    spans = [(img_start + n_img + 2, img_start + n_img + 8),
             (img_start + n_img + 12, img_start + n_img + 18)]
    for m, (lo, hi) in enumerate(spans):
        mask_ids_arr[lo:hi] = m

    # ---- 3. our side: data pipeline + one forward --------------------
    proc_cfg = ProcessorConfig(size=cfg.input_size,
                               size_rule=FAMILY_SIZE_RULES["deepseek_vl"])
    spec = BatchSpec(seq_len=S_real + 19, max_masks=2, text_per_mask=8,
                     coarse_hw=(64, 64), sam_size=1024, prompt_size=256,
                     processor=proc_cfg, expected_img_start=img_start)
    sample = {"input_ids": ids, "mask_ids": mask_ids_arr,
              "img_start": img_start, "image": image, "masks": masks,
              "spans": spans}
    batch = build_batch([sample], spec)
    batch = jax.tree.map(
        jnp.asarray, {k: v for k, v in batch.items() if k != "infos"})

    print("converting frozen + trained checkpoints...", flush=True)
    frozen = load_mod.deepseek_vl_frozen(str(tmp), cfg, str(sam_pth))
    trainable = load_mod.reference_trained(str(trained_pth), cfg)
    params = {"frozen": jax.tree.map(jnp.asarray, frozen),
              "trainable": jax.tree.map(jnp.asarray, trainable)}

    print("our composed forward (compile + run, full dims)...", flush=True)
    out = jax.jit(lambda p, b: model.forward(p, cfg, b))(params, batch)
    got_coarse = np.asarray(out["coarse_logits"][0])   # (2, 64, 64)
    got_sam = np.asarray(out["sam_logits"][0])         # (2, 256, 256)

    # ---- 4. torch oracle chain ---------------------------------------
    # 4a. multimodal embeds exactly like prepare_inputs_embeds
    px = np.asarray(batch["pixel_values"][0])  # shared preprocessing
    with torch.no_grad():
        feats = vit_oracle(torch.from_numpy(px.transpose(2, 0, 1)[None]))
        img_embeds = al2(F.gelu(al0(feats)))
        embeds = torch_llm.model.embed_tokens(
            torch.from_numpy(ids[None].astype(np.int64)))
        embeds[0, img_start:img_start + n_img] = img_embeds[0]
        print("torch 1.3B forward with attentions...", flush=True)
        outputs = torch_llm.model(
            inputs_embeds=embeds, output_attentions=True,
            output_hidden_states=True, use_cache=False, return_dict=True)

    # 4b. merge (frozen_deepseek_vl.py:121-146)
    img_cols = np.zeros((S_real,), bool)
    img_cols[img_start:img_start + n_img] = True
    with torch.no_grad():
        attentions = [a[0, ..., torch.from_numpy(img_cols)]
                      .view(d.num_heads, S_real, g, g)
                      for a in outputs.attentions]
        hidden = torch.stack([h[0] for h in
                              outputs.hidden_states[-d.num_layers:]])
        lw = torch.softmax(trained_sd["text_layer_weights"], dim=0)
        hidden = (hidden * lw.view(-1, 1, 1)).sum(0)  # (S, D)

        mask_attentions, text_embeds = [], []
        for mid in range(2):
            matched = torch.from_numpy(mask_ids_arr == mid)
            mask_attentions.append(torch.cat(
                [attn[:, matched].mean(1) for attn in attentions]))
            text_embeds.append(text_proj(hidden[matched]))
        mask_attentions = torch.stack(mask_attentions)  # (2, 384, 24, 24)
        want_coarse = unet_oracle(mask_attentions)[:, 0]  # (2, 64, 64)

    # 4c. meta unpad (frozen_deepseek_vl.py:151-161)
    meta = square_pad_preprocess(image, proc_cfg)["meta"]
    ph, pw = (meta["padded_shape"]["height"], meta["padded_shape"]["width"])
    mh, mw = want_coarse.shape[-2:]
    bh = int(meta["padding"]["before_height"] * mh / ph)
    bw = int(meta["padding"]["before_width"] * mw / pw)
    ch = int(meta["image_shape"]["height"] * mh / ph + 0.5)
    cw = int(meta["image_shape"]["width"] * mw / pw + 0.5)
    want_unpad = want_coarse[:, bh:bh + ch, bw:bw + cw]
    got_unpad = got_coarse[:, bh:bh + ch, bw:bw + cw]
    compare("coarse_unet_unpadded_full_dims", got_unpad,
            want_unpad.numpy(), tol=5e-3)

    # 4d. SAMWrapper.forward transcription (mask_refiner.py:71-124)
    print("torch SAM ViT-L 1024 forward...", flush=True)
    transform = ResizeLongestSide(1024)
    with torch.no_grad():
        # apply_image inlined (transforms.py:26-31 routes through the
        # stubbed torchvision, whose PIL path is exactly PIL BILINEAR)
        th_, tw_ = ResizeLongestSide.get_preprocess_shape(H0, W0, 1024)
        tin = np.array(image.resize((tw_, th_), Image.BILINEAR))
        input_size = tin.shape[:2]
        tin = torch.from_numpy(tin).permute(2, 0, 1)[None].float()
        emb_t = sam.image_encoder(sam.preprocess(tin))

        pm = want_unpad
        pad_value = min(-1.0, float(pm.min()))
        pmasks = F.interpolate(pm[:, None].float(), size=input_size,
                               mode="bilinear")
        pmasks = F.pad(pmasks, (0, 1024 - input_size[1],
                                0, 1024 - input_size[0]), value=pad_value)
        prompt_masks = F.interpolate(pmasks.float(), size=(256, 256),
                                     mode="bilinear")
        pred_up = F.interpolate(pm.detach()[None].float().sigmoid(),
                                size=(H0, W0), mode="bilinear")[0]
        pred_up = (pred_up > 0.5).float()

        want_low, want_masks = [], []
        for i in range(2):
            ys, xs = np.where(pred_up[i].numpy() > 0)
            if len(ys):
                box = np.array([xs.min(), ys.min(), xs.max() + 1,
                                ys.max() + 1])
            else:
                box = np.array([0.0, 0.0, W0, H0])
            box = transform.apply_boxes(box.astype(np.float32), (H0, W0))
            sp, de = sam.prompt_encoder(
                points=None, boxes=torch.from_numpy(
                    box.astype(np.float32))[None, :],
                masks=prompt_masks[i].view(1, 1, 256, 256))
            sp = torch.cat([sp, text_embeds[i][None]], dim=1)
            low, _ = sam.mask_decoder(
                image_embeddings=emb_t,
                image_pe=sam.prompt_encoder.get_dense_pe(),
                sparse_prompt_embeddings=sp,
                dense_prompt_embeddings=de,
                multimask_output=False)
            want_low.append(low[0, 0].numpy())
            final = sam.postprocess_masks(low, input_size, (H0, W0))
            want_masks.append((final[0, 0].numpy() > 0).astype(np.float32))
    want_low = np.stack(want_low)

    # conventions differ on box quantisation + dense-prompt resampling
    # (refiner.py docstring), so logits agree loosely but the thresholded
    # masks must coincide
    compare("sam_low_res_logits_composed", got_sam, want_low, tol=1.0)
    from flmm_tpu.evalsuite.runner import sam_logits_to_masks

    got_masks = sam_logits_to_masks(got_sam, tuple(input_size), (H0, W0))
    iou = []
    for i in range(2):
        a = np.asarray(got_masks[i]) > 0
        b = want_masks[i] > 0
        iou.append(float((a & b).sum()) / max(1, float((a | b).sum())))
    report("sam_final_mask_iou_deficit", 1.0 - min(iou), 0.05, "value")
    print(json.dumps({"component": "sam_final_mask_iou", "per_mask": iou}),
          flush=True)

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    if not all(RESULTS):
        raise SystemExit("PARITY FAILED")
    print("ALL COMPOSED FULL-PIPELINE PARITY CHECKS PASSED")


if __name__ == "__main__":
    main()
