#!/usr/bin/env python
"""Full-size SAM + mask-path parity vs the reference's own torch modules.

Round-2 proved conversion parity at real dims for the decoder/SigLIP/
aligner half (scripts/parity_full_size.py); this script does the same for
the SAM half (VERDICT r2 item 2).  The official ``sam_vit_l_0b3195.pth``
is unreachable (no network egress), so a random-weight torch SAM ViT-L is
built from the REFERENCE'S OWN code (/root/reference/segment_anything,
zero-initialised tables filled with noise), saved in the exact
checkpoint layout, pushed through our converters, and compared:

* image encoder at the real 1024 resolution (ViT-L 24L/16H/1024d);
* prompt encoder (boxes, dense mask prompts, points, dense PE);
* mask decoder + two-way transformer (padded-text token masking);
* the full refine chain vs a composed torch oracle transcribed from
  SAMWrapper.forward (flmm/models/mask_head/mask_refiner.py:71-124)
  -- box from the thresholded coarse mask, 256^2 dense prompt, text
  tokens appended to the sparse embeddings, decoder, low-res logits;
* the mmseg-layout U-Net head at real dims (in_channels = 24*16) and
  the ``text_proj``/``text_layer_weights`` pieces, through
  ``convert.load.reference_trained`` -- i.e. the released-F-LMM-
  checkpoint bridge is what gets parity-tested.

torchvision (needed only by the reference's AMG/transform helpers we do
not call) is stubbed.  Run on CPU:
``JAX_PLATFORMS=cpu python scripts/parity_sam_full.py``
"""

from __future__ import annotations

import json
import math
import pathlib
import sys
import tempfile
import types

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import torch
import torch.nn.functional as F

RESULTS = []


def report(component: str, max_abs: float, corr: float, tol: float):
    ok = max_abs < tol
    RESULTS.append(ok)
    print(json.dumps({
        "component": component, "max_abs_diff": round(max_abs, 6),
        "corr": round(corr, 8), "tol": tol, "ok": bool(ok),
    }), flush=True)


def compare(component, got, want, tol):
    got = np.asarray(got, np.float32).ravel()
    want = np.asarray(want, np.float32).ravel()
    corr = float(np.corrcoef(got, want)[0, 1])
    scale = float(want.std())
    assert scale > 1e-3, (component, "degenerate reference output", scale)
    report(component, float(np.abs(got - want).max()), corr, tol)


def _stub_torchvision():
    """The reference package imports torchvision at module scope for AMG
    NMS and PIL resizing; neither is used by the modules under test."""
    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    boxes = types.ModuleType("torchvision.ops.boxes")
    boxes.batched_nms = boxes.box_area = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("stub"))
    ops.boxes = boxes
    tr = types.ModuleType("torchvision.transforms")
    trf = types.ModuleType("torchvision.transforms.functional")
    trf.resize = trf.to_pil_image = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("stub"))
    tr.functional = trf
    tv.ops, tv.transforms = ops, tr
    for name, mod in (("torchvision", tv), ("torchvision.ops", ops),
                      ("torchvision.ops.boxes", boxes),
                      ("torchvision.transforms", tr),
                      ("torchvision.transforms.functional", trf)):
        sys.modules.setdefault(name, mod)


class MMsegUNetOracle(torch.nn.Module):
    """mmseg UNetHead at the reference's architecture (num_stages 4,
    GroupNorm(1), InterpConv, no conv bias under norm -- mmcv ConvModule
    bias='auto'), emitting the exact mmseg state-dict key layout the
    converter documents (convert/load.py:unet_params)."""

    def __init__(self, in_channels=384, base=64, num_stages=4,
                 enc_num_convs=(2, 2, 2, 2), dec_num_convs=(2, 2, 2),
                 upsample_input=64):
        super().__init__()
        self.num_stages = num_stages
        self.upsample_input = upsample_input

        def conv_module(cin, cout, k, pad):
            m = torch.nn.Module()
            m.conv = torch.nn.Conv2d(cin, cout, k, padding=pad, bias=False)
            m.gn = torch.nn.GroupNorm(1, cout)
            return m

        def basic_block(cin, cout, n):
            b = torch.nn.Module()
            b.convs = torch.nn.ModuleList(
                [conv_module(cin if j == 0 else cout, cout, 3, 1)
                 for j in range(n)])
            return b

        self.encoder = torch.nn.ModuleList()
        cin = in_channels
        for i in range(num_stages):
            cout = base * 2 ** i
            stage = torch.nn.ModuleList()
            if i > 0:
                stage.append(torch.nn.MaxPool2d(2))
            stage.append(basic_block(cin, cout, enc_num_convs[i]))
            self.encoder.append(stage)
            cin = cout
        self.decoder = torch.nn.ModuleList()
        for d in range(num_stages - 1):
            up = torch.nn.Module()
            cs = base * 2 ** d
            ups = torch.nn.ModuleList([
                torch.nn.Upsample(scale_factor=2, mode="bilinear",
                                  align_corners=False),
                conv_module(2 * cs, cs, 1, 0),
            ])
            up.upsample = torch.nn.Module()
            up.upsample.interp_upsample = ups
            up.conv_block = basic_block(2 * cs, cs, dec_num_convs[d])
            self.decoder.append(up)
        self.conv_seg = torch.nn.Conv2d(base, 1, 1)

    @staticmethod
    def _cm(m, x):
        return F.relu(m.gn(m.conv(x)))

    def forward(self, x):
        # UNetHead.forward: normalize, f32 upsample to >= upsample_input,
        # pad to 2**(num_stages-1), UNet, crop, conv_seg
        x_sum = x.sum((-2, -1), keepdims=True).clamp(min=1e-12)
        x = x / x_sum
        h, w = x.shape[-2:]
        scale = max(1.0, self.upsample_input / max(h, w))
        if scale > 1.0:
            x = F.interpolate(x.float(), scale_factor=scale, mode="bilinear")
            h, w = x.shape[-2:]
        div = 2 ** (self.num_stages - 1)
        ph = math.ceil(h / div) * div
        pw = math.ceil(w / div) * div
        px = x.new_zeros(*x.shape[:2], ph, pw)
        px[..., :h, :w] = x
        x = px
        enc_outs = []
        for i, stage in enumerate(self.encoder):
            for mod in stage:
                if isinstance(mod, torch.nn.MaxPool2d):
                    x = mod(x)
                else:
                    for cm in mod.convs:
                        x = self._cm(cm, x)
            enc_outs.append(x)
        for d in range(self.num_stages - 2, -1, -1):
            up = self.decoder[d]
            x = up.upsample.interp_upsample[0](x.float()).to(x.dtype)
            x = self._cm(up.upsample.interp_upsample[1], x)
            x = torch.cat([enc_outs[d], x], dim=1)
            for cm in up.conv_block.convs:
                x = self._cm(cm, x)
        x = x[..., :h, :w]
        return self.conv_seg(x)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    _stub_torchvision()
    sys.path.insert(0, "/root/reference")
    from segment_anything import sam_model_registry

    torch.manual_seed(0)
    print("building reference torch SAM ViT-L (random init)...", flush=True)
    sam = sam_model_registry["vit_l"](checkpoint=None).float().eval()
    # constant-initialised params would not exercise the conversion:
    # zero tables (rel_pos, pos_embed, biases) get noise, LN/scale
    # weights keep their mean (1) plus noise -- replacing ones with
    # near-zero noise would collapse every activation and make the
    # comparison trivially exact
    with torch.no_grad():
        for p in sam.parameters():
            if float(p.detach().std()) == 0.0 and p.numel() > 1:
                p.copy_(p.mean() + torch.randn_like(p) * 0.05)

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="fabricated_sam_"))
    sam_pth = tmp / "sam_vit_l_fab.pth"
    torch.save(sam.state_dict(), sam_pth)
    print(f"fabricated SAM checkpoint at {sam_pth}", flush=True)

    from flmm_tpu.configs.deepseek_vl import sam_vit_l
    from flmm_tpu.convert import load as load_mod
    from flmm_tpu.convert import sam_weights
    from flmm_tpu.models.mask_head import refiner as refiner_mod
    from flmm_tpu.models.mask_head import unet as unet_mod
    from flmm_tpu.models.sam import image_encoder as enc_mod
    from flmm_tpu.models.sam import mask_decoder as dec_mod
    from flmm_tpu.models.sam import prompt_encoder as prompt_mod

    cfg = sam_vit_l(dtype=jnp.float32, flash=False)
    sd = load_mod.load_state_dict(sam_pth)
    rng = np.random.default_rng(0)

    # ---- 1. image encoder at 1024 -----------------------------------
    enc_params = sam_weights.encoder_params(sd, cfg.encoder)
    px = rng.standard_normal((1, 3, 1024, 1024)).astype(np.float32) * 0.5
    print("torch ViT-L 1024 forward...", flush=True)
    with torch.no_grad():
        want_emb = sam.image_encoder(torch.from_numpy(px)).numpy()
    print("jax ViT-L 1024 forward...", flush=True)
    got_emb = np.asarray(enc_mod.forward(
        enc_params, cfg.encoder, jnp.asarray(px.transpose(0, 2, 3, 1))))
    compare("sam_encoder_1024", got_emb.transpose(0, 3, 1, 2), want_emb,
            tol=5e-3)

    # ---- 2. prompt encoder ------------------------------------------
    pparams = sam_weights.prompt_encoder_params(sd, cfg.prompt)
    boxes = np.array([[12.5, 40.0, 500.0, 900.0],
                      [0.0, 0.0, 1024.0, 1024.0],
                      [100.0, 100.0, 101.0, 101.0]], np.float32)
    mask_logits = rng.standard_normal((3, 1, 256, 256)).astype(np.float32)
    with torch.no_grad():
        want_sparse, want_dense = sam.prompt_encoder(
            points=None, boxes=torch.from_numpy(boxes),
            masks=torch.from_numpy(mask_logits))
        want_pe = sam.prompt_encoder.get_dense_pe().numpy()
    got_sparse = np.asarray(prompt_mod.embed_boxes(
        pparams, cfg.prompt, jnp.asarray(boxes)))
    got_dense = np.asarray(prompt_mod.embed_masks(
        pparams, cfg.prompt, jnp.asarray(mask_logits.transpose(0, 2, 3, 1))))
    got_pe = np.asarray(prompt_mod.dense_pe(pparams, cfg.prompt))
    compare("prompt_encoder_boxes", got_sparse, want_sparse.numpy(), 1e-4)
    compare("prompt_encoder_masks", got_dense.transpose(0, 3, 1, 2),
            want_dense.numpy(), 1e-4)
    compare("prompt_encoder_dense_pe", got_pe.transpose(2, 0, 1)[None],
            want_pe, 1e-4)
    pts = np.array([[[65.0, 200.0], [600.0, 30.0]]], np.float32)
    lbl = np.array([[1, 0]], np.int32)
    with torch.no_grad():
        want_pts, _ = sam.prompt_encoder(
            points=(torch.from_numpy(pts), torch.from_numpy(lbl)),
            boxes=None, masks=None)
    got_pts = np.asarray(prompt_mod.embed_points(
        pparams, cfg.prompt, jnp.asarray(pts), jnp.asarray(lbl),
        pad=True))
    compare("prompt_encoder_points", got_pts, want_pts.numpy(), 1e-4)

    # ---- 3. mask decoder + two-way transformer ----------------------
    dparams = sam_weights.mask_decoder_params(sd, cfg.decoder)
    emb = rng.standard_normal((1, 256, 64, 64)).astype(np.float32) * 0.2
    with torch.no_grad():
        want_low, want_iou = sam.mask_decoder(
            image_embeddings=torch.from_numpy(emb),
            image_pe=sam.prompt_encoder.get_dense_pe(),
            sparse_prompt_embeddings=want_sparse,
            dense_prompt_embeddings=want_dense,
            multimask_output=False)
    got_masks, got_iou = dec_mod.forward(
        dparams, cfg.decoder, jnp.asarray(emb[0].transpose(1, 2, 0)),
        jnp.asarray(got_pe), jnp.asarray(got_sparse),
        jnp.asarray(got_dense))
    compare("mask_decoder_low_res", np.asarray(got_masks)[:, 0],
            want_low.numpy()[:, 0], 2e-3)
    compare("mask_decoder_iou", np.asarray(got_iou)[:, 0],
            want_iou.numpy()[:, 0], 2e-3)

    # ---- 4. fabricate a reference TRAINED checkpoint ----------------
    # (requires_grad params only, flmm/runner.py:131-139) and convert it
    unet_oracle = MMsegUNetOracle().eval()
    text_proj = torch.nn.Linear(2048, 256)
    trained_sd = {"text_proj.weight": text_proj.weight.detach(),
                  "text_proj.bias": text_proj.bias.detach(),
                  "text_layer_weights": torch.randn(24) * 0.1}
    for k, v in unet_oracle.state_dict().items():
        trained_sd["mask_head." + k] = v
    for k, v in sam.prompt_encoder.state_dict().items():
        trained_sd["sam.model.prompt_encoder." + k] = v
    for k, v in sam.mask_decoder.state_dict().items():
        trained_sd["sam.model.mask_decoder." + k] = v
    trained_pth = tmp / "flmm_trained_fab.pth"
    torch.save({"state_dict": trained_sd}, trained_pth)

    from flmm_tpu.configs.deepseek_vl import deepseek_vl_1_3b

    full_cfg = deepseek_vl_1_3b(dtype=jnp.float32)
    full_cfg_f32 = full_cfg  # sam sub-cfg dtype is independent
    trainable = load_mod.reference_trained(trained_pth, full_cfg_f32)

    attn_maps = np.abs(rng.standard_normal((2, 384, 24, 24))
                       ).astype(np.float32)
    with torch.no_grad():
        want_unet = unet_oracle(torch.from_numpy(attn_maps)).numpy()
    got_unet = np.asarray(unet_mod.forward(
        trainable["unet"], full_cfg.unet,
        jnp.asarray(attn_maps.transpose(0, 2, 3, 1))))
    compare("unet_384_real_dims", got_unet, want_unet[:, 0], 2e-3)

    pre = rng.standard_normal((3, 2048)).astype(np.float32)
    with torch.no_grad():
        want_tp = text_proj(torch.from_numpy(pre)).numpy()
    got_tp = (pre @ np.asarray(trainable["text_proj"]["w"])
              + np.asarray(trainable["text_proj"]["b"]))
    compare("text_proj_2048_256", got_tp, want_tp, 1e-4)

    # ---- 5. refine chain vs composed torch oracle -------------------
    # (SAMWrapper.forward transcription, mask_refiner.py:71-124; square
    # 1024 image so resize/pad geometry is the identity)
    M = 2
    coarse = np.full((M, 64, 64), -8.0, np.float32)
    coarse[0, 8:32, 16:48] = 8.0
    coarse[1, 40:60, 4:24] = 8.0
    text = rng.standard_normal((M, 1, 256)).astype(np.float32) * 0.2
    img_emb_t = torch.from_numpy(want_emb)  # (1, 256, 64, 64)

    from segment_anything.utils.transforms import ResizeLongestSide

    transform = ResizeLongestSide(1024)
    with torch.no_grad():
        ct = torch.from_numpy(coarse)
        # generate_prompt_masks (:61-69)
        pad_value = min(-1.0, float(ct.min()))
        pm = F.interpolate(ct[:, None], size=(1024, 1024), mode="bilinear")
        prompt_masks = F.interpolate(pm, size=(256, 256), mode="bilinear")
        # box from thresholded upsampled sigmoid (:78-92)
        orig_masks = (F.interpolate(ct[None].sigmoid(), size=(1024, 1024),
                                    mode="bilinear")[0] > 0.5).float()
        want_chain = []
        for i in range(M):
            ys, xs = np.where(orig_masks[i].numpy() > 0)
            box = np.array([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])
            box = transform.apply_boxes(box.astype(np.float32),
                                        (1024, 1024))
            sp, de = sam.prompt_encoder(
                points=None,
                boxes=torch.from_numpy(box.astype(np.float32))[None, :],
                masks=prompt_masks[i].view(1, 1, 256, 256))
            sp = torch.cat([sp, torch.from_numpy(text[i])[None]], dim=1)
            low, _ = sam.mask_decoder(
                image_embeddings=img_emb_t,
                image_pe=sam.prompt_encoder.get_dense_pe(),
                sparse_prompt_embeddings=sp,
                dense_prompt_embeddings=de,
                multimask_output=False)
            want_chain.append(low[0, 0].numpy())
    want_chain = np.stack(want_chain)

    sam_trained = trainable["sam"]
    geom = {k: jnp.asarray(v, jnp.float32) for k, v in {
        "crop_y": 0.0, "crop_x": 0.0, "crop_h": 64.0, "crop_w": 64.0,
        "sam_h": 1024.0, "sam_w": 1024.0}.items()}
    got_chain = refiner_mod.refine(
        sam_trained, cfg, jnp.asarray(got_emb[0]), jnp.asarray(coarse),
        geom, jnp.asarray(text), jnp.ones((M, 1), bool),
    )["low_res_logits"]
    # tolerance: the TPU redesign quantises the box in a fixed 256 frame
    # and resamples the dense prompt in ONE bilinear pass (the reference
    # does 64->1024->256); both are documented conventions, so the chain
    # agrees to ~1e-1 on logits rather than 1e-3
    compare("refine_chain_composed", np.asarray(got_chain), want_chain,
            tol=0.5)
    a = np.asarray(got_chain) > 0
    b = want_chain > 0
    iou = (a & b).sum() / max(1, (a | b).sum())
    report("refine_chain_mask_iou", 1.0 - float(iou), 0.0, 0.05)

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    if not all(RESULTS):
        raise SystemExit("PARITY FAILED")
    print("ALL SAM PARITY CHECKS PASSED")


if __name__ == "__main__":
    main()
