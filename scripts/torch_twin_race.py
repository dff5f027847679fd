#!/usr/bin/env python
"""Torch-twin training race on the derivable grounding task (VERDICT r4
item 3).

Trains TWO tiny twins with IDENTICAL frozen weights, identical trainable
init, identical per-step batches and identical optimizer hyperparameters:

* **torch**: a faithful transcription of the reference training step at
  tiny dims -- HF ``LlamaModel`` (eager, ``output_attentions``) + timm-
  style SigLIP trunk + mlp_gelu aligner (frozen), mmseg-spec U-Net +
  text_proj + text_layer_weights + reference ``segment_anything`` prompt
  encoder / mask decoder (trainable), with the reference's own refine
  chain (mask_refiner.py:61-124: interpolate -> pad -> interpolate dense
  prompt, original-resolution box, per-mask decoder loop) and the
  reference loss resolutions (frozen_llava.py:167-217: GT interpolated
  to each head's prediction size), AdamW + clip 1.0 + the same warmup/
  cosine schedule.
* **jax**: this repo's production stack (models/frozen/grounding.py +
  train/loop.py) -- static-shape batched refine, capture kernels,
  weight-map losses.

Both report coarse/SAM-refined aIoU against the SAME generator GT on the
INCOMING batch before each update, so the curves are generalization on
identical data: if the JAX redesign loses grounding capacity anywhere
(capture numerics, batched refine, loss framing), the race shows it.

Weights travel torch -> jax through the audited checkpoint converters
(convert/hf_weights.py, convert/sam_weights.py, convert/load.unet_params),
so both stacks start from the SAME frozen LMM function and the SAME
trainable init.

Run: ``JAX_PLATFORMS=cpu python scripts/torch_twin_race.py
[--steps 400] [--bs 8] [--lr 5e-3] [--out race.json]``
(~25 min CPU at the defaults).  tests/test_torch_twin_race.py pins a
short-budget version.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import types

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import torch
import torch.nn.functional as F

REFERENCE = pathlib.Path("/root/reference")


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return mod


def _import_reference_sam():
    sys.path.insert(0, str(REFERENCE))
    tv = _stub("torchvision")
    tv.__path__ = []
    _stub("torchvision.ops")
    _stub("torchvision.ops.boxes", batched_nms=None, box_area=None)
    _stub("torchvision.transforms")
    _stub("torchvision.transforms.functional", resize=None, to_pil_image=None)
    _stub("cv2")
    from segment_anything.modeling.image_encoder import ImageEncoderViT
    from segment_anything.modeling.mask_decoder import MaskDecoder
    from segment_anything.modeling.prompt_encoder import PromptEncoder
    from segment_anything.modeling.transformer import TwoWayTransformer

    return ImageEncoderViT, PromptEncoder, MaskDecoder, TwoWayTransformer


# --------------------------------------------------------------------
# torch twin at the tiny() geometry
# --------------------------------------------------------------------

class TorchTwin:
    """Reference training-step transcription at configs.deepseek_vl.tiny
    dims.  Frozen: llm/vit/aligner/sam-encoder.  Trainable: unet,
    text_proj, text_layer_weights, sam prompt encoder + mask decoder."""

    def __init__(self, cfg, seed: int = 0):
        from transformers import LlamaConfig, LlamaModel

        from parity_full_size import TimmViTOracle
        from parity_sam_full import MMsegUNetOracle

        torch.manual_seed(seed)
        self.cfg = cfg
        lc = cfg.llm
        self.llm = LlamaModel(LlamaConfig(
            vocab_size=lc.vocab_size, hidden_size=lc.hidden_size,
            num_hidden_layers=lc.num_layers,
            num_attention_heads=lc.num_heads,
            num_key_value_heads=lc.num_kv_heads,
            head_dim=lc.head_dim,
            intermediate_size=lc.intermediate_size,
            attn_implementation="eager",
        )).eval()
        vc = cfg.vision
        self.vit = TimmViTOracle(
            dim=vc.hidden_size, depth=vc.num_layers, heads=vc.num_heads,
            mlp=vc.mlp_dim, patch=vc.patch_size, img=vc.image_size).eval()
        d_llm = lc.hidden_size
        self.aligner = torch.nn.Sequential(
            torch.nn.Linear(vc.hidden_size, d_llm), torch.nn.GELU(),
            torch.nn.Linear(d_llm, d_llm)).eval()

        EncViT, PromptEnc, MaskDec, TwoWayT = _import_reference_sam()
        ec = cfg.sam.encoder
        self.sam_enc = EncViT(
            img_size=ec.img_size, patch_size=ec.patch_size,
            embed_dim=ec.embed_dim, depth=ec.depth,
            num_heads=ec.num_heads, mlp_ratio=ec.mlp_ratio,
            out_chans=ec.out_chans, qkv_bias=True, use_rel_pos=True,
            window_size=ec.window_size,
            global_attn_indexes=ec.global_attn_indexes,
            norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
        ).eval()
        with torch.no_grad():  # rel-pos/pos tables are zero-init
            for blk in self.sam_enc.blocks:
                blk.attn.rel_pos_h.normal_(0, 0.1)
                blk.attn.rel_pos_w.normal_(0, 0.1)
            self.sam_enc.pos_embed.normal_(0, 0.02)
        pc, dc = cfg.sam.prompt, cfg.sam.decoder
        self.sam_pe = PromptEnc(
            embed_dim=pc.embed_dim,
            image_embedding_size=(pc.image_embedding_size,) * 2,
            input_image_size=(pc.input_image_size,) * 2,
            mask_in_chans=pc.mask_in_chans)
        self.sam_dec = MaskDec(
            num_multimask_outputs=dc.num_multimask_outputs,
            transformer=TwoWayT(
                depth=dc.transformer.depth,
                embedding_dim=dc.transformer.embed_dim,
                mlp_dim=dc.transformer.mlp_dim,
                num_heads=dc.transformer.num_heads),
            transformer_dim=dc.transformer_dim,
            iou_head_depth=dc.iou_head_depth,
            iou_head_hidden_dim=dc.iou_head_hidden_dim)
        self.unet = MMsegUNetOracle(
            in_channels=cfg.attn_channels, base=cfg.unet.base_channels,
            num_stages=cfg.unet.num_stages,
            enc_num_convs=cfg.unet.enc_num_convs,
            dec_num_convs=cfg.unet.dec_num_convs,
            upsample_input=cfg.unet.upsample_input)
        self.text_proj = torch.nn.Linear(d_llm, pc.embed_dim)
        self.tlw = torch.nn.Parameter(torch.ones(lc.num_layers))

        for mod in (self.llm, self.vit, self.aligner, self.sam_enc):
            mod.requires_grad_(False)

    def trainable_parameters(self):
        yield from self.unet.parameters()
        yield from self.text_proj.parameters()
        yield self.tlw
        yield from self.sam_pe.parameters()
        yield from self.sam_dec.parameters()

    def jax_params(self):
        """The SAME weights as a jax param tree, through the audited
        checkpoint converters."""
        import jax.numpy as jnp

        from flmm_tpu.convert import hf_weights, sam_weights
        from flmm_tpu.convert.load import unet_params

        cfg = self.cfg
        llm_sd = {"model." + k: v for k, v in self.llm.state_dict().items()}
        # bare LlamaModel state dict has no lm_head; embed doubles as one
        llm_sd["lm_head.weight"] = self.llm.embed_tokens.weight
        proj = [
            {"w": jnp.asarray(m.weight.detach().numpy().T),
             "b": jnp.asarray(m.bias.detach().numpy())}
            for m in (self.aligner[0], self.aligner[2])
        ]
        return {
            "frozen": {
                "llm": hf_weights.llama_decoder_params(llm_sd, cfg.llm),
                "vision": hf_weights.timm_siglip_vit_params(
                    self.vit.timm_state_dict(), cfg.vision),
                "projector": proj,
                "sam_encoder": sam_weights.encoder_params(
                    self.sam_enc.state_dict(), cfg.sam.encoder, prefix=""),
            },
            "trainable": {
                "unet": unet_params(self.unet.state_dict(), cfg.unet,
                                    prefix=""),
                "text_proj": {
                    "w": jnp.asarray(
                        self.text_proj.weight.detach().numpy().T),
                    "b": jnp.asarray(self.text_proj.bias.detach().numpy()),
                },
                "text_layer_weights": jnp.asarray(self.tlw.detach().numpy()),
                "sam": {
                    "prompt": sam_weights.prompt_encoder_params(
                        self.sam_pe.state_dict(), cfg.sam.prompt, prefix=""),
                    "decoder": sam_weights.mask_decoder_params(
                        self.sam_dec.state_dict(), cfg.sam.decoder,
                        prefix=""),
                },
            },
        }

    # ---- reference forward transcription -----------------------------

    def _frozen_forward(self, batch):
        """No-grad LMM pass: attention images + hidden states + SAM
        embeddings (frozen_llava.py:99-133)."""
        cfg = self.cfg
        ids = torch.tensor(np.asarray(batch["input_ids"]))
        B, S = ids.shape
        n_img, i0 = cfg.num_img_tokens, cfg.img_start
        with torch.no_grad():
            px = torch.tensor(np.asarray(
                batch["pixel_values"])).permute(0, 3, 1, 2)
            feats = self.vit(px)
            img_embeds = self.aligner(feats)
            embeds = self.llm.embed_tokens(ids)
            embeds[:, i0:i0 + n_img] = img_embeds
            out = self.llm(inputs_embeds=embeds,
                           attention_mask=torch.ones(B, S, dtype=torch.bool),
                           output_attentions=True,
                           output_hidden_states=True)
            # (L, B, nh, S, n_img) text->image attention block
            attns = torch.stack(
                [a[..., i0:i0 + n_img] for a in out.attentions])
            hidden = torch.stack(
                out.hidden_states[-cfg.llm.num_layers:])  # (L, B, S, D)
            sam_px = torch.tensor(np.asarray(
                batch["sam_pixel_values"])).permute(0, 3, 1, 2)
            sam_emb = self.sam_enc(sam_px)  # (B, out, 8, 8)
        return attns, hidden, sam_emb

    def _refine(self, sam_emb_b, coarse_b, text_embeds, orig: int = 256):
        """mask_refiner.py:61-124 at tiny geometry (256 orig -> 128 SAM
        frame -> 4*embed_size dense prompt)."""
        pc = self.cfg.sam.prompt
        img_size = pc.input_image_size
        P = 4 * pc.image_embedding_size
        M = coarse_b.shape[0]
        # generate_prompt_masks (square image: resized extent == frame)
        pad_value = min(-1.0, coarse_b.min().item())
        masks = F.interpolate(coarse_b[:, None].float(),
                              size=(img_size, img_size), mode="bilinear")
        prompt_masks = F.interpolate(masks, size=(P, P), mode="bilinear")
        # original-resolution box from the detached thresholded mask
        pred = F.interpolate(coarse_b.detach()[None].float().sigmoid(),
                             size=(orig, orig), mode="bilinear")[0] > 0.5
        sam_masks, lows = [], []
        for m in range(M):
            pm = pred[m].numpy()
            if pm.sum() > 0:
                ys, xs = np.where(pm > 0)
                box = np.array([xs.min(), ys.min(), xs.max() + 1,
                                ys.max() + 1], np.float32)
            else:
                box = np.array([0.0, 0.0, orig, orig], np.float32)
            box = box * (img_size / orig)  # ResizeLongestSide.apply_boxes
            sp, dn = self.sam_pe(
                points=None, boxes=torch.tensor(box[None]),
                masks=prompt_masks[m:m + 1])
            sp = torch.cat([sp, text_embeds[m][None]], dim=1)
            low, _iou = self.sam_dec(
                image_embeddings=sam_emb_b[None],
                image_pe=self.sam_pe.get_dense_pe(),
                sparse_prompt_embeddings=sp,
                dense_prompt_embeddings=dn,
                multimask_output=False)
            lows.append(low[0, 0])
            up = F.interpolate(low.float(), size=(img_size, img_size),
                               mode="bilinear")
            sam_masks.append(F.interpolate(
                up, size=(orig, orig), mode="bilinear")[0, 0])
        return torch.stack(sam_masks), torch.stack(lows)

    def step_loss(self, batch):
        """One reference training step's loss + pre-update metrics."""
        from tests.test_grad_parity import mmdet_bce, mmdet_naive_dice

        cfg = self.cfg
        attns, hidden, sam_emb = self._frozen_forward(batch)
        L_, B = attns.shape[0], attns.shape[1]
        g = cfg.clip_shape
        w = torch.softmax(self.tlw, 0)
        hmix = (hidden * w.view(-1, 1, 1, 1)).sum(0)  # (B, S, D)
        mask_ids = np.asarray(batch["mask_ids"])
        mask_valid = np.asarray(batch["mask_valid"])
        gt_orig = torch.tensor(np.asarray(batch["gt_orig"]))

        loss = 0.0
        cnt = 0
        aious, sam_aious = [], []
        gt_c = np.asarray(batch["gt_coarse"])
        gt_s = np.asarray(batch["gt_sam"])
        for b in range(B):
            m_cnt = int(mask_valid[b].sum())
            maps, texts = [], []
            for m in range(m_cnt):
                matched = torch.tensor(mask_ids[b] == m)
                assert bool(matched.sum() > 0)
                # (L, nh, n_img) mean over matched query rows, layer-major
                am = attns[:, b][:, :, matched].mean(2)
                maps.append(am.reshape(L_ * am.shape[1], g, g))
                texts.append(self.text_proj(hmix[b][matched]))
            mattn = torch.stack(maps)                       # (M, C, g, g)
            coarse = self.unet(mattn)[:, 0]                 # (M, Hc, Wc)
            # square image: unpad is identity (meta has no padding)
            sam_pred, lows = self._refine(sam_emb[b], coarse, texts)
            gt_co = F.interpolate(gt_orig[b, :m_cnt][None].float(),
                                  size=coarse.shape[-2:])[0]
            gt_sm = gt_orig[b, :m_cnt]
            loss = loss + m_cnt * (
                mmdet_naive_dice(coarse, gt_co) + mmdet_bce(coarse, gt_co)
                + mmdet_naive_dice(sam_pred, gt_sm)
                + mmdet_bce(sam_pred, gt_sm))
            cnt += m_cnt
            with torch.no_grad():  # aIoU vs the generator GT frames
                cb = (coarse.sigmoid() > 0.5).float()
                tb = torch.tensor(gt_c[b, :m_cnt])
                inter = (cb * tb).flatten(1).sum(1)
                union = (cb + tb - cb * tb).flatten(1).sum(1)
                aious += (inter / (union + 1e-12)).tolist()
                lb = (lows.sigmoid() > 0.5).float()
                sb = torch.tensor(gt_s[b, :m_cnt])
                inter = (lb * sb).flatten(1).sum(1)
                union = (lb + sb - lb * sb).flatten(1).sum(1)
                sam_aious += (inter / (union + 1e-12)).tolist()
        return loss / cnt, float(np.mean(aious)), float(np.mean(sam_aious))


def run_torch(twin, batches, lr, total_steps, warmup_ratio=0.05):
    from flmm_tpu.train import loop as train_loop

    sched = train_loop.make_schedule(train_loop.OptimConfig(
        lr=lr, total_steps=total_steps, warmup_ratio=warmup_ratio))
    params = list(twin.trainable_parameters())
    opt = torch.optim.AdamW(params, lr=1.0, betas=(0.9, 0.999),
                            weight_decay=0.01, eps=1e-8)
    curve = []
    for i, batch in enumerate(batches):
        loss, aiou, sam_aiou = twin.step_loss(batch)
        curve.append({"step": i, "aiou": aiou, "sam_aiou": sam_aiou,
                      "loss": float(loss)})
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(params, 1.0)
        for grp in opt.param_groups:
            grp["lr"] = float(sched(i))
        opt.step()
    return curve


def run_jax(cfg, params, batches, lr, total_steps, warmup_ratio=0.05):
    import jax
    import jax.numpy as jnp

    from flmm_tpu.models.frozen import deepseek_vl as model
    from flmm_tpu.train import loop as train_loop

    opt = train_loop.make_optimizer(train_loop.OptimConfig(
        lr=lr, total_steps=total_steps, warmup_ratio=warmup_ratio))
    state = train_loop.init_state(params["trainable"], opt)
    step = jax.jit(train_loop.make_train_step(
        lambda p, b: model.loss_fn(p, cfg, b), opt))
    curve = []
    for i, batch in enumerate(batches):
        b = {k: v for k, v in batch.items() if k != "gt_orig"}
        state, metrics = step(state, params["frozen"],
                              jax.tree.map(jnp.asarray, b))
        curve.append({"step": i, "aiou": float(metrics["aiou"]),
                      "sam_aiou": float(metrics["sam_aiou"]),
                      "loss": float(metrics["loss"])})
    return curve


def tail_mean(curve, key, n):
    vals = [c[key] for c in curve[-n:]]
    return sum(vals) / max(len(vals), 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--tail", type=int, default=40)
    ap.add_argument("--out", default="race.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from flmm_tpu.configs.deepseek_vl import tiny
    from flmm_tpu.data.synthetic import synthetic_grounding_batch

    cfg = tiny()
    twin = TorchTwin(cfg, seed=0)
    params = twin.jax_params()
    batches = [synthetic_grounding_batch(cfg, args.bs, seed=i,
                                         orig_masks=True)
               for i in range(args.steps)]
    print("torch twin training...", flush=True)
    tc = run_torch(twin, batches, args.lr, args.steps)
    print("jax twin training...", flush=True)
    jc = run_jax(cfg, params, batches, args.lr, args.steps)
    result = {
        "steps": args.steps, "bs": args.bs, "lr": args.lr,
        "torch": {"aiou": tail_mean(tc, "aiou", args.tail),
                  "sam_aiou": tail_mean(tc, "sam_aiou", args.tail)},
        "jax": {"aiou": tail_mean(jc, "aiou", args.tail),
                "sam_aiou": tail_mean(jc, "sam_aiou", args.tail)},
        "torch_curve": tc[::max(1, args.steps // 40)],
        "jax_curve": jc[::max(1, args.steps // 40)],
    }
    pathlib.Path(args.out).write_text(json.dumps(result, indent=1))
    print(json.dumps({k: result[k] for k in
                      ("steps", "torch", "jax")}, indent=1))


if __name__ == "__main__":
    main()
