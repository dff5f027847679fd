#!/usr/bin/env python
"""Full-size (1.3B-dim) random-weight conversion parity vs torch.

The released DeepSeek-VL-1.3B / SAM checkpoints are not obtainable in
this environment (no network egress), so this produces the closest
provable artifact instead (VERDICT round-1 item 3): a fabricated
random-weight checkpoint in the exact on-disk layout of
deepseek-ai/deepseek-vl-1.3b-chat (``language_model.*`` HF Llama keys,
``vision_model.vision_tower.*`` timm SigLIP keys, ``aligner.layers.*``),
pushed through ``convert.load.deepseek_vl_frozen`` and compared against
torch reference forwards at the REAL model dimensions:

* decoder logits vs ``transformers.LlamaForCausalLM`` (DeepSeek-LLM-1.3B
  geometry: 24L x 16H, hidden 2048, ffn 5504, vocab 102400), f32;
* SigLIP-L/16-384 trunk features vs a torch timm-style ViT oracle
  (the reference vendors timm, which is absent here; the oracle
  reimplements the standard pre-LN fused-qkv block the keys describe,
  reference deepseek_vl/models/siglip_vit.py:259).

Prints one JSON line per component and exits non-zero on mismatch.
Run on CPU: JAX_PLATFORMS=cpu python scripts/parity_full_size.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import torch

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
    report(component, float(np.abs(got - want).max()), corr, tol)


class TimmViTOracle(torch.nn.Module):
    """timm VisionTransformer forward for the keys the converter reads:
    patch embed -> +pos -> N x (LN, fused-qkv attn, LN, GELU MLP) -> LN.
    (reference deepseek_vl/models/siglip_vit.py vendors timm's
    VisionTransformer with class_token=False, no_embed_class=True.)"""

    def __init__(self, dim=1024, depth=24, heads=16, mlp=4096, patch=16,
                 img=384):
        super().__init__()
        self.heads = heads
        self.patch_embed = torch.nn.Conv2d(3, dim, patch, patch)
        self.grid = img // patch
        self.pos_embed = torch.nn.Parameter(
            torch.randn(1, self.grid * self.grid, dim) * 0.02)
        self.blocks = torch.nn.ModuleList()
        for _ in range(depth):
            blk = torch.nn.ModuleDict({
                "norm1": torch.nn.LayerNorm(dim, eps=1e-6),
                "norm2": torch.nn.LayerNorm(dim, eps=1e-6),
            })
            blk["attn"] = torch.nn.ModuleDict({
                "qkv": torch.nn.Linear(dim, 3 * dim),
                "proj": torch.nn.Linear(dim, dim),
            })
            blk["mlp"] = torch.nn.ModuleDict({
                "fc1": torch.nn.Linear(dim, mlp),
                "fc2": torch.nn.Linear(mlp, dim),
            })
            self.blocks.append(blk)
        self.norm = torch.nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        x = self.patch_embed(x).flatten(2).transpose(1, 2)
        x = x + self.pos_embed
        B, N, C = x.shape
        h = self.heads
        for blk in self.blocks:
            y = blk["norm1"](x)
            qkv = blk["attn"]["qkv"](y).reshape(B, N, 3, h, C // h)
            q, k, v = qkv.permute(2, 0, 3, 1, 4)
            y = torch.nn.functional.scaled_dot_product_attention(q, k, v)
            y = y.transpose(1, 2).reshape(B, N, C)
            x = x + blk["attn"]["proj"](y)
            y = blk["norm2"](x)
            x = x + blk["mlp"]["fc2"](
                torch.nn.functional.gelu(blk["mlp"]["fc1"](y)))
        return self.norm(x)

    def timm_state_dict(self):
        sd = {}
        sd["patch_embed.proj.weight"] = self.patch_embed.weight
        sd["patch_embed.proj.bias"] = self.patch_embed.bias
        sd["pos_embed"] = self.pos_embed
        for i, blk in enumerate(self.blocks):
            p = f"blocks.{i}."
            sd[p + "norm1.weight"] = blk["norm1"].weight
            sd[p + "norm1.bias"] = blk["norm1"].bias
            sd[p + "norm2.weight"] = blk["norm2"].weight
            sd[p + "norm2.bias"] = blk["norm2"].bias
            sd[p + "attn.qkv.weight"] = blk["attn"]["qkv"].weight
            sd[p + "attn.qkv.bias"] = blk["attn"]["qkv"].bias
            sd[p + "attn.proj.weight"] = blk["attn"]["proj"].weight
            sd[p + "attn.proj.bias"] = blk["attn"]["proj"].bias
            sd[p + "mlp.fc1.weight"] = blk["mlp"]["fc1"].weight
            sd[p + "mlp.fc1.bias"] = blk["mlp"]["fc1"].bias
            sd[p + "mlp.fc2.weight"] = blk["mlp"]["fc2"].weight
            sd[p + "mlp.fc2.bias"] = blk["mlp"]["fc2"].bias
        sd["norm.weight"] = self.norm.weight
        sd["norm.bias"] = self.norm.bias
        return sd


def main(scale: float = 1.0):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp
    from transformers import LlamaConfig, LlamaForCausalLM

    from flmm_tpu.configs.deepseek_vl import deepseek_vl_1_3b
    from flmm_tpu.convert import load as load_mod
    from flmm_tpu.models.llm import decoder as llm_mod
    from flmm_tpu.models.vision import vit as vit_mod

    torch.manual_seed(0)
    cfg = deepseek_vl_1_3b(dtype=jnp.float32)
    d = cfg.llm

    # ---- 1. fabricate the checkpoint at real dims -------------------
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

    sd = {}
    for k, v in torch_llm.state_dict().items():
        sd["language_model." + k] = v
    for k, v in vit_oracle.timm_state_dict().items():
        sd["vision_model.vision_tower." + k] = v
    # aligner: mlp_gelu, depth 2 (2048 <- gelu <- 2048 <- 1024)
    al0 = torch.nn.Linear(1024, d.hidden_size)
    al2 = torch.nn.Linear(d.hidden_size, d.hidden_size)
    sd["aligner.layers.0.weight"] = al0.weight
    sd["aligner.layers.0.bias"] = al0.bias
    sd["aligner.layers.2.weight"] = al2.weight
    sd["aligner.layers.2.bias"] = al2.bias

    tmp = tempfile.mkdtemp(prefix="fabricated_dsvl_")
    torch.save({k: v.detach().clone() for k, v in sd.items()},
               pathlib.Path(tmp) / "pytorch_model.bin")
    print(f"fabricated checkpoint at {tmp}", flush=True)

    # ---- 2. torch reference forwards --------------------------------
    rng = np.random.default_rng(0)
    ids = rng.integers(10, 1000, (2, 48)).astype(np.int64)
    with torch.no_grad():
        want_logits = torch_llm(torch.from_numpy(ids)).logits.numpy()
    px = rng.standard_normal((2, 3, 384, 384)).astype(np.float32) * 0.5
    with torch.no_grad():
        want_feats = vit_oracle(torch.from_numpy(px)).numpy()
        pre = torch.from_numpy(
            rng.standard_normal((2, 4, 1024)).astype(np.float32))
        want_proj = al2(torch.nn.functional.gelu(al0(pre))).numpy()
    del torch_llm, sd

    # ---- 3. convert + JAX forwards ----------------------------------
    print("converting via deepseek_vl_frozen...", flush=True)
    frozen = load_mod.deepseek_vl_frozen(tmp, cfg)

    embeds = llm_mod.embed_tokens(frozen["llm"], d, jnp.asarray(ids))
    out = llm_mod.forward_capture(
        frozen["llm"], d, embeds, jnp.ones((2, 48), bool), img_start=0,
        n_img=8)
    got_logits = np.asarray(llm_mod.logits(frozen["llm"], d,
                                           out["last_hidden"]))
    compare("decoder_logits_1p3b", got_logits, want_logits, tol=2e-3)

    got_feats = np.asarray(vit_mod.forward(
        frozen["vision"], cfg.vision, jnp.asarray(px.transpose(0, 2, 3, 1))))
    compare("siglip_l_384_features", got_feats, want_feats, tol=2e-3)

    from flmm_tpu.models.frozen.grounding import _project

    got_proj = np.asarray(_project(jnp.asarray(pre.numpy()), frozen["projector"]))
    compare("aligner_mlp_gelu", got_proj, want_proj, tol=1e-4)

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    if not all(RESULTS):
        raise SystemExit("PARITY FAILED")
    print("ALL PARITY CHECKS PASSED")


if __name__ == "__main__":
    main()
