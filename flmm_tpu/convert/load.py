"""Checkpoint assembly: HF/SAM checkpoints -> full flmm_tpu param trees.

Host-side only (numpy/torch/safetensors); the resulting trees feed the JAX
models.  Replaces the reference's ``from_pretrained`` + ``guess_load_
checkpoint`` layer (flmm/runner.py:37-45): frozen weights come from the
upstream checkpoints, trainable weights from an Orbax directory (or fresh
init).
"""

from __future__ import annotations

import json
import pathlib
from typing import Any, Mapping

import numpy as np

from flmm_tpu.convert import hf_weights, sam_weights


def load_state_dict(path: str | pathlib.Path) -> dict:
    """Load a checkpoint directory (safetensors shards or torch bins) or a
    single file into a flat name->numpy dict."""
    path = pathlib.Path(path)
    sd: dict = {}
    if path.is_file():
        if path.suffix == ".safetensors":
            from safetensors.numpy import load_file

            return dict(load_file(path))
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=True)
        raw = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
        return {k: v for k, v in raw.items()}
    st_files = sorted(path.glob("*.safetensors"))
    if st_files:
        from safetensors.numpy import load_file

        for f in st_files:
            sd.update(load_file(f))
        return sd
    bins = sorted(path.glob("pytorch_model*.bin"))
    if not bins:
        raise FileNotFoundError(f"no weights found under {path}")
    import torch

    for f in bins:
        sd.update(torch.load(f, map_location="cpu", weights_only=True))
    return sd


def strip_prefix(sd: Mapping[str, Any], prefix: str) -> dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def submodule(sd: Mapping[str, Any], *candidates: str) -> dict:
    """Extract a submodule dict trying several prefixes (HF reshuffles
    module paths across versions: released llava checkpoints use
    ``language_model.model.*`` while transformers>=4.52 state dicts use
    ``model.language_model.*``)."""
    for prefix in candidates:
        sub = strip_prefix(sd, prefix)
        if sub:
            return sub
    raise KeyError(f"none of {candidates} found; sample keys: "
                   f"{list(sd)[:5]}")


def llm_with_head(sd: Mapping[str, Any], *candidates: str) -> dict:
    """LLM submodule with the (top-level) lm_head re-attached, laid out for
    ``llama_decoder_params(prefix='')``."""
    sub = submodule(sd, *candidates)
    sub = {k: v for k, v in sub.items()}
    for k in ("lm_head.weight",):
        if k in sd and k not in sub:
            sub[k] = sd[k]
    return sub


# ---------------------------------------------------------------------------
# Family assemblies (frozen trees)
# ---------------------------------------------------------------------------


def deepseek_vl_frozen(
    checkpoint_dir: str, cfg, sam_checkpoint: str | None = None
) -> dict:
    """deepseek-ai/deepseek-vl-*-chat -> frozen tree.

    Key layout (deepseek_vl/models/modeling_vlm.py): ``language_model.*``
    (HF Llama), ``vision_model.vision_tower.*`` (timm SigLIP trunk),
    ``aligner.layers.*`` (mlp_gelu).
    """
    sd = load_state_dict(checkpoint_dir)
    llm_sd = llm_with_head(sd, "language_model.")
    vis_sd = submodule(sd, "vision_model.vision_tower.")
    frozen = {
        "llm": hf_weights.llama_decoder_params(llm_sd, cfg.llm),
        "vision": hf_weights.timm_siglip_vit_params(vis_sd, cfg.vision),
        "projector": _mlp_gelu_layers(sd, "aligner.layers", cfg),
    }
    if sam_checkpoint:
        frozen["sam_encoder"] = sam_weights.encoder_params(
            load_state_dict(sam_checkpoint), cfg.sam.encoder
        )
    return frozen


def llava_frozen(
    checkpoint_dir: str, cfg, sam_checkpoint: str | None = None,
    next_variant: bool = False,
) -> dict:
    """llava-hf/llava-1.5-*-hf or llava-v1.6 -> frozen tree."""
    sd = load_state_dict(checkpoint_dir)
    llm_sd = llm_with_head(sd, "language_model.model.",
                           "model.language_model.", "language_model.")
    vis_sd = submodule(sd, "vision_tower.", "model.vision_tower.")
    proj_sd = submodule(sd, "multi_modal_projector.",
                        "model.multi_modal_projector.")
    proj = [
        {"w": np.asarray(_np(proj_sd["linear_1.weight"])).T,
         "b": np.asarray(_np(proj_sd["linear_1.bias"]))},
        {"w": np.asarray(_np(proj_sd["linear_2.weight"])).T,
         "b": np.asarray(_np(proj_sd["linear_2.bias"]))},
    ]
    frozen = {
        "llm": hf_weights.llama_decoder_params(llm_sd, cfg_llm(cfg),
                                               prefix=""),
        "vision": hf_weights.clip_vit_params(vis_sd, cfg_vision(cfg)),
        "projector": proj,
    }
    if next_variant:
        for key in ("image_newline", "model.image_newline"):
            if key in sd:
                frozen["image_newline"] = np.asarray(_np(sd[key]))
    if sam_checkpoint:
        frozen["sam_encoder"] = sam_weights.encoder_params(
            load_state_dict(sam_checkpoint), sam_enc_cfg(cfg)
        )
    return frozen


def hpt_frozen(checkpoint_dir: str, cfg, sam_checkpoint: str | None = None):
    """HPT checkpoints: llm/ visual_encoder/ projector/ subfolders
    (reference flmm/models/frozen_hpt.py:72-105)."""
    root = pathlib.Path(checkpoint_dir)
    llm_sd = load_state_dict(root / "llm")
    vis_sd = load_state_dict(root / "visual_encoder")
    proj_sd = load_state_dict(root / "projector")
    vis_cfg = json.loads((root / "visual_encoder" / "config.json").read_text()) \
        if (root / "visual_encoder" / "config.json").exists() else {}
    is_siglip = "siglip" in str(vis_cfg.get("model_type", "")).lower()
    conv = hf_weights.siglip_vit_params if is_siglip else hf_weights.clip_vit_params
    frozen = {
        "llm": hf_weights.llama_decoder_params(llm_sd, cfg.llm),
        "vision": conv(vis_sd, cfg.vision),
        "projector": _seq_linear_layers(proj_sd),
    }
    if sam_checkpoint:
        frozen["sam_encoder"] = sam_weights.encoder_params(
            load_state_dict(sam_checkpoint), cfg.sam.encoder
        )
    return frozen


def sam_trainable(sam_checkpoint: str, cfg) -> dict:
    """SAM prompt-encoder + mask-decoder init from the official checkpoint
    (they are fine-tuned from this init in the reference)."""
    sd = load_state_dict(sam_checkpoint)
    return {
        "prompt": sam_weights.prompt_encoder_params(sd, cfg.prompt),
        "decoder": sam_weights.mask_decoder_params(sd, cfg.decoder),
    }


# -- helpers ----------------------------------------------------------------


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().to("cpu").float().numpy()
    return np.asarray(x)


def cfg_llm(cfg):
    return cfg.base.llm if hasattr(cfg, "base") else cfg.llm


def cfg_vision(cfg):
    return cfg.base.vision if hasattr(cfg, "base") else cfg.vision


def sam_enc_cfg(cfg):
    return (cfg.base.sam if hasattr(cfg, "base") else cfg.sam).encoder


def _mlp_gelu_layers(sd, prefix, cfg) -> list:
    """DeepSeek aligner Sequential(Linear, GELU, Linear, ...) -> layer list."""
    sub = strip_prefix(dict(sd), prefix + ".")
    layers = _seq_linear_layers(sub)
    if not layers:
        raise KeyError(f"no projector layers under {prefix}")
    return layers


def _seq_linear_layers(sd) -> list:
    """A Sequential of Linears (+activations) -> ordered layer list."""
    idx = sorted({
        int(k.split(".")[-2]) for k in sd
        if k.endswith(".weight") and k.split(".")[-2].isdigit()
    })
    return [
        {"w": _np(sd[_key(sd, i, "weight")]).T, "b": _np(sd[_key(sd, i, "bias")])}
        for i in idx
    ]


def _key(sd, i, kind):
    for k in sd:
        if k.endswith(f".{i}.{kind}") or k == f"{i}.{kind}":
            return k
    raise KeyError((i, kind))
