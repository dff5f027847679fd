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
import jax
import jax.numpy as jnp

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
    # HF shards are pytorch_model*.bin; open_clip releases ship ONE
    # open_clip_pytorch_model.bin (reference openclip_encoder.py:29) --
    # fall back to any *.bin so the MGM aux-tower dir loads as released.
    bins = sorted(path.glob("pytorch_model*.bin")) or sorted(
        path.glob("*.bin"))
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
    """LLM submodule with the lm_head re-attached, laid out for
    ``llama_decoder_params(prefix='')``.

    The head lives at different depths across layouts: top-level
    ``lm_head.weight`` (transformers >= 4.52 llava), sibling of the
    stripped prefix (released llava-hf: ``language_model.lm_head.weight``
    next to ``language_model.model.*``), or inside the stripped submodule
    already (deepseek's ``language_model.`` strip keeps it) -- search all
    of them."""
    sub = submodule(sd, *candidates)
    sub = {k: v for k, v in sub.items()}
    if "lm_head.weight" not in sub:
        for k in sd:
            if k.endswith("lm_head.weight"):
                sub["lm_head.weight"] = sd[k]
                break
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


def convnext_params(sd: Mapping[str, Any], cfg, prefix: str = "visual.trunk.",
                    dtype=None) -> dict:
    """Convert an open_clip/timm ConvNeXt trunk (MGM aux tower,
    reference mgm/model/multimodal_encoder/openclip_encoder.py:29,48-54).

    Key layout: ``stem.0`` conv / ``stem.1`` LN;
    ``stages.{s}.blocks.{b}.{conv_dw,norm,mlp.fc1,mlp.fc2,gamma}``;
    ``stages.{s}.downsample.{0=LN,1=conv}`` for s > 0.
    """
    import numpy as np

    def get(name):
        return _np(sd[prefix + name])

    def conv(name):  # torch (O, I, kh, kw) -> HWIO
        return get(name).transpose(2, 3, 1, 0)

    stages = []
    for s_i, depth in enumerate(cfg.depths):
        stage = {"blocks": []}
        if s_i > 0:
            stage["down_ln_w"] = get(f"stages.{s_i}.downsample.0.weight")
            stage["down_ln_b"] = get(f"stages.{s_i}.downsample.0.bias")
            stage["down_k"] = conv(f"stages.{s_i}.downsample.1.weight")
            stage["down_b"] = get(f"stages.{s_i}.downsample.1.bias")
        for b_i in range(depth):
            base = f"stages.{s_i}.blocks.{b_i}."
            dw = get(base + "conv_dw.weight")  # (C, 1, 7, 7)
            stage["blocks"].append({
                "dw_k": dw.transpose(2, 3, 1, 0),
                "dw_b": get(base + "conv_dw.bias"),
                "ln_w": get(base + "norm.weight"),
                "ln_b": get(base + "norm.bias"),
                "w1": get(base + "mlp.fc1.weight").T,
                "b1": get(base + "mlp.fc1.bias"),
                "w2": get(base + "mlp.fc2.weight").T,
                "b2": get(base + "mlp.fc2.bias"),
                "gamma": get(base + "gamma"),
            })
        stages.append(stage)
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, dtype or cfg.dtype),
        {
            "stem_k": conv("stem.0.weight"),
            "stem_b": get("stem.0.bias"),
            "stem_ln_w": get("stem.1.weight"),
            "stem_ln_b": get("stem.1.bias"),
            "stages": stages,
        },
    )


def _ln_lin_params(sd, base, dtype=jnp.float32):
    """nn.Sequential(LayerNorm, Linear) -> our ln_lin dict (MGM uni
    projectors, reference mgm_arch.py:149-154)."""
    return {
        "ln_w": jnp.asarray(_np(sd[base + ".0.weight"]), dtype),
        "ln_b": jnp.asarray(_np(sd[base + ".0.bias"]), dtype),
        "w": jnp.asarray(_np(sd[base + ".1.weight"]).T, dtype),
        "b": jnp.asarray(_np(sd[base + ".1.bias"]), dtype),
    }


def mgm_frozen(
    checkpoint_dir: str,
    cfg,
    clip_checkpoint: str,
    aux_checkpoint: str,
    sam_checkpoint: str | None = None,
) -> dict:
    """MGM checkpoint assembly.

    The LLM + mm_projector + uni projectors live in the main checkpoint
    (keys under ``model.``); the CLIP tower and the open_clip ConvNeXt aux
    tower load from their own checkpoints, exactly as the reference does
    at init (mgm/model/mgm_arch.py:41-49, openclip_encoder.py:29).
    """
    sd = load_state_dict(checkpoint_dir)
    base = cfg.base
    llm_sd = llm_with_head(sd, "model.")
    frozen = {
        "llm": hf_weights.llama_decoder_params(llm_sd, base.llm, prefix=""),
        "vision": hf_weights.clip_vit_params(
            load_state_dict(clip_checkpoint), base.vision),
        "aux_tower": convnext_params(load_state_dict(aux_checkpoint), cfg.aux),
        "projector": _seq_linear_layers(
            strip_prefix(sd, "model.mm_projector.")),
        "uni_query": _ln_lin_params(sd, "model.vlm_uni_query_projector"),
        "uni_aux": _ln_lin_params(sd, "model.vlm_uni_aux_projector"),
        "uni_val": _ln_lin_params(sd, "model.vlm_uni_val_projector"),
    }
    if sam_checkpoint:
        frozen["sam_encoder"] = sam_weights.encoder_params(
            load_state_dict(sam_checkpoint), base.sam.encoder)
    return frozen


def sam_trainable(sam_checkpoint: str, cfg) -> dict:
    """SAM prompt-encoder + mask-decoder init from the official checkpoint
    (they are fine-tuned from this init in the reference)."""
    sd = load_state_dict(sam_checkpoint)
    return {
        "prompt": sam_weights.prompt_encoder_params(sd, cfg.prompt),
        "decoder": sam_weights.mask_decoder_params(sd, cfg.decoder),
    }


def _conv_module(sd: Mapping[str, Any], prefix: str, dtype) -> dict:
    """One mmcv ConvModule (conv [+bias] + GroupNorm) -> our conv params.

    ``bias='auto'`` in mmcv means no conv bias when a norm follows; the
    norm submodule name depends on the norm type ('gn' for GroupNorm) --
    matched tolerantly."""
    k = _np(sd[prefix + ".conv.weight"]).transpose(2, 3, 1, 0)
    cout = k.shape[-1]
    b = (_np(sd[prefix + ".conv.bias"])
         if prefix + ".conv.bias" in sd else np.zeros((cout,), np.float32))
    for norm in ("gn", "norm", "bn"):
        if prefix + f".{norm}.weight" in sd:
            gw = _np(sd[prefix + f".{norm}.weight"])
            gb = _np(sd[prefix + f".{norm}.bias"])
            break
    else:
        raise KeyError(f"no norm weights under {prefix}")
    return {"k": jnp.asarray(k, dtype), "b": jnp.asarray(b, dtype),
            "gn_w": jnp.asarray(gw, dtype), "gn_b": jnp.asarray(gb, dtype)}


def unet_params(sd: Mapping[str, Any], cfg,
                prefix: str = "mask_head.") -> dict:
    """mmseg ``UNetHead`` state dict -> our U-Net param tree.

    Key layout (mmseg/models/backbones/unet.py): ``encoder.{i}`` is a
    Sequential of [MaxPool2d (i>0, no params), BasicConvBlock] whose
    convs live at ``encoder.{i}.{b}.convs.{j}``; ``decoder.{d}`` is an
    UpConvBlock with ``upsample.interp_upsample.1`` (InterpConv's conv
    after the bilinear Upsample) and ``conv_block.convs.{j}``;
    ``conv_seg`` is the UNetHead 1x1 logit conv
    (reference flmm/models/mask_head/mask_decoder.py:20-25)."""
    sub = strip_prefix(dict(sd), prefix)
    dtype = cfg.dtype
    enc = []
    for i in range(cfg.num_stages):
        b = 0 if i == 0 else 1  # MaxPool2d precedes the block for i > 0
        if f"encoder.{i}.{b}.convs.0.conv.weight" not in sub and i > 0:
            b = 0  # stride-based downsampling variant: no pool module
        enc.append([
            _conv_module(sub, f"encoder.{i}.{b}.convs.{j}", dtype)
            for j in range(cfg.enc_num_convs[i])
        ])
    dec = []
    for d in range(cfg.num_stages - 1):
        dec.append({
            "up": _conv_module(
                sub, f"decoder.{d}.upsample.interp_upsample.1", dtype),
            "convs": [
                _conv_module(sub, f"decoder.{d}.conv_block.convs.{j}", dtype)
                for j in range(cfg.dec_num_convs[d])
            ],
        })
    return {
        "enc": enc,
        "dec": dec,
        "seg_k": jnp.asarray(
            _np(sub["conv_seg.weight"]).transpose(2, 3, 1, 0), dtype),
        "seg_b": jnp.asarray(_np(sub["conv_seg.bias"]), dtype),
    }


def reference_trained(path: str, cfg) -> dict:
    """Convert a reference F-LMM TRAINED checkpoint into our trainable
    tree.

    The reference saves exactly the ``requires_grad`` parameters
    (flmm/runner.py:131-139): ``mask_head.*`` (mmseg UNetHead),
    ``text_proj.*``, ``text_layer_weights`` and the fine-tuned
    ``sam.model.prompt_encoder.* / sam.model.mask_decoder.*`` (the SAM
    image encoder is frozen and excluded by ``SAMWrapper.state_dict``,
    mask_refiner.py:126-128).  Together with the frozen loaders this is
    the full bridge from a released F-LMM checkpoint to this framework.
    """
    base = cfg.base if hasattr(cfg, "base") else cfg
    sd = load_state_dict(path)
    tp_w = _np(sd["text_proj.weight"])
    return {
        "unet": unet_params(sd, base.unet),
        "text_proj": {
            "w": jnp.asarray(tp_w.T, jnp.float32),
            "b": jnp.asarray(_np(sd["text_proj.bias"]), jnp.float32),
        },
        "text_layer_weights": jnp.asarray(
            _np(sd["text_layer_weights"]), jnp.float32),
        "sam": {
            "prompt": sam_weights.prompt_encoder_params(
                sd, base.sam.prompt, prefix="sam.model.prompt_encoder."),
            "decoder": sam_weights.mask_decoder_params(
                sd, base.sam.decoder, prefix="sam.model.mask_decoder."),
        },
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
