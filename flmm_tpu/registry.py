"""Model-family registry: one place mapping family names to their config
factories, batch builders and model modules.

Plays the role of the reference's xtuner BUILDER + per-family config files
(SURVEY.md section 2.4): an experiment is a family name + a config factory
+ data settings, all plain python.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable


@dataclasses.dataclass(frozen=True)
class Family:
    name: str
    model_module: str  # import path of the model (forward/loss_fn/init_params)
    batch_builder: str  # 'standard' | 'anyres' | 'mgm'
    presets: dict  # name -> config factory import path


# prompt template per family (xtuner PROMPT_TEMPLATE choices the released
# configs use; see data/tokenization.TEMPLATES)
FAMILY_TEMPLATES = {
    "deepseek_vl": "deepseek",
    "llava": "vicuna",
    "llava_next": "vicuna",  # mistral preset overrides to 'mistral'
    "mgm": "gemma",  # vicuna presets override to 'vicuna'
    "hpt": "internlm2_chat",
}

FAMILIES = {
    "deepseek_vl": Family(
        name="deepseek_vl",
        model_module="flmm_tpu.models.frozen.grounding",
        batch_builder="standard",
        presets={
            "1_3b": "flmm_tpu.configs.deepseek_vl:deepseek_vl_1_3b",
            "tiny": "flmm_tpu.configs.deepseek_vl:tiny",
        },
    ),
    "llava": Family(
        name="llava",
        model_module="flmm_tpu.models.frozen.grounding",
        batch_builder="standard",
        presets={
            "1_5_7b": "flmm_tpu.configs.llava:llava_1_5_7b",
            "tiny": "flmm_tpu.configs.llava:tiny_llava",
        },
    ),
    "llava_next": Family(
        name="llava_next",
        model_module="flmm_tpu.models.frozen.llava_next",
        batch_builder="anyres",
        presets={
            "vicuna_7b": "flmm_tpu.configs.llava_next:llava_next_vicuna_7b",
            "mistral_7b": "flmm_tpu.configs.llava_next:llava_next_mistral_7b",
            "tiny": "flmm_tpu.configs.llava_next:tiny_llava_next",
        },
    ),
    "mgm": Family(
        name="mgm",
        model_module="flmm_tpu.models.frozen.mgm",
        batch_builder="mgm",
        presets={
            "gemma_2b": "flmm_tpu.configs.mgm:mgm_gemma_2b",
            "vicuna_7b": "flmm_tpu.configs.mgm:mgm_vicuna_7b",
            "vicuna_7b_hd": "flmm_tpu.configs.mgm:mgm_vicuna_7b_hd",
            "tiny": "flmm_tpu.configs.mgm:tiny_mgm",
        },
    ),
    "hpt": Family(
        name="hpt",
        model_module="flmm_tpu.models.frozen.grounding",
        batch_builder="standard",
        presets={
            "air": "flmm_tpu.configs.hpt:hpt_air",
            "air_1_5": "flmm_tpu.configs.hpt:hpt_air_1_5",
            "tiny": "flmm_tpu.configs.hpt:tiny_hpt",
        },
    ),
}


def _import(path: str) -> Any:
    import importlib

    mod, _, attr = path.partition(":")
    m = importlib.import_module(mod)
    return getattr(m, attr) if attr else m


def get_model(family: str):
    import importlib

    return importlib.import_module(FAMILIES[family].model_module)


def get_config(family: str, preset: str, **kwargs):
    return _import(FAMILIES[family].presets[preset])(**kwargs)


def get_batch_builder(family: str, **spec_kwargs) -> Callable:
    """Return a ``(samples, batch_spec) -> batch`` callable.

    Family-specific processing specs (anyres pinpoints, MGM grid) bind
    here with defaults matching the released configs; override via
    ``spec_kwargs``.
    """
    kind = FAMILIES[family].batch_builder
    if kind == "standard":
        from flmm_tpu.data.collate import build_batch

        return build_batch
    if kind == "anyres":
        from flmm_tpu.data.llava_next import AnyresSpec, build_anyres_batch

        anyres = AnyresSpec(**spec_kwargs)
        return lambda samples, spec: build_anyres_batch(samples, spec, anyres)
    if kind == "mgm":
        from flmm_tpu.data.mgm import MGMProcessSpec, build_mgm_batch

        mgm = MGMProcessSpec(**spec_kwargs)
        return lambda samples, spec: build_mgm_batch(samples, spec, mgm)
    raise KeyError(kind)


def get_coarse_hw(cfg) -> tuple:
    """Canonical coarse-mask frame for a family config.

    LLaVA-Next uses its fixed square frame; MGM's U-Net input is the
    (grid*clip_shape)^2 map; contiguous-block families derive it from the
    U-Net's upsample rule over the attention grid.
    """
    from flmm_tpu.models.mask_head.unet import output_hw

    if hasattr(cfg, "coarse_frame"):  # LlavaNextConfig
        return tuple(cfg.coarse_frame)
    if hasattr(cfg, "map_hw"):  # MGMConfig
        return output_hw(cfg.base.unet, cfg.map_hw)
    return output_hw(cfg.unet, (cfg.clip_shape, cfg.clip_shape))


def get_loader(family: str) -> Callable:
    """Frozen-checkpoint loader for a family:
    ``loader(checkpoint_dir, cfg, sam_checkpoint=None, **extra)``.
    MGM additionally takes clip_checkpoint/aux_checkpoint."""
    from flmm_tpu.convert import load as load_mod

    loaders = {
        "deepseek_vl": load_mod.deepseek_vl_frozen,
        "llava": load_mod.llava_frozen,
        "llava_next": lambda c, g, s=None, **kw: load_mod.llava_frozen(
            c, g, s, next_variant=True),
        "hpt": load_mod.hpt_frozen,
        "mgm": lambda c, g, s=None, clip_checkpoint=None,
        aux_checkpoint=None: load_mod.mgm_frozen(
            c, g, clip_checkpoint, aux_checkpoint, s),
    }
    return loaders[family]
