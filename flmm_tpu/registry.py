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

# image-placeholder conventions (reference: deepseek configs embed a literal
# '<image_placeholder>' tokenizer token, configs/deepseek_vl/...py:112; the
# other families split on '<image>' and splice IMAGE_TOKEN_INDEX, reference
# mgm/constants.py:8 + mm_utils.tokenizer_image_token)
FAMILY_IMAGE_TOKENS = {
    "deepseek_vl": "<image_placeholder>",
    "llava": "<image>",
    "llava_next": "<image>",
    "mgm": "<image>",
    "hpt": "<image>",
}

# the released configs' caption prompt (reference configs/*/*.py:48-55);
# exactly one image-token occurrence, expanded to n_img ids at encode time
# host-processor resize rule per family (see data/processors._target_hw;
# reference: VLMImageProcessor for deepseek, CustomLlavaImageProcessor for
# llava/llava_next, CustomHPT15ImageProcessor fit-box for hpt; mgm has its
# own crop pipeline in data/mgm.py)
FAMILY_SIZE_RULES = {
    "deepseek_vl": "deepseek",
    "llava": "llava",
    "llava_next": "llava",
    "mgm": "llava",
    "hpt": "hpt15",
}

FAMILY_PROMPTS = {
    "deepseek_vl": ("<image_placeholder>"
                    "Please give me a description of the image."),
    "llava": "<image>\nPlease give me a description of the image.",
    "llava_next": "<image>\nPlease give me a description of the image.",
    "mgm": "<image>\nPlease give me a description of the image.",
    "hpt": "<image>\nPlease give me a description of the image.",
}


def build_prompt(family: str, tokenizer, n_img: int,
                 template: str | None = None, prompt: str | None = None,
                 image_token_id: int | None = None):
    """Family-correct tokenised prompt (see tokenization.
    encode_multimodal_prompt).  ``template``/``prompt`` override the
    released-config defaults; returns a RenderedPrompt whose ``img_start``
    is tokenizer-derived truth."""
    from flmm_tpu.data import tokenization as tok

    tpl = tok.TEMPLATES[template or FAMILY_TEMPLATES[family]]
    return tok.encode_multimodal_prompt(
        tokenizer, tpl, prompt or FAMILY_PROMPTS[family],
        FAMILY_IMAGE_TOKENS[family], n_img, image_token_id=image_token_id,
    )

FAMILIES = {
    "deepseek_vl": Family(
        name="deepseek_vl",
        model_module="flmm_tpu.models.frozen.grounding",
        batch_builder="standard",
        presets={
            "1_3b": "flmm_tpu.configs.deepseek_vl:deepseek_vl_1_3b",
            "7b": "flmm_tpu.configs.deepseek_vl:deepseek_vl_7b",
            "tiny": "flmm_tpu.configs.deepseek_vl:tiny",
            "tiny_hybrid": "flmm_tpu.configs.deepseek_vl:tiny_hybrid",
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
            "mistral_7b": "flmm_tpu.configs.mgm:mgm_mistral_7b",
            "mixtral_8x7b": "flmm_tpu.configs.mgm:mgm_mixtral_8x7b",
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


def resolve_family_setup(family: str, preset: str, tokenizer,
                         template: str | None = None,
                         prompt: str | None = None,
                         sam_size: int | None = None, **cfg_kwargs):
    """Mutually-consistent (config, RenderedPrompt, batch-spec kwargs).

    Derives ``img_start`` from the actual tokenisation of the family
    prompt (plus 128-alignment padding when the preset uses the
    flash-capture decoder kernel), rebuilds the config with that value,
    and returns the ``align_image_block``/``expected_img_start`` kwargs
    every batch builder needs so the static model offset and the data
    pipeline can never drift apart (the reference trusts convention here;
    we assert it).
    """
    cfg = get_config(family, preset, **cfg_kwargs)
    base = cfg.base if hasattr(cfg, "base") else cfg
    rp = build_prompt(family, tokenizer, base.num_img_tokens,
                      template=template, prompt=prompt)
    align = 128 if getattr(base.llm, "use_flash_capture", False) else None
    derived = rp.img_start
    if align:
        derived += (align - derived % align) % align
    if derived != base.img_start:
        cfg = get_config(family, preset, img_start=derived, **cfg_kwargs)
        base = cfg.base if hasattr(cfg, "base") else cfg
        align = (128 if getattr(base.llm, "use_flash_capture", False)
                 else None)
    if sam_size is not None and sam_size != base.sam.encoder.img_size:
        cfg = with_sam_size(cfg, sam_size)
        base = cfg.base if hasattr(cfg, "base") else cfg
    from flmm_tpu.data.processors import ProcessorConfig

    spec_kwargs = {"align_image_block": align,
                   "expected_img_start": base.img_start,
                   "sam_size": base.sam.encoder.img_size,
                   "prompt_size": base.sam.prompt_size,
                   "processor": ProcessorConfig(
                       size=base.input_size,
                       size_rule=FAMILY_SIZE_RULES[family])}
    return cfg, rp, spec_kwargs


def with_sam_size(cfg, img_size: int):
    """Rebuild a grounding config with the SAM refiner at a different
    input resolution (the reduced-resolution deployment schedule; see
    configs/deepseek_vl.sam_vit_l).  Threads the derived grid through the
    prompt-encoder geometry and the dense-prompt resolution."""
    import dataclasses

    base = cfg.base if hasattr(cfg, "base") else cfg
    sam = base.sam
    assert img_size % sam.encoder.patch_size == 0, img_size
    grid = img_size // sam.encoder.patch_size
    new_sam = dataclasses.replace(
        sam,
        encoder=dataclasses.replace(sam.encoder, img_size=img_size),
        prompt=dataclasses.replace(
            sam.prompt, image_embedding_size=grid,
            input_image_size=img_size),
        prompt_size=4 * grid,
    )
    new_base = dataclasses.replace(base, sam=new_sam)
    if hasattr(cfg, "base"):
        return dataclasses.replace(cfg, base=new_base)
    return new_base


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
