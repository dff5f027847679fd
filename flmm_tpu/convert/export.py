"""Model export for serving (StableHLO via jax.export).

The deployment analogue of the reference's ONNX export
(segment_anything/utils/onnx.py: SamOnnxModel, decoder-only export for
lightweight clients): serialize jitted programs to portable StableHLO
artifacts loadable from any PJRT runtime (TPU/CPU/GPU) without Python
model code.
"""

from __future__ import annotations

import pathlib

import jax
import jax.numpy as jnp


def export_fn(fn, example_args, path: str | pathlib.Path) -> None:
    """Serialize ``jax.jit(fn)(*example_args)`` to a StableHLO artifact."""
    from jax import export as jexport

    exported = jexport.export(jax.jit(fn))(*example_args)
    data = exported.serialize()
    pathlib.Path(path).write_bytes(data)


def load_fn(path: str | pathlib.Path):
    """Deserialize an exported function; returns a callable."""
    from jax import export as jexport

    exported = jexport.deserialize(pathlib.Path(path).read_bytes())
    return exported.call


def export_sam_decoder(params: dict, cfg, path: str, max_text: int = 16):
    """Export the SAM prompt+mask decoder (the reference's SamOnnxModel
    scope): inputs are image embeddings, box, dense prompt mask and padded
    text tokens; output low-res mask logits + IoU predictions."""
    from flmm_tpu.models.sam import mask_decoder as smd
    from flmm_tpu.models.sam import prompt_encoder as spe

    s = cfg.prompt.image_embedding_size
    d = cfg.prompt.embed_dim

    def decode(params, image_embedding, boxes, prompt_masks, text, tvalid):
        sparse = jnp.concatenate([
            spe.embed_boxes(params["prompt"], cfg.prompt, boxes),
            text.astype(image_embedding.dtype),
        ], axis=1)
        valid = jnp.concatenate(
            [jnp.ones((boxes.shape[0], 2), bool), tvalid], axis=1)
        dense = spe.embed_masks(params["prompt"], cfg.prompt,
                                prompt_masks[..., None])
        pe = spe.dense_pe(params["prompt"], cfg.prompt)
        masks, iou = smd.forward(params["decoder"], cfg.decoder,
                                 image_embedding, pe, sparse, dense,
                                 sparse_valid=valid)
        return masks, iou

    m = 1
    example = (
        params,
        jnp.zeros((s, s, d), jnp.float32),
        jnp.zeros((m, 4), jnp.float32),
        jnp.zeros((m, cfg.prompt_size, cfg.prompt_size), jnp.float32),
        jnp.zeros((m, max_text, d), jnp.float32),
        jnp.zeros((m, max_text), bool),
    )
    export_fn(decode, example, path)
