"""Interactive SAM predictor (JAX).

Behavioural spec: reference segment_anything/predictor.py (SamPredictor) --
``set_image`` embeds once, then ``predict`` takes point/box/mask prompts in
original-image coordinates and returns masks at original resolution with
IoU predictions and low-res logits.

Host-side convenience wrapper over the jitted encoder/prompt/decoder; per
prompt-shape programs are cached.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from flmm_tpu.data.processors import sam_preprocess
from flmm_tpu.evalsuite.runner import resize_prob_map
from flmm_tpu.models.mask_head.refiner import SamRefinerConfig
from flmm_tpu.models.sam import image_encoder as sam_encoder
from flmm_tpu.models.sam import mask_decoder as sam_decoder
from flmm_tpu.models.sam import prompt_encoder as sam_prompt


class SamPredictor:
    def __init__(self, params: dict, cfg: SamRefinerConfig):
        """``params``: {'encoder', 'prompt', 'decoder'} trees."""
        self.params = params
        self.cfg = cfg
        self._embed = None
        self._jit = {}
        self.original_size = None
        self.input_size = None

    def set_image(self, image) -> None:
        """Embed a PIL image (reference predictor.py set_image)."""
        pre = sam_preprocess(image, self.cfg.encoder.img_size)
        self.original_size = (image.height, image.width)
        self.input_size = pre["sam_input_size"]
        if "encode" not in self._jit:
            self._jit["encode"] = jax.jit(
                lambda p, x: sam_encoder.forward(p, self.cfg.encoder, x))
        self._embed = self._jit["encode"](
            self.params["encoder"],
            jnp.asarray(pre["sam_pixel_values"])[None])[0]

    def _transform_coords(self, coords: np.ndarray) -> np.ndarray:
        oh, ow = self.original_size
        nh, nw = self.input_size
        out = coords.astype(np.float32).copy()
        out[..., 0] *= nw / ow
        out[..., 1] *= nh / oh
        return out

    def predict(
        self,
        point_coords: np.ndarray | None = None,
        point_labels: np.ndarray | None = None,
        box: np.ndarray | None = None,
        mask_input: np.ndarray | None = None,
        multimask_output: bool = True,
    ):
        """Predict masks for one prompt set.

        Args/returns mirror the reference: coords ``(N, 2)`` xy in original
        pixels, labels 1/0, box ``(4,)`` xyxy, mask_input ``(1, 256, 256)``
        logits.  Returns (masks (C, oh, ow) bool, iou_pred (C,),
        low_res_logits (C, 256, 256)).
        """
        assert self._embed is not None, "call set_image first"
        cfg = self.cfg
        pcfg = cfg.prompt
        sparse_parts = []
        if point_coords is not None:
            pts = self._transform_coords(np.asarray(point_coords))[None]
            labs = np.asarray(point_labels, np.int32)[None]
            key = ("pts", pts.shape, box is not None)
            sparse_parts.append(sam_prompt.embed_points(
                self.params["prompt"], pcfg, jnp.asarray(pts),
                jnp.asarray(labs), pad=box is None))
        if box is not None:
            b = self._transform_coords(
                np.asarray(box, np.float32).reshape(2, 2)).reshape(1, 4)
            sparse_parts.append(sam_prompt.embed_boxes(
                self.params["prompt"], pcfg, jnp.asarray(b)))
        if sparse_parts:
            sparse = jnp.concatenate(sparse_parts, axis=1)
        else:
            sparse = jnp.zeros((1, 0, pcfg.embed_dim), jnp.float32)

        if mask_input is not None:
            dense = sam_prompt.embed_masks(
                self.params["prompt"], pcfg,
                jnp.asarray(mask_input, jnp.float32).reshape(
                    1, cfg.prompt_size, cfg.prompt_size, 1))
        else:
            dense = sam_prompt.no_mask_dense(self.params["prompt"], pcfg, 1)

        image_pe = sam_prompt.dense_pe(self.params["prompt"], pcfg)
        masks, iou = sam_decoder.forward(
            self.params["decoder"], cfg.decoder, self._embed, image_pe,
            sparse, dense)
        sl = slice(1, None) if multimask_output else slice(0, 1)
        low_res = np.asarray(masks[0, sl], np.float32)
        iou_pred = np.asarray(iou[0, sl])

        nh, nw = self.input_size
        P = cfg.prompt_size
        rh = max(1, int(round(nh * P / cfg.encoder.img_size)))
        rw = max(1, int(round(nw * P / cfg.encoder.img_size)))
        out_masks = np.stack([
            resize_prob_map(m[:rh, :rw], self.original_size) > 0.0
            for m in low_res
        ])
        return out_masks, iou_pred, low_res
