"""LLaVA-Next anyres processing and static-shape batch assembly.

Behavioural spec: reference flmm/datasets/llava_next_processors.py (best-
resolution selection, resize-for-patching, **centred** pad, tiling) and
llava/modeling_llava_next.py:240-301 (per-tile feature re-assembly,
``unpad_image``, newline column, base-features-first packing).

TPU static-shape design: the packed image block is padded to
``n_img_max = 576 + max_fh*(max_fw+1)`` slots.  Real tokens keep the exact
reference order (base row-major, then fine rows each ending in a newline
token); pad slots are attention-masked and skipped by explicit position
ids, so RoPE relative positions equal the reference's dynamically-sized
sequence.  Host-built index maps drive feature gathering and fine-map
re-assembly on device.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
from PIL import Image

from flmm_tpu.data import geometry
from flmm_tpu.data.collate import (
    BatchSpec, embed_gt_coarse, embed_gt_sam,
)
from flmm_tpu.data.processors import CLIP_MEAN, CLIP_STD, sam_preprocess

DEFAULT_PINPOINTS = ((336, 672), (672, 336), (672, 672), (1008, 336),
                     (336, 1008))


def select_best_resolution(orig_hw: tuple, pinpoints) -> tuple:
    """HF select_best_resolution: max effective resolution, min waste."""
    oh, ow = orig_hw
    best, best_fit, min_waste = None, 0, float("inf")
    for th, tw in pinpoints:
        scale = min(tw / ow, th / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        effective = min(dw * dh, ow * oh)
        waste = th * tw - effective
        if effective > best_fit or (effective == best_fit and waste < min_waste):
            best, best_fit, min_waste = (th, tw), effective, waste
    return best


def _patch_output_size(oh, ow, th, tw) -> tuple:
    scale = min(tw / ow, th / oh)
    if tw / ow < th / oh:
        return min(math.ceil(oh * tw / ow), th), tw
    return th, min(math.ceil(ow * th / oh), tw)


def unpad_feature_hw(orig_hw: tuple, canvas_hw: tuple) -> tuple[int, int, int, int]:
    """Feature-space unpad math (upstream ``unpad_image``): returns
    (fh, fw, pad_r, pad_c) -- the retained extent and its offset in the
    padded canvas.  Note fh = canvas_h - 2*pad (parity-exact)."""
    oh, ow = orig_hw
    ch, cw = canvas_hw
    if ow / oh > cw / ch:
        new_h = int(oh * (cw / ow))
        pad = (ch - new_h) // 2
        return ch - 2 * pad, cw, pad, 0
    new_w = int(ow * (ch / oh))
    pad = (cw - new_w) // 2
    return ch, cw - 2 * pad, 0, pad


@dataclasses.dataclass(frozen=True)
class AnyresSpec:
    tile_size: int = 336
    patch_size: int = 14
    pinpoints: tuple = DEFAULT_PINPOINTS
    mean: tuple = CLIP_MEAN
    std: tuple = CLIP_STD

    @property
    def grid(self) -> int:
        return self.tile_size // self.patch_size  # 24

    @property
    def max_tiles(self) -> int:
        g = self.tile_size
        return max((th // g) * (tw // g) for th, tw in self.pinpoints)

    @property
    def max_fine_hw(self) -> tuple:
        g, gr = self.tile_size, self.grid
        fh = max((th // g) * gr for th, tw in self.pinpoints)
        fw = max((tw // g) * gr for th, tw in self.pinpoints)
        return fh, fw

    @property
    def n_img_max(self) -> int:
        g, gr = self.tile_size, self.grid
        n_fine = max(
            ((th // g) * gr) * ((tw // g) * gr + 1) for th, tw in self.pinpoints
        )
        return gr * gr + n_fine


def _normalize(img: Image.Image, spec: AnyresSpec) -> np.ndarray:
    arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
    return (arr - np.asarray(spec.mean, np.float32)) / np.asarray(
        spec.std, np.float32
    )


def anyres_process(image: Image.Image, spec: AnyresSpec) -> dict:
    """Image -> base + tile tensors, grid shape and fine-frame geometry."""
    w, h = image.size
    th, tw = select_best_resolution((h, w), spec.pinpoints)
    nh, nw = _patch_output_size(h, w, th, tw)
    resized = image.resize((nw, nh), Image.BICUBIC)
    canvas = Image.new("RGB", (tw, th), (0, 0, 0))
    pad_h, pad_w = th - nh, tw - nw
    canvas.paste(resized, (pad_w // 2, pad_h // 2))
    carr = _normalize(canvas, spec)
    g = spec.tile_size
    ph, pw = th // g, tw // g
    tiles = [
        carr[r * g:(r + 1) * g, c * g:(c + 1) * g]
        for r in range(ph) for c in range(pw)
    ]
    base = _normalize(image.resize((g, g), Image.BICUBIC), spec)
    gr = spec.grid
    fh, fw, pad_r, pad_c = unpad_feature_hw((h, w), (ph * gr, pw * gr))
    return {
        "base": base,
        "tiles": np.stack(tiles),
        "grid": (ph, pw),
        "fine_hw": (fh, fw),
        "fine_pad": (pad_r, pad_c),
        "orig_hw": (h, w),
    }


def block_layout(spec: AnyresSpec, grid: tuple, fine_hw: tuple,
                 fine_pad: tuple) -> dict:
    """Index maps for the padded image block.

    Feature source layout (per sample): ``[base (g2) | tiles (T_max*g2) |
    newline | zero]``; returns

    * block_index ``(n_img_max,)``: source row for each block slot,
    * block_valid ``(n_img_max,)``,
    * fine_gather ``(max_fh*max_fw,)``: block-slot offset (into the image
      block) for fine-map re-assembly, 0 where invalid,
    * fine_valid ``(max_fh*max_fw,)``.
    """
    gr = spec.grid
    g2 = gr * gr
    ph, pw = grid
    fh, fw = fine_hw
    pad_r, pad_c = fine_pad
    n_max = spec.n_img_max
    newline_idx = g2 * (1 + spec.max_tiles)
    zero_idx = newline_idx + 1

    block_index = np.full((n_max,), zero_idx, np.int32)
    block_valid = np.zeros((n_max,), bool)
    block_index[:g2] = np.arange(g2)
    block_valid[:g2] = True
    n_fine = fh * (fw + 1)
    j = np.arange(n_fine)
    r = j // (fw + 1)
    c = j % (fw + 1)
    is_newline = c == fw
    rr = r + pad_r
    cc = c + pad_c
    tile = (rr // gr) * pw + (cc // gr)
    src = g2 + tile * g2 + (rr % gr) * gr + (cc % gr)
    block_index[g2:g2 + n_fine] = np.where(is_newline, newline_idx, src)
    block_valid[g2:g2 + n_fine] = True

    max_fh, max_fw = spec.max_fine_hw
    k = np.arange(max_fh * max_fw)
    kr = k // max_fw
    kc = k % max_fw
    fine_ok = (kr < fh) & (kc < fw)
    fine_gather = np.where(fine_ok, g2 + kr * (fw + 1) + kc, 0).astype(np.int32)
    return {
        "block_index": block_index,
        "block_valid": block_valid,
        "fine_gather": fine_gather,
        "fine_valid": fine_ok,
    }


def build_anyres_batch(samples: list[dict], spec: BatchSpec,
                       anyres: AnyresSpec) -> dict:
    """Assemble a static batch for the LLaVA-Next model.

    Extends the standard schema with: tiles ``(B, 1+T_max, g, g, 3)``,
    tile_valid, block_index/block_valid, fine_gather/fine_valid,
    position_ids, and fine-frame geometry scalars (fine extent mapped into
    the canonical square coarse frame).
    """
    B = len(samples)
    S, M, T = spec.seq_len, spec.max_masks, spec.text_per_mask
    P = spec.prompt_size
    Hc, Wc = spec.coarse_hw
    g = anyres.tile_size
    n_max = anyres.n_img_max

    out = {
        "input_ids": np.full((B, S), spec.pad_token_id, np.int32),
        "attn_mask": np.zeros((B, S), bool),
        "position_ids": np.zeros((B, S), np.int32),
        "mask_ids": np.full((B, S), -1, np.int32),
        "mask_valid": np.zeros((B, M), bool),
        "text_idx": np.zeros((B, M, T), np.int32),
        "text_valid": np.zeros((B, M, T), bool),
        "tiles": np.zeros((B, 1 + anyres.max_tiles, g, g, 3), np.float32),
        "tile_valid": np.zeros((B, 1 + anyres.max_tiles), bool),
        "block_index": np.zeros((B, n_max), np.int32),
        "block_valid": np.zeros((B, n_max), bool),
        "fine_gather": np.zeros(
            (B, anyres.max_fine_hw[0] * anyres.max_fine_hw[1]), np.int32),
        "fine_valid": np.zeros(
            (B, anyres.max_fine_hw[0] * anyres.max_fine_hw[1]), bool),
        "fine_hw": np.zeros((B, 2), np.float32),
        "sam_pixel_values": np.zeros((B, spec.sam_size, spec.sam_size, 3),
                                     np.float32),
        "gt_coarse": np.zeros((B, M, Hc, Wc), np.float32),
        "coarse_weight": np.zeros((B, Hc, Wc), np.float32),
        "gt_sam": np.zeros((B, M, P, P), np.float32),
        "sam_weight": np.zeros((B, P, P), np.float32),
    }
    metas, sam_hws, infos = [], [], []

    for b, s in enumerate(samples):
        proc = anyres_process(s["image"], anyres)
        layout = block_layout(anyres, proc["grid"], proc["fine_hw"],
                              proc["fine_pad"])
        n_tiles = proc["tiles"].shape[0]
        out["tiles"][b, 0] = proc["base"]
        out["tiles"][b, 1:1 + n_tiles] = proc["tiles"]
        out["tile_valid"][b, :1 + n_tiles] = True
        for k in ("block_index", "block_valid", "fine_gather", "fine_valid"):
            out[k][b] = layout[k]
        out["fine_hw"][b] = proc["fine_hw"]

        # the sample's input_ids contain a placeholder image block of
        # exactly n_img_max tokens starting at img_start (data side pads);
        # optionally insert masked pads so the block is 128-aligned for the
        # flash-capture kernel (positions skip pads)
        full_ids = s["input_ids"]
        full_mids = s["mask_ids"]
        img_start = s["img_start"]
        span_shift = 0
        if spec.align_image_block:
            a = spec.align_image_block
            pad_n = (a - img_start % a) % a
            if pad_n:
                full_ids = np.concatenate([
                    full_ids[:img_start],
                    np.full((pad_n,), spec.pad_token_id, np.int32),
                    full_ids[img_start:]])
                full_mids = np.concatenate([
                    full_mids[:img_start], np.full((pad_n,), -1, np.int32),
                    full_mids[img_start:]])
                span_shift = pad_n
                img_start += pad_n
        if spec.expected_img_start is not None:
            assert img_start == spec.expected_img_start, (
                f"sample img_start {img_start} != config img_start "
                f"{spec.expected_img_start}; prompt template/tokenizer "
                "drifted from the model config")
        ids = full_ids[:S]
        n = len(ids)
        out["input_ids"][b, :n] = ids
        valid = np.zeros((S,), bool)
        valid[:n] = True
        if span_shift:
            valid[img_start - span_shift:img_start] = False
        valid[img_start:img_start + n_max] = layout["block_valid"]
        out["attn_mask"][b] = valid
        out["position_ids"][b] = np.maximum(np.cumsum(valid) - 1, 0)
        mids = full_mids[:S]
        mids = np.where(mids >= M, -1, mids)
        out["mask_ids"][b, :len(mids)] = mids
        # (invalid image-pad slots carry -1 already: the sample's mask_ids
        # stream marks the whole placeholder block as no-mask)

        oh, ow = proc["orig_hw"]
        meta = geometry.lmm_meta(oh, ow, g)
        sam = sam_preprocess(s["image"], spec.sam_size)
        out["sam_pixel_values"][b] = sam["sam_pixel_values"]
        metas.append(meta)
        sam_hws.append(sam["sam_input_size"])
        out["coarse_weight"][b] = geometry.coarse_weight(meta, (Hc, Wc))
        out["sam_weight"][b] = geometry.sam_weight(
            sam["sam_input_size"], frame=P, long_side=spec.sam_size)

        masks = s["masks"][:M]
        for m, (mask, span) in enumerate(zip(masks, s["spans"][:M])):
            lo, hi = span[0] + span_shift, span[1] + span_shift
            hi = min(hi, n)
            if hi <= lo:
                continue
            out["mask_valid"][b, m] = True
            kk = min(hi - lo, T)
            out["text_idx"][b, m, :kk] = np.arange(lo, lo + kk)
            out["text_valid"][b, m, :kk] = True
            out["gt_coarse"][b, m] = embed_gt_coarse(mask, meta, (Hc, Wc))
            out["gt_sam"][b, m] = embed_gt_sam(mask, sam["sam_input_size"], P,
                                               spec.sam_size)
        infos.append({
            "file_name": s.get("file_name"),
            "orig_size": s["masks"].shape[-2:],
            "num_masks": int(out["mask_valid"][b].sum()),
            "mask_infos": s.get("mask_infos"),
        })

    out["geom"] = geometry.batch_geom(metas, (Hc, Wc), sam_hws)
    out["infos"] = infos
    return out
