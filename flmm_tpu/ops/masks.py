"""Mask/attention aggregation ops -- pure jittable replacements for the
reference's per-mask Python loops.

The reference iterates ``for mask_id in range(len(masks))`` gathering
attention columns for tokens whose ``mask_ids == mask_id`` and mean/max
merging (flmm/models/frozen_llava.py:134-139, frozen_deepseek_vl.py:133-141).
Here the token->mask matching is a one-hot matrix so the mean merge becomes
an MXU matmul and the max merge a masked reduction; both batch over masks.
"""

from __future__ import annotations

import jax.numpy as jnp


def segment_matrix(mask_ids: jnp.ndarray, num_masks: int) -> jnp.ndarray:
    """One-hot ``(S, M)`` matrix of token-to-mask membership.

    ``mask_ids`` is ``(S,)`` ints in ``[-1, num_masks)``; -1 means the token
    belongs to no mask.
    """
    s = mask_ids.shape[0]
    cols = jnp.arange(num_masks)
    return (mask_ids[:, None] == cols[None, :]).astype(jnp.float32)


def mean_merge_matrix(mask_ids: jnp.ndarray, num_masks: int) -> jnp.ndarray:
    """``(S, M)`` matrix whose matmul with token-major data yields per-mask means."""
    onehot = segment_matrix(mask_ids, num_masks)
    counts = jnp.maximum(onehot.sum(axis=0, keepdims=True), 1.0)
    return onehot / counts


def merge_attention(
    attn: jnp.ndarray,
    mask_ids: jnp.ndarray,
    num_masks: int,
    merge: str = "mean",
) -> jnp.ndarray:
    """Merge per-token attention maps into per-mask maps.

    Args:
      attn: ``(..., S, N)`` attention of each token over N image positions.
      mask_ids: ``(S,)``.
      merge: 'mean' or 'max' (reference ``apply_merge``).

    Returns ``(..., M, N)``.
    """
    if merge == "mean":
        mat = mean_merge_matrix(mask_ids, num_masks)  # (S, M)
        return jnp.einsum(
            "...sn,sm->...mn", attn.astype(jnp.float32), mat
        )
    if merge == "max":
        onehot = segment_matrix(mask_ids, num_masks) > 0  # (S, M)
        big_neg = jnp.finfo(jnp.float32).min
        a = attn.astype(jnp.float32)[..., :, None, :]  # (..., S, 1, N)
        masked = jnp.where(onehot[:, :, None], a, big_neg)
        out = masked.max(axis=-3)  # (..., M, N)
        # Masks with no matched token produce big_neg; zero them (reference
        # asserts matched.sum() > 0, so this only affects padded mask rows).
        return jnp.where(out <= big_neg / 2, 0.0, out)
    raise ValueError(f"unknown merge {merge!r}")


def merge_text_embeds(
    hidden: jnp.ndarray, token_index: jnp.ndarray
) -> jnp.ndarray:
    """Gather per-mask text-token hidden states.

    Args:
      hidden: ``(S, D)`` layer-weighted hidden states.
      token_index: ``(M, T)`` int32 sequence positions per mask (padded rows
        repeat position 0; callers carry a ``(M, T)`` validity mask).

    Returns ``(M, T, D)``.
    """
    return hidden[token_index]


def mask_to_box(
    mask: jnp.ndarray, valid: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Bounding box ``[x0, y0, x1, y1]`` (exclusive max) of a binary mask.

    Jittable replacement of the reference's numpy ``mask2box``
    (flmm/models/mask_head/mask_refiner.py:9-14).  For an empty mask returns
    the full-image box, mirroring mask_refiner.py:87-89.

    Args:
      mask: ``(H, W)`` bool/float binary map.
      valid: unused hook kept for API symmetry.

    Returns float32 ``(4,)`` box in pixel units of the mask frame.
    """
    h, w = mask.shape
    m = mask.astype(jnp.bool_)
    any_ = m.any()
    rows = m.any(axis=1)
    cols = m.any(axis=0)
    ridx = jnp.arange(h)
    cidx = jnp.arange(w)
    y0 = jnp.min(jnp.where(rows, ridx, h))
    y1 = jnp.max(jnp.where(rows, ridx, -1))
    x0 = jnp.min(jnp.where(cols, cidx, w))
    x1 = jnp.max(jnp.where(cols, cidx, -1))
    box = jnp.stack([x0, y0, x1 + 1, y1 + 1]).astype(jnp.float32)
    full = jnp.array([0.0, 0.0, w, h], jnp.float32)
    return jnp.where(any_, box, full)
