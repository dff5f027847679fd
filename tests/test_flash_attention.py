"""Pallas flash attention + capture vs reference einsum attention
(interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from flmm_tpu.ops.flash_attention import flash_attention_with_capture


def reference_attention(q, k, v, lengths, img_start, n_img):
    B, H, S, hd = q.shape
    scale = 1.0 / np.sqrt(hd)
    logits = jnp.einsum("bhsd,bhtd->bhst", q, k) * scale
    causal = jnp.tril(jnp.ones((S, S), bool))
    valid = jnp.arange(S)[None, :] < lengths[:, None]
    mask = causal[None, None] & valid[:, None, None, :]
    logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhst,bhtd->bhsd", probs.astype(q.dtype), v)
    return out, probs[..., img_start:img_start + n_img]


def test_flash_capture_matches_reference():
    rng = np.random.default_rng(0)
    B, H, S, hd = 2, 3, 512, 64
    img_start, n_img = 128, 200
    q = jnp.asarray(rng.standard_normal((B, H, S, hd)).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.standard_normal((B, H, S, hd)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.standard_normal((B, H, S, hd)).astype(np.float32) * 0.3)
    lengths = jnp.asarray([512, 384], jnp.int32)

    out, img = flash_attention_with_capture(
        q, k, v, lengths, img_start, n_img, interpret=True)
    want_out, want_img = reference_attention(q, k, v, lengths, img_start, n_img)

    # rows beyond the valid length are garbage in both paths; compare valid
    for b, L in enumerate([512, 384]):
        np.testing.assert_allclose(
            np.asarray(out)[b, :, :L], np.asarray(want_out)[b, :, :L],
            atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(img)[b, :, :L], np.asarray(want_img)[b, :, :L],
            atol=2e-5)


def test_flash_capture_probs_sum():
    """Captured rows over a fully-visible image block must be proper
    probabilities (sum <= 1, nonnegative)."""
    rng = np.random.default_rng(1)
    B, H, S, hd = 1, 2, 256, 32
    q = jnp.asarray(rng.standard_normal((B, H, S, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, S, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, S, hd)).astype(np.float32))
    lengths = jnp.asarray([256], jnp.int32)
    _, img = flash_attention_with_capture(q, k, v, lengths, 0, 128,
                                          interpret=True)
    arr = np.asarray(img)
    assert (arr >= 0).all()
    # query rows after the image block see all image keys
    sums = arr[0, :, 200:].sum(-1)
    assert (sums <= 1.0 + 1e-5).all()


def test_flash_merged_capture_matches_reference():
    from flmm_tpu.ops.flash_attention import flash_attention_with_merged_capture
    from flmm_tpu.ops.masks import mean_merge_matrix

    rng = np.random.default_rng(2)
    B, H, S, hd = 2, 2, 384, 32
    img_start, n_img = 128, 100
    M = 3
    q = jnp.asarray(rng.standard_normal((B, H, S, hd)).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.standard_normal((B, H, S, hd)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.standard_normal((B, H, S, hd)).astype(np.float32) * 0.3)
    lengths = jnp.asarray([384, 320], jnp.int32)
    mask_ids = np.full((B, S), -1, np.int32)
    mask_ids[0, 300:310] = 0
    mask_ids[0, 312:330] = 1
    mask_ids[1, 290:300] = 2
    mm = jnp.stack([mean_merge_matrix(jnp.asarray(mask_ids[b]), M)
                    for b in range(B)])

    key_valid = jnp.arange(S)[None, :] < lengths[:, None]
    out, merged = flash_attention_with_merged_capture(
        q, k, v, key_valid, mm, img_start, n_img, interpret=True)
    want_out, want_img = reference_attention(q, k, v, lengths, img_start, n_img)
    want_merged = jnp.einsum("bhsn,bsm->bhmn", want_img, mm)
    # bf16 contraction in-kernel: tolerate bf16-level error
    np.testing.assert_allclose(np.asarray(merged), np.asarray(want_merged),
                               atol=2e-3)
    for b, L in enumerate([384, 320]):
        np.testing.assert_allclose(
            np.asarray(out)[b, :, :L], np.asarray(want_out)[b, :, :L],
            atol=2e-5)


def test_forward_capture_flash_path_matches_xla():
    """DecoderConfig.use_flash_capture must match the XLA merged path
    (interpret mode on CPU)."""
    import dataclasses
    import jax
    from unittest import mock
    from flmm_tpu.models.llm import decoder as llm
    from flmm_tpu.ops import flash_attention as fa
    from flmm_tpu.ops.masks import mean_merge_matrix

    cfg = llm.DecoderConfig(
        vocab_size=64, hidden_size=64, num_layers=2, num_heads=2,
        num_kv_heads=1, head_dim=32, intermediate_size=64,
        dtype=jnp.float32)
    params = llm.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    B, S = 1, 256
    img_start, n_img = 128, 64
    embeds = jnp.asarray(
        rng.standard_normal((B, S, 64)).astype(np.float32) * 0.1)
    mask = np.ones((B, S), bool)
    mask[:, 240:] = False
    mask_ids = np.full((B, S), -1, np.int32)
    mask_ids[0, 200:210] = 0
    mm = mean_merge_matrix(jnp.asarray(mask_ids[0]), 2)[None]

    base = llm.forward_capture(
        params, cfg, embeds, jnp.asarray(mask), img_start, n_img,
        merge_matrix=mm, merge="mean")

    cfg_f = dataclasses.replace(cfg, use_flash_capture=True)
    orig = fa.flash_attention_with_merged_capture
    with mock.patch.object(
            fa, "flash_attention_with_merged_capture",
            lambda *a, **k: orig(*a, **k, interpret=True)):
        flash = llm.forward_capture(
            params, cfg_f, embeds, jnp.asarray(mask), img_start, n_img,
            merge_matrix=mm, merge="mean")
    np.testing.assert_allclose(
        np.asarray(flash["attn"]), np.asarray(base["attn"]), atol=3e-3)
    np.testing.assert_allclose(
        np.asarray(flash["last_hidden"])[:, :240],
        np.asarray(base["last_hidden"])[:, :240], atol=2e-4)
