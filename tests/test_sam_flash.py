"""SAM global-attention flash kernel vs the XLA reference path."""

import numpy as np
import jax
import jax.numpy as jnp

from flmm_tpu.ops.sam_flash_experiments import sam_global_attention


def reference(q, k, v, rph, rpw, side):
    G, S, hd = q.shape
    scale = 1.0 / np.sqrt(hd)
    logits = jnp.einsum("gqd,gkd->gqk", q * scale, k)
    coords = jnp.arange(side)[:, None] - jnp.arange(side)[None, :] + side - 1
    rh = rph[coords]
    rw = rpw[coords]
    qg = q.reshape(G, side, side, hd)
    bh = jnp.einsum("gyxd,ykd->gyxk", qg, rh)
    bw = jnp.einsum("gyxd,xkd->gyxk", qg, rw)
    logits = logits.reshape(G, side, side, side, side)
    logits = logits + bh[..., :, None] + bw[..., None, :]
    logits = logits.reshape(G, S, S)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("gqk,gkd->gqd", probs.astype(q.dtype), v)


def test_sam_flash_parity_interpret():
    rng = np.random.default_rng(0)
    side, hd, G = 16, 32, 2  # S = 256
    S = side * side
    q = jnp.asarray(rng.standard_normal((G, S, hd)).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.standard_normal((G, S, hd)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.standard_normal((G, S, hd)).astype(np.float32) * 0.3)
    rph = jnp.asarray(rng.standard_normal((2 * side - 1, hd)).astype(
        np.float32) * 0.1)
    rpw = jnp.asarray(rng.standard_normal((2 * side - 1, hd)).astype(
        np.float32) * 0.1)
    got = sam_global_attention(q, k, v, rph, rpw, side, interpret=True)
    want = reference(q, k, v, rph, rpw, side)
    # bias is carried in bf16 inside the kernel
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2)
    corr = np.corrcoef(np.asarray(got).ravel(), np.asarray(want).ravel())[0, 1]
    assert corr > 0.9999


def test_sam_window_flash_parity_interpret():
    from flmm_tpu.ops.sam_flash_experiments import sam_window_attention

    rng = np.random.default_rng(2)
    side, hd, G = 7, 16, 3  # T = 49 (odd size exercises padding)
    T = side * side
    q = jnp.asarray(rng.standard_normal((G, T, hd)).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.standard_normal((G, T, hd)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.standard_normal((G, T, hd)).astype(np.float32) * 0.3)
    rph = jnp.asarray(
        rng.standard_normal((2 * side - 1, hd)).astype(np.float32) * 0.1)
    rpw = jnp.asarray(
        rng.standard_normal((2 * side - 1, hd)).astype(np.float32) * 0.1)
    got = sam_window_attention(q, k, v, rph, rpw, side, interpret=True)
    want = reference(q, k, v, rph, rpw, side)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2)
    corr = np.corrcoef(np.asarray(got).ravel(), np.asarray(want).ravel())[0, 1]
    assert corr > 0.9999


def test_sam_flash_v2_parity_interpret():
    from flmm_tpu.ops.sam_flash_experiments import sam_global_attention_v2

    rng = np.random.default_rng(1)
    side, hd, G = 16, 32, 2  # S = 256
    S = side * side
    q = jnp.asarray(rng.standard_normal((G, S, hd)).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.standard_normal((G, S, hd)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.standard_normal((G, S, hd)).astype(np.float32) * 0.3)
    rph = jnp.asarray(rng.standard_normal((2 * side - 1, hd)).astype(
        np.float32) * 0.1)
    rpw = jnp.asarray(rng.standard_normal((2 * side - 1, hd)).astype(
        np.float32) * 0.1)
    want = reference(q, k, v, rph, rpw, side)
    for bias_mode in ("matmul", "broadcast"):
        got = sam_global_attention_v2(
            q, k, v, rph, rpw, side, interpret=True, block_q=64,
            bias_mode=bias_mode)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-2, err_msg=bias_mode)
        corr = np.corrcoef(np.asarray(got).ravel(),
                           np.asarray(want).ravel())[0, 1]
        assert corr > 0.9999, bias_mode


def test_sam_window_flash_v2_parity_interpret():
    from flmm_tpu.ops.sam_flash_experiments import sam_window_attention_v2

    rng = np.random.default_rng(3)
    side, hd, G = 7, 16, 3  # T = 49 (odd size exercises padding)
    T = side * side
    q = jnp.asarray(rng.standard_normal((G, T, hd)).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.standard_normal((G, T, hd)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.standard_normal((G, T, hd)).astype(np.float32) * 0.3)
    rph = jnp.asarray(
        rng.standard_normal((2 * side - 1, hd)).astype(np.float32) * 0.1)
    rpw = jnp.asarray(
        rng.standard_normal((2 * side - 1, hd)).astype(np.float32) * 0.1)
    got = sam_window_attention_v2(q, k, v, rph, rpw, side, interpret=True)
    want = reference(q, k, v, rph, rpw, side)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2)
    corr = np.corrcoef(np.asarray(got).ravel(), np.asarray(want).ravel())[0, 1]
    assert corr > 0.9999


def test_sam_flash_v3_parity_interpret():
    from flmm_tpu.ops.sam_flash_experiments import (
        sam_global_attention_v3, sam_window_attention_v3,
    )

    rng = np.random.default_rng(4)
    # global (square S) and window (odd side exercises tp/kp padding)
    for fn, side, hd, G in ((sam_global_attention_v3, 16, 32, 2),
                            (sam_window_attention_v3, 7, 16, 3)):
        T = side * side
        q = jnp.asarray(rng.standard_normal((G, T, hd)).astype(np.float32)
                        * 0.3)
        k = jnp.asarray(rng.standard_normal((G, T, hd)).astype(np.float32)
                        * 0.3)
        v = jnp.asarray(rng.standard_normal((G, T, hd)).astype(np.float32)
                        * 0.3)
        rph = jnp.asarray(rng.standard_normal((2 * side - 1, hd)).astype(
            np.float32) * 0.1)
        rpw = jnp.asarray(rng.standard_normal((2 * side - 1, hd)).astype(
            np.float32) * 0.1)
        got = fn(q, k, v, rph, rpw, side, interpret=True)
        want = reference(q, k, v, rph, rpw, side)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-2, err_msg=fn.__name__)
        corr = np.corrcoef(np.asarray(got).ravel(),
                           np.asarray(want).ravel())[0, 1]
        assert corr > 0.9999, fn.__name__


def test_sam_flash_v4_parity_interpret():
    from flmm_tpu.ops.sam_flash_experiments import (
        sam_global_attention_v4, sam_window_attention_v4,
    )

    rng = np.random.default_rng(5)
    for fn, side, hd, G in ((sam_global_attention_v4, 16, 32, 2),
                            (sam_window_attention_v4, 7, 16, 3)):
        T = side * side
        q = jnp.asarray(rng.standard_normal((G, T, hd)).astype(np.float32)
                        * 0.3, jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((G, T, hd)).astype(np.float32)
                        * 0.3, jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((G, T, hd)).astype(np.float32)
                        * 0.3, jnp.bfloat16)
        rph = jnp.asarray(rng.standard_normal((2 * side - 1, hd)).astype(
            np.float32) * 0.1, jnp.bfloat16)
        rpw = jnp.asarray(rng.standard_normal((2 * side - 1, hd)).astype(
            np.float32) * 0.1, jnp.bfloat16)
        got = fn(q, k, v, rph, rpw, side, interpret=True).astype(jnp.float32)
        want = reference(q.astype(jnp.float32), k.astype(jnp.float32),
                         v.astype(jnp.float32), rph.astype(jnp.float32),
                         rpw.astype(jnp.float32), side)
        # bf16 score tensor: coarser than v1-v3 but bounded
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=4e-2, err_msg=fn.__name__)
        corr = np.corrcoef(np.asarray(got).ravel(),
                           np.asarray(want).ravel())[0, 1]
        assert corr > 0.999, fn.__name__


def test_sam_flash_v5_window_parity_interpret():
    from flmm_tpu.ops.sam_flash_experiments import sam_window_attention_v5

    rng = np.random.default_rng(6)
    side, hd, G = 7, 16, 4
    T = side * side
    q = jnp.asarray(rng.standard_normal((G, T, hd)).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.standard_normal((G, T, hd)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.standard_normal((G, T, hd)).astype(np.float32) * 0.3)
    rph = jnp.asarray(rng.standard_normal((2 * side - 1, hd)).astype(
        np.float32) * 0.1)
    rpw = jnp.asarray(rng.standard_normal((2 * side - 1, hd)).astype(
        np.float32) * 0.1)
    got = sam_window_attention_v5(q, k, v, rph, rpw, side, interpret=True,
                                  group=2)
    want = reference(q, k, v, rph, rpw, side)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2)


def test_plain_flash_attention_parity_interpret():
    from flmm_tpu.ops.sam_flash import plain_flash_attention

    rng = np.random.default_rng(7)
    G, S, hd = 3, 75, 32  # odd S exercises the key-pad masking
    q = jnp.asarray(rng.standard_normal((G, S, hd)).astype(np.float32) * 0.4)
    k = jnp.asarray(rng.standard_normal((G, S, hd)).astype(np.float32) * 0.4)
    v = jnp.asarray(rng.standard_normal((G, S, hd)).astype(np.float32) * 0.4)
    got = plain_flash_attention(q, k, v, interpret=True, block_q=64)
    scale = 1.0 / np.sqrt(hd)
    logits = jnp.einsum("gqd,gkd->gqk", q * scale, k)
    want = jnp.einsum(
        "gqk,gkd->gqd",
        jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype),
        v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-3)


def test_sam_flash_v6_parity_interpret():
    from flmm_tpu.ops.sam_flash_experiments import (
        sam_global_attention_v6, sam_window_attention_v6,
    )

    rng = np.random.default_rng(8)
    for fn, side, hd, G, kw in (
            (sam_global_attention_v6, 16, 32, 2,
             {"block_q": 64, "chunks": 4}),
            (sam_window_attention_v6, 7, 16, 3, {})):
        T = side * side
        q = jnp.asarray(rng.standard_normal((G, T, hd)).astype(np.float32)
                        * 0.3)
        k = jnp.asarray(rng.standard_normal((G, T, hd)).astype(np.float32)
                        * 0.3)
        v = jnp.asarray(rng.standard_normal((G, T, hd)).astype(np.float32)
                        * 0.3)
        rph = jnp.asarray(rng.standard_normal((2 * side - 1, hd)).astype(
            np.float32) * 0.1)
        rpw = jnp.asarray(rng.standard_normal((2 * side - 1, hd)).astype(
            np.float32) * 0.1)
        got = fn(q, k, v, rph, rpw, side, interpret=True, **kw)
        want = reference(q, k, v, rph, rpw, side)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-2, err_msg=fn.__name__)


def test_sam_flash_v7v8v9_parity_interpret():
    """v7/v8/v9 window + v7/v8 global: the augmented-K single-matmul and
    base-2-softmax variants match the einsum reference (tighter than
    v1-v6: the bias rides in the score matmul without a bf16 round-trip,
    f32 inputs stay f32)."""
    from flmm_tpu.ops.sam_flash import (
        sam_global_attention_v8, sam_window_attention_v9,
    )
    from flmm_tpu.ops.sam_flash_experiments import (
        sam_global_attention_v7, sam_window_attention_v7,
        sam_window_attention_v8,
    )

    rng = np.random.default_rng(9)
    for fn, side, hd, G, kw in (
            (sam_global_attention_v7, 16, 32, 2, {"block_q": 64}),
            (sam_global_attention_v8, 16, 32, 2,
             {"block_q": 64, "chunks": 4}),
            (sam_window_attention_v7, 7, 16, 3, {}),
            (sam_window_attention_v8, 7, 16, 3, {}),
            (sam_window_attention_v9, 7, 16, 3, {}),
            (sam_window_attention_v9, 14, 64, 25, {"group": 25})):
        T = side * side
        q = jnp.asarray(rng.standard_normal((G, T, hd)).astype(np.float32)
                        * 0.3)
        k = jnp.asarray(rng.standard_normal((G, T, hd)).astype(np.float32)
                        * 0.3)
        v = jnp.asarray(rng.standard_normal((G, T, hd)).astype(np.float32)
                        * 0.3)
        rph = jnp.asarray(rng.standard_normal((2 * side - 1, hd)).astype(
            np.float32) * 0.1)
        rpw = jnp.asarray(rng.standard_normal((2 * side - 1, hd)).astype(
            np.float32) * 0.1)
        got = fn(q, k, v, rph, rpw, side, interpret=True, **kw)
        want = reference(q, k, v, rph, rpw, side)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, err_msg=fn.__name__)


def test_sam_flash_v10_spatial_parity_interpret():
    """v10: spatial head-major qkv, BlockSpec window partition, ragged
    edge masking -- matches the einsum reference on the valid region."""
    from flmm_tpu.ops.sam_flash_experiments import (
        qkv_head_major_perm, sam_window_attention_v10,
    )

    rng = np.random.default_rng(11)
    side, hd, nh, grid_hw = 7, 16, 4, 12  # pads 12 -> 14, ragged edges
    C = nh * hd
    B = 2
    Hp = ((grid_hw + side - 1) // side) * side
    qkv_std = jnp.asarray(
        rng.standard_normal((B, Hp, Hp, 3 * C)).astype(np.float32)) * 0.3
    valid2d = (np.arange(Hp)[:, None] < grid_hw) & \
        (np.arange(Hp)[None, :] < grid_hw)
    qkv_std = qkv_std * jnp.asarray(valid2d[None, :, :, None], jnp.float32)
    rph = jnp.asarray(
        rng.standard_normal((2 * side - 1, hd)).astype(np.float32)) * 0.1
    rpw = jnp.asarray(
        rng.standard_normal((2 * side - 1, hd)).astype(np.float32)) * 0.1
    perm = qkv_head_major_perm(nh, hd)
    got = sam_window_attention_v10(
        qkv_std[..., perm], rph, rpw, side, grid_hw, interpret=True,
        head_group=2)

    # reference: window partition + per-head einsum with edge masking
    nw = Hp // side
    T = side * side
    qkvw = qkv_std.reshape(B, nw, side, nw, side, 3 * C).transpose(
        0, 1, 3, 2, 4, 5).reshape(-1, T, 3 * C)
    q, k, v = jnp.split(qkvw, 3, axis=-1)

    def heads(t):
        G = t.shape[0]
        return t.reshape(G, T, nh, hd).transpose(0, 2, 1, 3).reshape(
            G * nh, T, hd)

    qh, kh, vh = heads(q), heads(k), heads(v)
    want = reference(qh, kh, vh, rph, rpw, side)
    # masked-key reference
    wins = []
    for _ in range(B):
        for wy in range(nw):
            for wx in range(nw):
                rr = np.arange(T) // side + wy * side
                cc = np.arange(T) % side + wx * side
                wins.append((rr < grid_hw) & (cc < grid_hw))
    # recompute with masking (reference() has no mask): do it manually
    Gh = qh.shape[0]
    coords = jnp.arange(side)[:, None] - jnp.arange(side)[None, :] + side - 1
    rh = rph[coords]
    rw = rpw[coords]
    qg = qh.reshape(Gh, side, side, hd)
    bh = jnp.einsum("gyxd,ykd->gyxk", qg, rh)
    bw = jnp.einsum("gyxd,xkd->gyxk", qg, rw)
    s = jnp.einsum("gqd,gkd->gqk", qh, kh) / np.sqrt(hd)
    s = s.reshape(Gh, side, side, side, side) \
        + bh[:, :, :, :, None] + bw[:, :, :, None, :]
    s = s.reshape(Gh, T, T)
    wmask = np.repeat(np.stack(wins), nh, axis=0)
    s = jnp.where(jnp.asarray(wmask)[:, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("gqk,gkd->gqd", p, vh)
    ref = ref.reshape(-1, nh, T, hd).transpose(0, 2, 1, 3).reshape(-1, T, C)
    ref = ref.reshape(B, nw, nw, side, side, C).transpose(
        0, 1, 3, 2, 4, 5).reshape(B, Hp, Hp, C)
    d = jnp.where(jnp.asarray(valid2d[None, :, :, None]), got - ref, 0.0)
    assert float(jnp.max(jnp.abs(d))) < 2e-4


def test_sam_flash_v8_padded_s_parity_interpret():
    """v8 handles token counts that are not 128-multiples by lane-padding
    + in-kernel key masking (reduced-resolution SAM grids, e.g. 28^2)."""
    from flmm_tpu.ops.sam_flash import sam_global_attention_v8

    rng = np.random.default_rng(12)
    side, hd, G = 6, 16, 3  # S = 36 -> padded to 128
    S = side * side
    q, k, v = (jnp.asarray(rng.standard_normal((G, S, hd)).astype(
        np.float32)) * 0.3 for _ in range(3))
    rph = jnp.asarray(
        rng.standard_normal((2 * side - 1, hd)).astype(np.float32)) * 0.1
    rpw = jnp.asarray(
        rng.standard_normal((2 * side - 1, hd)).astype(np.float32)) * 0.1
    got = sam_global_attention_v8(q, k, v, rph, rpw, side, interpret=True,
                                  block_q=64, chunks=2)
    want = reference(q, k, v, rph, rpw, side)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_sam_flash_v11_no_max_parity_interpret():
    """v11 (no-max base-2 softmax global): mathematically identical to v8
    whenever no score overflows f32 exp2 (|logit| < ~88 nats); pinned
    against the einsum reference at both the aligned and the lane-padded
    (SAM-448-style) grid."""
    from flmm_tpu.ops.sam_flash_experiments import sam_global_attention_v11

    rng = np.random.default_rng(11)
    for side in (16, 14):  # 256 tokens (aligned) and 196 (lane-padded)
        G, hd = 2, 32
        T = side * side
        q = jnp.asarray(rng.standard_normal((G, T, hd)).astype(np.float32)
                        * 0.3)
        k = jnp.asarray(rng.standard_normal((G, T, hd)).astype(np.float32)
                        * 0.3)
        v = jnp.asarray(rng.standard_normal((G, T, hd)).astype(np.float32)
                        * 0.3)
        rph = jnp.asarray(rng.standard_normal((2 * side - 1, hd)).astype(
            np.float32) * 0.1)
        rpw = jnp.asarray(rng.standard_normal((2 * side - 1, hd)).astype(
            np.float32) * 0.1)
        got = sam_global_attention_v11(q, k, v, rph, rpw, side,
                                       interpret=True, block_q=64, chunks=4)
        want = reference(q, k, v, rph, rpw, side)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, err_msg=f"v11 side={side}")
