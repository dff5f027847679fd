"""Parity tests for core ops against PyTorch (CPU) semantics."""

import numpy as np
import pytest
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from flmm_tpu.ops import resize as R
from flmm_tpu.ops import losses as L
from flmm_tpu.ops import masks as M


def rand(*shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


class TestResize:
    @pytest.mark.parametrize("inshape,out", [((24, 24), (64, 64)),
                                             ((48, 72), (64, 64)),
                                             ((7, 9), (3, 5))])
    def test_nearest_matches_torch(self, inshape, out):
        x = rand(2, 3, *inshape, seed=1)
        want = F.interpolate(torch.from_numpy(x), size=out).numpy()
        got = np.asarray(R.resize_nearest_torch(jnp.asarray(x), out))
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("inshape,out", [((24, 24), (64, 64)),
                                             ((64, 64), (256, 256)),
                                             ((17, 31), (8, 8))])
    def test_bilinear_matches_torch(self, inshape, out):
        x = rand(2, 3, *inshape, seed=2)
        want = F.interpolate(torch.from_numpy(x), size=out, mode="bilinear",
                             align_corners=False).numpy()
        got = np.asarray(R.resize_bilinear(jnp.asarray(x), out))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_bicubic_close_to_torch(self):
        x = rand(1, 2, 10, 14, seed=3)
        want = F.interpolate(torch.from_numpy(x), size=(25, 25),
                             mode="bicubic", align_corners=False).numpy()
        got = np.asarray(R.resize_bicubic(jnp.asarray(x), (25, 25)))
        # torch bicubic uses a=-0.75 Keys kernel; jax uses the same family.
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_affine_grid_sample_equals_crop_resize(self):
        # Crop [y0:y0+ch, x0:x0+cw] then bilinear-resize == one grid sample.
        x = rand(33, 47, seed=4)
        y0, x0, ch, cw = 5, 7, 16, 24
        out = (40, 50)
        want = F.interpolate(
            torch.from_numpy(x[None, None, y0:y0 + ch, x0:x0 + cw]),
            size=out, mode="bilinear", align_corners=False)[0, 0].numpy()
        scale = jnp.array([ch / out[0], cw / out[1]])
        offset = jnp.array([float(y0), float(x0)])
        got = np.asarray(R.affine_grid_sample(
            jnp.asarray(x), scale, offset, out,
            src_lo=jnp.array([y0, x0]),
            src_hi=jnp.array([y0 + ch - 1, x0 + cw - 1]),
            mode="clamp"))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_affine_grid_sample_equals_pad_resize(self):
        # Pad right/bottom with fill then resize == grid sample in fill mode.
        x = rand(16, 24, seed=13)
        fill = -3.0
        padded = np.full((32, 32), fill, np.float32)
        padded[:16, :24] = x
        out = (256, 256)
        want = F.interpolate(torch.from_numpy(padded[None, None]), size=out,
                             mode="bilinear", align_corners=False)[0, 0].numpy()
        scale = jnp.array([32 / out[0], 32 / out[1]])
        got = np.asarray(R.affine_grid_sample(
            jnp.asarray(x), scale, jnp.zeros(2), out, fill=fill,
            canvas_hi=jnp.array([31.0, 31.0])))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_affine_grid_sample_fill(self):
        x = jnp.ones((4, 4))
        # sample a region fully outside the source
        out = R.affine_grid_sample(x, jnp.array([1.0, 1.0]),
                                   jnp.array([100.0, 100.0]), (4, 4),
                                   fill=-5.0)
        np.testing.assert_allclose(np.asarray(out), -5.0)


class TestLosses:
    def test_bce_matches_torch(self):
        lg, tg = rand(4, 8, 8, seed=5), (rand(4, 8, 8, seed=6) > 0).astype(np.float32)
        want = F.binary_cross_entropy_with_logits(
            torch.from_numpy(lg), torch.from_numpy(tg)).item()
        got = float(L.sigmoid_bce(jnp.asarray(lg), jnp.asarray(tg)))
        assert abs(got - want) < 1e-6

    def test_bce_weighted_ignores_masked_pixels(self):
        lg, tg = rand(2, 6, 6, seed=7), (rand(2, 6, 6, seed=8) > 0).astype(np.float32)
        w = np.zeros((2, 6, 6), np.float32)
        w[:, :3] = 1.0
        want = F.binary_cross_entropy_with_logits(
            torch.from_numpy(lg[:, :3]), torch.from_numpy(tg[:, :3])).item()
        got = float(L.sigmoid_bce(jnp.asarray(lg), jnp.asarray(tg), jnp.asarray(w)))
        assert abs(got - want) < 1e-6

    def test_naive_dice_matches_mmdet_formula(self):
        lg = rand(3, 10, seed=9)
        tg = (rand(3, 10, seed=10) > 0).astype(np.float32)
        p = torch.sigmoid(torch.from_numpy(lg))
        t = torch.from_numpy(tg)
        num = 2 * (p * t).sum(-1)
        den = p.sum(-1) + t.sum(-1)
        want = (1 - (num + 1.0) / (den + 1.0)).mean().item()
        got = float(L.naive_dice(jnp.asarray(lg), jnp.asarray(tg)))
        assert abs(got - want) < 1e-6

    def test_mask_iou(self):
        a = np.array([[1, 1, 0, 0]], np.float32)
        b = np.array([[1, 0, 1, 0]], np.float32)
        got = float(L.mask_iou(jnp.asarray(a), jnp.asarray(b))[0])
        assert abs(got - 1 / 3) < 1e-6


class TestMerge:
    def test_mean_merge_matches_loop(self):
        rng = np.random.default_rng(11)
        attn = rng.standard_normal((2, 3, 7, 5)).astype(np.float32)  # L,H,S,N
        mask_ids = np.array([-1, 0, 0, 1, -1, 1, 1])
        got = np.asarray(M.merge_attention(jnp.asarray(attn),
                                           jnp.asarray(mask_ids), 2, "mean"))
        for m in range(2):
            sel = attn[:, :, mask_ids == m].mean(axis=2)
            np.testing.assert_allclose(got[:, :, m], sel, atol=1e-6)

    def test_max_merge_matches_loop(self):
        rng = np.random.default_rng(12)
        attn = rng.standard_normal((4, 6, 3)).astype(np.float32)  # H,S,N
        mask_ids = np.array([0, 1, 0, -1, 1, 1])
        got = np.asarray(M.merge_attention(jnp.asarray(attn),
                                           jnp.asarray(mask_ids), 3, "max"))
        for m in range(2):
            sel = attn[:, mask_ids == m].max(axis=1)
            np.testing.assert_allclose(got[:, m], sel, atol=1e-6)
        # mask 2 has no tokens -> zeros, not -inf
        np.testing.assert_allclose(got[:, 2], 0.0)

    def test_mask_to_box(self):
        m = np.zeros((10, 12), bool)
        m[2:5, 3:9] = True
        box = np.asarray(M.mask_to_box(jnp.asarray(m)))
        np.testing.assert_array_equal(box, [3, 2, 9, 5])

    def test_mask_to_box_empty(self):
        m = np.zeros((10, 12), bool)
        box = np.asarray(M.mask_to_box(jnp.asarray(m)))
        np.testing.assert_array_equal(box, [0, 0, 12, 10])
