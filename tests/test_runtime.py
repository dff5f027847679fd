"""Native runtime kernels vs their numpy/PIL fallbacks and torch oracles."""

import numpy as np
import pytest

from flmm_tpu import runtime


@pytest.fixture(scope="module", autouse=True)
def native_lib():
    lib = runtime.lib()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def test_rgb2id_native_matches_numpy():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (37, 53, 3), np.uint8)
    c = rgb.astype(np.uint32)
    want = (c[..., 0] + 256 * c[..., 1] + 65536 * c[..., 2]).astype(np.int32)
    np.testing.assert_array_equal(runtime.rgb2id(rgb), want)


def test_segment_union():
    ids = np.array([[1, 2], [3, 2]], np.int32)
    got = runtime.segment_union(ids, [2, 3])
    np.testing.assert_array_equal(got, [[0, 1], [1, 1]])


def test_rle_decode_matches_python():
    h, w = 5, 7
    counts = [3, 4, 10, 2, 16]
    flat = np.zeros(h * w, np.uint8)
    pos, val = 0, 0
    for c in counts:
        if val:
            flat[pos:pos + c] = 1
        pos += c
        val ^= 1
    want = flat.reshape(w, h).T
    np.testing.assert_array_equal(runtime.rle_decode(counts, h, w), want)


def test_polygon_fill_close_to_pil():
    from PIL import Image, ImageDraw

    poly = [2.0, 2.0, 18.0, 2.0, 18.0, 14.0, 2.0, 14.0]
    got = runtime.polygons_fill([poly], 20, 24)
    img = Image.new("L", (24, 20), 0)
    ImageDraw.Draw(img).polygon(
        [(poly[i], poly[i + 1]) for i in range(0, len(poly), 2)],
        outline=1, fill=1)
    want = np.asarray(img, np.uint8)
    # conventions differ by <= 1px on the boundary
    diff = np.abs(got.astype(int) - want.astype(int))
    interior = want.copy()
    interior[:, :] = 0
    interior[4:13, 4:17] = 1
    assert (got[interior == 1] == 1).all()
    assert diff.sum() <= (want.sum() - interior.sum())


def test_nearest_resize_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    m = (rng.random((33, 47)) > 0.5).astype(np.uint8)
    want = F.interpolate(torch.from_numpy(m[None, None].astype(np.float32)),
                         size=(64, 64)).numpy()[0, 0].astype(np.uint8)
    np.testing.assert_array_equal(runtime.nearest_resize(m, 64, 64), want)
