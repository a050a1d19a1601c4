"""RLE codec: native C++ ↔ numpy fallback cross-checks and round trips."""

import numpy as np
import pytest

from visionllm_tpu.ops import rle


def _random_mask(rng, h, w):
    m = (rng.random((h, w)) > 0.7).astype(np.uint8)
    return m


def test_roundtrip_native_and_fallback():
    rng = np.random.default_rng(0)
    for h, w in [(7, 5), (32, 48), (100, 73)]:
        m = _random_mask(rng, h, w)
        enc = rle.rle_encode(m)
        dec = rle.rle_decode(enc["counts"], h, w)
        np.testing.assert_array_equal(dec, m)
        assert rle.rle_area(enc) == int(m.sum())


def test_native_matches_fallback():
    rng = np.random.default_rng(1)
    m = _random_mask(rng, 40, 30)
    lib = rle._load_native()
    if lib is None:
        pytest.skip("native lib unavailable")
    enc_native = rle.rle_encode(m)
    # force fallback
    rle._LIB, saved = None, rle._LIB
    try:
        enc_py = rle.rle_encode(m)
        dec_py = rle.rle_decode(enc_native["counts"], 40, 30)
    finally:
        rle._LIB = saved
    assert enc_native["counts"] == enc_py["counts"]
    np.testing.assert_array_equal(dec_py, m)


def test_known_simple_pattern():
    # all-zeros and all-ones edge cases
    z = np.zeros((5, 4), np.uint8)
    o = np.ones((3, 3), np.uint8)
    ez, eo = rle.rle_encode(z), rle.rle_encode(o)
    np.testing.assert_array_equal(rle.rle_decode(ez["counts"], 5, 4), z)
    np.testing.assert_array_equal(rle.rle_decode(eo["counts"], 3, 3), o)
    assert rle.rle_area(ez) == 0 and rle.rle_area(eo) == 9


def test_iou():
    a = np.zeros((10, 10), np.uint8)
    b = np.zeros((10, 10), np.uint8)
    a[:5] = 1          # 50 px
    b[2:7] = 1         # 50 px, overlap rows 2-4 = 30 px
    ious = rle.rle_iou([rle.rle_encode(a)], [rle.rle_encode(b)])
    np.testing.assert_allclose(ious[0, 0], 30 / 70, atol=1e-9)


def test_pycocotools_format_compat():
    """Decode a hand-built COCO counts string: counts [2, 3, 1] on a
    2x3 grid, column-major → mask."""
    s = rle._string_from_counts([2, 3, 1]).decode()
    m = rle.rle_decode(s, 2, 3)
    # column-major: 2 zeros, 3 ones, 1 zero
    want = np.array([[0, 1, 1], [0, 1, 0]], np.uint8)
    np.testing.assert_array_equal(m, want)
