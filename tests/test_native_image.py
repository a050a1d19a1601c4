"""Native image kernels (ops/native/imageproc.cc) vs PIL/numpy oracles.

The native resize must be bit-compatible with PIL (the reference's
pipelines are PIL/torchvision — SURVEY.md §2.7), so swapping it into
the loader can never change training/eval numerics."""

import numpy as np
import pytest
from PIL import Image

from visionllm_tpu.data.native_image import (have_native, normalize_pad,
                                             resize_u8)

pytestmark = pytest.mark.skipif(not have_native(),
                                reason="no C++ toolchain")

_PIL = {"bilinear": Image.BILINEAR, "bicubic": Image.BICUBIC,
        "nearest": Image.NEAREST}


@pytest.mark.parametrize("method", ["bilinear", "bicubic", "nearest"])
@pytest.mark.parametrize("shape,out", [
    ((480, 640), (336, 336)),      # down, aspect change
    ((100, 80), (333, 217)),       # up, odd sizes
    ((4, 10), (10, 4)),            # tiny, axis swap
    ((37, 53), (37, 53)),          # identity
])
def test_resize_matches_pil(method, shape, out):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (*shape, 3), np.uint8)
    want = np.asarray(Image.fromarray(img).resize(out[::-1], _PIL[method]))
    got = resize_u8(img, out, method)
    assert got.shape == want.shape
    np.testing.assert_array_compare(
        lambda a, b: np.abs(a.astype(int) - b.astype(int)) <= 1, got, want)


def test_resize_grayscale():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (50, 60), np.uint8)
    want = np.asarray(Image.fromarray(img).resize((30, 25),
                                                  Image.BILINEAR))
    got = resize_u8(img, (25, 30), "bilinear")
    assert got.ndim == 2
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_normalize_pad_matches_numpy():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (33, 47, 3), np.uint8)
    mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
    got = normalize_pad(img, mean, std, (40, 56))
    ref = np.zeros((40, 56, 3), np.float32)
    ref[:33, :47] = (img.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(got, ref, atol=3e-7)


def test_normalize_pad_custom_fill():
    img = np.zeros((2, 2, 3), np.uint8)
    mean = np.zeros(3, np.float32)
    std = np.ones(3, np.float32)
    fill = np.array([1.5, -2.0, 0.25], np.float32)
    got = normalize_pad(img, mean, std, (4, 4), pad_val=fill)
    np.testing.assert_allclose(got[3, 3], fill)
    np.testing.assert_allclose(got[0, 0], [0, 0, 0])


def test_resize_rejects_bad_input():
    assert resize_u8(np.zeros((0, 4, 3), np.uint8), (4, 4)) is None
