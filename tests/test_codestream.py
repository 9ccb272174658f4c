"""End-to-end lossless codestream roundtrips (reference analog: parts of
jxl_test.cc Roundtrip* and roundtrip_test.cc)."""

import numpy as np
import pytest

from libjxl_tpu.api.codestream import decode, encode_lossless

RNG = np.random.default_rng(1234)


@pytest.mark.parametrize("shape", [(8, 8, 3), (33, 41, 3), (64, 64, 1)])
def test_lossless_roundtrip_noise(shape):
    img = RNG.integers(0, 256, shape).astype(np.uint8)
    data = encode_lossless(img)
    out, meta = decode(data)
    np.testing.assert_array_equal(out.reshape(img.shape), img)
    assert meta.xsize() == shape[1] and meta.ysize() == shape[0]


def test_lossless_roundtrip_gradient_compresses():
    yy, xx = np.mgrid[0:128, 0:96]
    img = np.stack([(xx + yy) % 256, (2 * xx) % 256, (yy) % 256],
                   axis=-1).astype(np.uint8)
    data = encode_lossless(img)
    assert len(data) < img.size // 2  # smooth content must compress
    out, _ = decode(data)
    np.testing.assert_array_equal(out, img)


def test_lossless_roundtrip_16bit():
    img = RNG.integers(0, 65536, (24, 17, 3)).astype(np.uint16)
    data = encode_lossless(img, bits_per_sample=16)
    out, meta = decode(data)
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, img)


def test_lossless_roundtrip_multigroup():
    # group_size_shift=0 -> 128px groups; 300x200 -> 3x2=6 AC groups
    yy, xx = np.mgrid[0:200, 0:300]
    img = np.stack([(xx // 2 + yy) % 256, (xx ^ yy) % 256,
                    RNG.integers(0, 4, (200, 300))], axis=-1).astype(np.uint8)
    data = encode_lossless(img, group_size_shift=0)
    out, _ = decode(data)
    np.testing.assert_array_equal(out, img)


def test_lossless_roundtrip_with_alpha():
    img = RNG.integers(0, 256, (20, 20, 4)).astype(np.uint8)
    data = encode_lossless(img)
    out, meta = decode(data)
    assert meta.m.has_alpha()
    np.testing.assert_array_equal(out, img)
