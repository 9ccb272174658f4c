"""Palette transform tests (reference analog: palette parts of
modular_test.cc)."""

import numpy as np

from libjxl_tpu.api.codestream import decode, encode_lossless


def test_palette_roundtrip_16_colors():
    rng = np.random.default_rng(21)
    pal = rng.integers(0, 256, (16, 3))
    idx = rng.integers(0, 16, (48, 40))
    img = pal[idx].astype(np.uint8)
    data = encode_lossless(img)
    out, _ = decode(data)
    np.testing.assert_array_equal(out, img)


def test_palette_beats_rct_for_flat_art():
    # 4-color cartoon-like image
    yy, xx = np.mgrid[0:64, 0:64]
    idx = ((xx // 16) + (yy // 16)) % 4
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0]])
    img = pal[idx].astype(np.uint8)
    from libjxl_tpu.api.frame import ModularEncOptions
    data = encode_lossless(img)
    assert len(data) < 300
    out, _ = decode(data)
    np.testing.assert_array_equal(out, img)


def test_palette_grayscale():
    rng = np.random.default_rng(22)
    pal = rng.integers(0, 256, (8,))
    idx = rng.integers(0, 8, (30, 30))
    img = pal[idx].astype(np.uint8)[:, :, None]
    data = encode_lossless(img)
    out, _ = decode(data)
    np.testing.assert_array_equal(out.reshape(img.shape), img)
