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


def test_float_pixel_output():
    """pixel_format="float32"/"float16": the JXL_TYPE_FLOAT output legs
    (types.h:46,57) — sRGB-transfer floats in [0, 1], consistent with
    the u8 output to within one quantization step."""
    import numpy as np

    from libjxl_tpu.api import codestream

    rng = np.random.default_rng(3)
    base = 128 + 40 * np.sin(np.arange(96)[:, None] * 0.05) \
        + rng.normal(0, 6, (96, 80))
    img = np.clip(np.stack([base, base * 0.9 + 8, base * 1.1 - 9], -1),
                  0, 255).astype(np.uint8)
    s = codestream.encode_lossy(img, distance=1.0, effort=3,
                                device=False)
    u8, _ = codestream.decode(s, device=False)
    f32, _ = codestream.decode(s, device=False, pixel_format="float32")
    f16, _ = codestream.decode(s, device=False, pixel_format="float16")
    assert f32.dtype == np.float32 and f16.dtype == np.float16
    assert np.abs(u8.astype(int)
                  - np.round(f32 * 255).astype(int)).max() <= 1
    assert np.allclose(f16.astype(np.float32), f32, atol=2e-3)
    # lossless + alpha: floats are exactly sample/maxval
    rgba = np.dstack([img, np.linspace(0, 255, 96 * 80).reshape(
        96, 80).astype(np.uint8)])
    fl, _ = codestream.decode(codestream.encode_lossless(rgba),
                              device=False, pixel_format="float32")
    assert fl.shape == (96, 80, 4)
    assert np.allclose(fl * 255.0, rgba, atol=1e-4)


def test_cmyk_roundtrip():
    """CMYK via the kBlack extra channel (color_encoding_cms.h:40-43):
    stored samples are 1 - ink; encode_cmyk/decode_cmyk roundtrip the
    ink values bit-exactly, and decode(color_management=True)
    composites to RGB."""
    import numpy as np

    from libjxl_tpu.api import codestream
    from libjxl_tpu.io.headers import EC_BLACK

    rng = np.random.default_rng(2)
    cmyk = rng.integers(0, 256, (120, 100, 4), dtype=np.uint8)
    cmyk[:40] = (cmyk[:40] // 32) * 32
    s = codestream.encode_cmyk(cmyk)
    ink, meta = codestream.decode_cmyk(s)
    assert np.array_equal(ink, cmyk)
    assert meta.m.extra_channel_info[0].type == EC_BLACK
    rgb, _ = codestream.decode(s, color_management=True)
    assert rgb.shape == (120, 100, 3) and rgb.dtype == np.uint8
    # pure black ink must composite to black, no ink to white
    flat = codestream.encode_cmyk(
        np.dstack([np.zeros((16, 16, 3), np.uint8),
                   np.full((16, 16), 255, np.uint8)]))
    black, _ = codestream.decode(flat, color_management=True)
    assert black.max() == 0
    white, _ = codestream.decode(
        codestream.encode_cmyk(np.zeros((16, 16, 4), np.uint8)),
        color_management=True)
    assert white.min() == 255


def test_center_first_group_order():
    """--group_order 1: AC group sections stream center-first via the
    TOC permutation (enc_toc.cc); both our decoder and the reference
    (see test_interop) read the permuted TOC transparently."""
    import numpy as np

    from libjxl_tpu.api import codestream

    rng = np.random.default_rng(9)
    base = 128 + 40 * np.sin(np.arange(600)[:, None] * 0.02) \
        + rng.normal(0, 5, (600, 520))
    img = np.clip(np.stack([base, base * 0.9 + 8, base * 1.1 - 9], -1),
                  0, 255).astype(np.uint8)
    s0 = codestream.encode_lossy(img, distance=1.0, effort=3,
                                 device=False)
    s1 = codestream.encode_lossy(img, distance=1.0, effort=3,
                                 device=False, group_order=1)
    assert s1 != s0  # really permuted
    d0, _ = codestream.decode(s0, device=False)
    d1, _ = codestream.decode(s1, device=False)
    assert np.array_equal(d0, d1)
    from libjxl_tpu.extras import oracle

    if oracle.available():
        assert np.array_equal(oracle.decode(s1)[0], oracle.decode(s0)[0])
