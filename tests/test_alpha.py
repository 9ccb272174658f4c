"""Alpha / extra-channel tests.

Lossless (modular) alpha existed before; these cover the VarDCT path:
alpha coded as a lossless modular sub-stream of a lossy frame
(reference: enc_modular.cc do_color=false; dec_modular.cc:301-410).
"""

import numpy as np
import pytest

from libjxl_tpu.api.codestream import decode, encode_lossless, encode_lossy


def smooth_rgba(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 4))
    for i in range(4):
        img[:, :, i] = 128 + 80 * np.sin(xx / 17 + i) * np.cos(yy / 23 - i)
    img += rng.normal(0, 3, (h, w, 4))
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("shape", [(64, 64), (300, 200), (520, 300)])
def test_vardct_alpha_roundtrip(shape):
    img = smooth_rgba(*shape, seed=shape[0])
    data = encode_lossy(img, distance=1.0)
    out, meta = decode(data)
    assert out.shape == img.shape
    assert len(meta.m.extra_channel_info) == 1
    # alpha is coded losslessly
    np.testing.assert_array_equal(out[:, :, 3], img[:, :, 3])
    err = np.abs(out[:, :, :3].astype(float)
                 - img[:, :, :3].astype(float)).mean()
    assert err < 6.0


def test_vardct_alpha_progressive():
    img = smooth_rgba(300, 280)
    data = encode_lossy(img, distance=1.0, progressive=3)
    out, _ = decode(data)
    np.testing.assert_array_equal(out[:, :, 3], img[:, :, 3])


def test_lossless_alpha_roundtrip():
    img = smooth_rgba(96, 80)
    data = encode_lossless(img)
    out, _ = decode(data)
    np.testing.assert_array_equal(out, img)


def test_alpha_blend_patches():
    """RGBA patch sheet alpha-composited over a background
    (kBlendAbove, blending.cc:50-76)."""
    from libjxl_tpu.api.codestream import encode_with_patches

    h, w = 160, 200
    yy, xx = np.mgrid[0:h, 0:w]
    bg = np.stack([np.clip(100 + xx / 3, 0, 255),
                   np.clip(80 + yy / 2, 0, 255),
                   np.full((h, w), 120)], axis=-1).astype(np.uint8)
    sh, sw = 48, 64
    syy, sxx = np.mgrid[0:sh, 0:sw]
    sheet = np.zeros((sh, sw, 4), np.uint8)
    sheet[:, :, 0] = 230
    sheet[:, :, 1] = 40
    sheet[:, :, 2] = 40
    r2 = ((syy - sh / 2) ** 2 / (sh / 2) ** 2
          + (sxx - sw / 2) ** 2 / (sw / 2) ** 2)
    sheet[:, :, 3] = np.clip(255 * (1.0 - r2), 0, 255).astype(np.uint8)

    placements = [(0, 0, sw, sh, [(20, 30), (120, 90)])]
    data = encode_with_patches(bg, sheet, placements, distance=1.0)
    out, _ = decode(data)
    assert out.shape == (h, w, 4)
    # opaque center shows the sheet color, transparent corner the bg
    cy, cx = 30 + sh // 2, 20 + sw // 2
    assert abs(int(out[cy, cx, 0]) - 230) < 15
    assert int(out[cy, cx, 1]) < 70
    assert np.abs(out[31, 21, :3].astype(int) - bg[31, 21].astype(int)).max() < 8


def test_alpha_with_resampling_decodes():
    """Extra channels go through the upsample stage at decode
    (stage_upsampling.cc runs for ECs too); with --already_downsampled
    the EC planes signal the same factor. Regression: this used to
    crash concatenating mismatched shapes."""
    import numpy as np

    from libjxl_tpu.api import codestream

    rng = np.random.default_rng(5)
    img = np.clip(128 + rng.normal(0, 5, (128, 128, 4)), 0,
                  255).astype(np.uint8)
    s = codestream.encode_lossy(img, distance=1.0, effort=3,
                                device=False, resampling=2)
    d, _ = codestream.decode(s, device=False)
    assert d.shape == (128, 128, 4)
    assert np.abs(d[:, :, 3].astype(int)
                  - img[:, :, 3].astype(int)).mean() < 8
    low = np.clip(128 + rng.normal(0, 5, (64, 64, 4)), 0,
                  255).astype(np.uint8)
    s2 = codestream.encode_lossy(low, distance=1.0, effort=3,
                                 device=False, resampling=2,
                                 already_downsampled=True)
    d2, _ = codestream.decode(s2, device=False)
    assert d2.shape == (128, 128, 4)


def test_forced_modular_predictor_respected_at_high_effort():
    import numpy as np

    from libjxl_tpu.api import codestream

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    a = codestream.encode_lossless(img, effort=7, predictor=5)
    b = codestream.encode_lossless(img, effort=7)
    assert a != b  # the forced predictor changes the stream
    da, _ = codestream.decode(a, device=False)
    assert np.array_equal(da[:, :, :3], img)
