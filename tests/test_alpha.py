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
