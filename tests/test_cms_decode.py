"""Decoder-side CMS stage (stage_cms.cc analog): decode(...,
color_management=True) returns pixels in the stream's embedded ICC
profile space."""

import numpy as np
import pytest

from libjxl_tpu.api import codestream
from libjxl_tpu.extras import cms


def _image(h=96, w=112, seed=11):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([90 + 90 * np.sin(xx * 0.05),
                    110 + 70 * np.cos(yy * 0.06),
                    130 + 50 * np.sin((xx + yy) * 0.03)], -1)
    return np.clip(img + rng.normal(0, 3, img.shape), 5, 250).astype(
        np.uint8)


@pytest.mark.skipif(not cms.available(), reason="lcms2 unavailable")
def test_cms_roundtrip_through_wide_gamut_profile():
    # Display-P3-ish primaries: pixels are IN this profile's space
    icc = cms.make_rgb_profile(((0.680, 0.320), (0.265, 0.690),
                                (0.150, 0.060)))
    img = _image()
    stream = codestream.encode_lossy(img, distance=1.0, effort=3,
                                     icc=icc, device=False)
    info = {}
    out, meta = codestream.decode(stream, color_management=True,
                                  decode_info=info, device=False)
    assert info.get("cms") == "applied"
    # encode converted profile->linear-sRGB; decode converted back, so
    # the output approximates the original profile-space pixels
    # d1 lossy + two lcms conversions through a wide-gamut 2.2-gamma
    # profile: u8 quantization at both ends widens the band
    err = np.abs(out.astype(np.float64) - img.astype(np.float64)).mean()
    assert err < 8.0, err
    # with the CMS stage disabled the pixels come back as sRGB
    plain, _ = codestream.decode(stream, device=False,
                                 color_management=False)
    derr = np.abs(plain.astype(np.float64)
                  - out.astype(np.float64)).mean()
    assert derr > 1.0, derr


@pytest.mark.skipif(not cms.available(), reason="lcms2 unavailable")
def test_cms_requested_without_profile_is_noop():
    img = _image(64, 64)
    stream = codestream.encode_lossy(img, distance=1.0, effort=3,
                                     device=False)
    out, _ = codestream.decode(stream, color_management=True,
                               device=False)
    plain, _ = codestream.decode(stream, device=False)
    assert np.array_equal(out, plain)


def test_gray_profile_roundtrip():
    """GRAY ICC input expands to linear sRGB on encode; the decoder CMS
    stage converts back into the gray profile's space."""
    from libjxl_tpu.extras import cms

    if not cms.available():
        pytest.skip("no lcms2")
    icc = cms.make_gray_profile(gamma=2.2)
    assert cms.profile_is_gray(icc)
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:96, 0:112]
    gray = np.clip(110 + 60 * np.sin(xx / 13) * np.cos(yy / 9)
                   + rng.normal(0, 4, (96, 112)), 0,
                   255).astype(np.uint8)
    img = np.repeat(gray[:, :, None], 3, axis=2)
    stream = codestream.encode_lossy(img, distance=1.0, effort=3,
                                     icc=icc, device=False)
    info = {}
    dec, meta = codestream.decode(stream, decode_info=info,
                                  device=False)
    assert meta.m.color_encoding.want_icc
    assert info.get("cms") == "applied-gray"
    err = np.abs(dec[:, :, 0].astype(float) - gray.astype(float)).mean()
    assert err < 4.0, err
    # all three output channels carry the replicated gray rendering
    assert np.array_equal(dec[:, :, 0], dec[:, :, 1])
