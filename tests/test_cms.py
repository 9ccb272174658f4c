"""CMS layer (extras/cms.py, lcms2 backend): non-sRGB ICC inputs are
converted to linear sRGB before XYB encoding (cms/jxl_cms.cc role)."""

import numpy as np
import pytest

from libjxl_tpu.api import codestream
from libjxl_tpu.extras import cms

pytestmark = pytest.mark.skipif(not cms.available(),
                                reason="no system lcms2")

# Adobe RGB (1998)-like primaries: visibly wider gamut than sRGB
_WIDE = ((0.6400, 0.3300), (0.2100, 0.7100), (0.1500, 0.0600))


def _wide_image(h=64, w=64):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([np.full((h, w), 200), (xx * 255 // w),
                    (yy * 255 // h)], axis=-1).astype(np.uint8)
    return img


def test_roundtrip_through_linear_srgb():
    icc = cms.make_rgb_profile(_WIDE, gamma=2.2)
    img = _wide_image()
    lin = cms.icc_to_linear_srgb(img, icc)
    back = cms.linear_srgb_to_icc(lin, icc)
    orig = img.astype(np.float32) / 255.0
    # in-gamut pixels survive the round trip
    assert np.abs(back - orig).mean() < 0.01


def test_encode_applies_input_profile():
    icc = cms.make_rgb_profile(_WIDE, gamma=2.2)
    img = _wide_image()
    with_cms = codestream.encode_lossy(img, distance=1.0, effort=3, icc=icc)
    # round-3 semantics: the profile is EMBEDDED as the stream's color
    # encoding and the decoder's CMS stage converts back into it
    dec_cms, meta = codestream.decode(with_cms)
    assert meta.m.color_encoding.want_icc
    # full profile->sRGB->XYB->sRGB->profile loop reproduces the input
    err = np.abs(dec_cms[:, :, :3].astype(float)
                 - img.astype(float)).mean()
    assert err < 3.5, err
    # disabling the CMS stage yields the intermediate sRGB rendering,
    # which must track the lcms ground truth
    from libjxl_tpu.ops.xyb import linear_to_srgb

    dec_srgb, _ = codestream.decode(with_cms, color_management=False)
    truth = np.clip(np.round(linear_to_srgb(
        cms.icc_to_linear_srgb(img, icc).astype(np.float64)) * 255), 0,
        255)
    err_srgb = np.abs(dec_srgb[:, :, :3].astype(float) - truth).mean()
    assert err_srgb < 3.0, err_srgb


def test_oracle_agrees_on_cms_stream():
    """The system libjxl (0.7, no CMS attached) returns the XYB-decoded
    LINEAR values for custom-ICC streams; our coded data must agree with
    it in that space (the transfer/profile rendering on top is the CMS
    stage the 0.7 oracle cannot run)."""
    from libjxl_tpu.extras import oracle

    if not oracle.available():
        pytest.skip("no system libjxl")
    from libjxl_tpu.ops.xyb import srgb_to_linear

    icc = cms.make_rgb_profile(_WIDE, gamma=2.2)
    img = _wide_image()
    stream = codestream.encode_lossy(img, distance=1.0, effort=3, icc=icc)
    ours_srgb, _ = codestream.decode(stream, color_management=False)
    ours_linear = np.clip(np.round(srgb_to_linear(
        ours_srgb[:, :, :3].astype(np.float64) / 255.0) * 255.0), 0, 255)
    theirs, _ = oracle.decode(stream)
    d = theirs[:, :, :3].astype(np.float64) - ours_linear
    assert float(np.sqrt((d ** 2).mean())) < 1.5
