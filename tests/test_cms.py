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
    plain = codestream.encode_lossy(img, distance=1.0, effort=3)
    dec_cms, meta = codestream.decode(with_cms)
    dec_plain, _ = codestream.decode(plain)
    # converted streams signal sRGB (reference lossy semantics)
    assert not meta.m.color_encoding.want_icc
    # the CMS-encoded stream must decode to the lcms ground truth, not to
    # the raw (misinterpreted-as-sRGB) pixels
    from libjxl_tpu.ops.xyb import linear_to_srgb

    truth = np.clip(np.round(linear_to_srgb(
        cms.icc_to_linear_srgb(img, icc).astype(np.float64)) * 255), 0,
        255)
    err_cms = np.abs(dec_cms[:, :, :3].astype(float) - truth).mean()
    err_plain = np.abs(dec_plain[:, :, :3].astype(float) - truth).mean()
    assert err_cms < 3.0, err_cms
    assert err_cms < err_plain * 0.5


def test_oracle_agrees_on_cms_stream():
    from libjxl_tpu.extras import oracle

    if not oracle.available():
        pytest.skip("no system libjxl")
    icc = cms.make_rgb_profile(_WIDE, gamma=2.2)
    img = _wide_image()
    stream = codestream.encode_lossy(img, distance=1.0, effort=3, icc=icc)
    ours, _ = codestream.decode(stream)
    theirs, _ = oracle.decode(stream)
    d = np.abs(theirs[:, :, :3].astype(np.int64)
               - ours[:, :, :3].astype(np.int64))
    assert float(np.sqrt((d.astype(float) ** 2).mean())) < 0.7
