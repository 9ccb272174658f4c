"""Non-XYB VarDCT frames: YCbCr (BT.601 full-range, stage_ycbcr.cc) and
raw-RGB (kNone) color transforms."""

import numpy as np
import pytest

from libjxl_tpu.api.codestream import (
    CodecMetadata,
    SizeHeader,
    decode,
    write_codestream_header,
)
from libjxl_tpu.io.bits import BitWriter
from libjxl_tpu.io.frame_header import (
    CT_NONE,
    CT_YCBCR,
    ENC_VARDCT,
    FLAG_SKIP_ADAPTIVE_DC_SMOOTHING,
    FT_REGULAR,
    FrameHeader,
)
from libjxl_tpu.vardct.frame import (
    encode_vardct_frame,
    rgb_to_ycbcr,
    ycbcr_to_rgb,
)


def smooth(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 3))
    for i in range(3):
        img[:, :, i] = 128 + 80 * np.sin(xx / 17 + i) * np.cos(yy / 23 - i)
    img += rng.normal(0, 3, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def test_ycbcr_conversion_inverse():
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0, 1, (3, 16, 16))
    np.testing.assert_allclose(ycbcr_to_rgb(rgb_to_ycbcr(rgb)), rgb,
                               atol=1e-12)


@pytest.mark.parametrize("ct", [CT_YCBCR, CT_NONE])
def test_non_xyb_vardct_roundtrip(ct):
    img = smooth(120, 150)
    meta = CodecMetadata()
    meta.size = SizeHeader().set(150, 120)
    meta.m.all_default = False
    meta.m.xyb_encoded = False
    w = BitWriter()
    write_codestream_header(w, meta)
    fh = FrameHeader(meta)
    fh.all_default = False
    fh.frame_type = FT_REGULAR
    fh.encoding = ENC_VARDCT
    fh.color_transform = ct
    fh.flags = FLAG_SKIP_ADAPTIVE_DC_SMOOTHING
    fh.loop_filter.all_default = False
    fh.loop_filter.gab = False
    fh.loop_filter.epf_iters = 0
    rgb = np.moveaxis(img.astype(np.float64) / 255.0, -1, 0)
    encode_vardct_frame(w, rgb, fh, distance=1.0, ac_strategy_search=False)
    out, _ = decode(w.get_bytes())
    err = np.abs(out.astype(float) - img.astype(float)).mean()
    assert err < 6.0
