"""Chroma-subsampled (4:2:0 / 4:2:2) YCbCr VarDCT frames
(dec_group.cc shift-aware block loop)."""

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
    CT_YCBCR,
    ENC_VARDCT,
    FLAG_SKIP_ADAPTIVE_DC_SMOOTHING,
    FT_REGULAR,
    FrameHeader,
)
from libjxl_tpu.vardct.frame import rgb_to_ycbcr
from libjxl_tpu.vardct.subsampled import encode_vardct_subsampled


def smooth(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 3))
    for i in range(3):
        img[:, :, i] = 128 + 80 * np.sin(xx / 17 + i) * np.cos(yy / 23 - i)
    img += rng.normal(0, 3, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("mode", [[0, 1, 0], [0, 2, 0], [0, 3, 0]])
def test_subsampled_roundtrip(mode):
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
    fh.color_transform = CT_YCBCR
    fh.chroma_subsampling.channel_mode = mode
    fh.flags = FLAG_SKIP_ADAPTIVE_DC_SMOOTHING
    fh.loop_filter.all_default = False
    fh.loop_filter.gab = False
    fh.loop_filter.epf_iters = 0
    hs = [fh.chroma_subsampling.hshift(c) for c in range(3)]
    vs = [fh.chroma_subsampling.vshift(c) for c in range(3)]
    assert not fh.chroma_subsampling.is_444()
    ycbcr = rgb_to_ycbcr(np.moveaxis(img.astype(np.float64) / 255, -1, 0))

    def ds(p, fy, fx):
        h2, w2 = p.shape[0] // fy * fy, p.shape[1] // fx * fx
        return p[:h2, :w2].reshape(h2 // fy, fy, w2 // fx, fx).mean(
            axis=(1, 3))

    planes = [ds(ycbcr[c], 1 << vs[c], 1 << hs[c]) for c in range(3)]
    encode_vardct_subsampled(w, planes, fh, distance=1.0)
    out, _ = decode(w.get_bytes())
    err = np.abs(out.astype(float) - img.astype(float)).mean()
    assert err < 7.0


def test_subsampled_multigroup():
    img = smooth(300, 280, seed=5)
    meta = CodecMetadata()
    meta.size = SizeHeader().set(280, 300)
    meta.m.all_default = False
    meta.m.xyb_encoded = False
    w = BitWriter()
    write_codestream_header(w, meta)
    fh = FrameHeader(meta)
    fh.all_default = False
    fh.frame_type = FT_REGULAR
    fh.encoding = ENC_VARDCT
    fh.color_transform = CT_YCBCR
    fh.chroma_subsampling.channel_mode = [0, 1, 0]
    fh.flags = FLAG_SKIP_ADAPTIVE_DC_SMOOTHING
    fh.loop_filter.all_default = False
    fh.loop_filter.gab = False
    fh.loop_filter.epf_iters = 0
    hs = [fh.chroma_subsampling.hshift(c) for c in range(3)]
    vs = [fh.chroma_subsampling.vshift(c) for c in range(3)]
    ycbcr = rgb_to_ycbcr(np.moveaxis(img.astype(np.float64) / 255, -1, 0))

    def ds(p, fy, fx):
        h2, w2 = p.shape[0] // fy * fy, p.shape[1] // fx * fx
        return p[:h2, :w2].reshape(h2 // fy, fy, w2 // fx, fx).mean(
            axis=(1, 3))

    planes = [ds(ycbcr[c], 1 << vs[c], 1 << hs[c]) for c in range(3)]
    encode_vardct_subsampled(w, planes, fh, distance=1.5)
    out, _ = decode(w.get_bytes())
    err = np.abs(out.astype(float) - img.astype(float)).mean()
    assert err < 8.0
