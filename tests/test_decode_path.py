"""decode() must report which renderer produced the pixels, use the
device pipeline when asked, and fall back LOUDLY (logged + recorded)
on unsupported streams."""

import logging

import numpy as np
import pytest

from libjxl_tpu.api import codestream


def _image(h=128, w=160, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = 120 + 70 * np.sin(xx * 0.02) + 40 * np.cos(yy * 0.03)
    rgb = np.stack([img, img * 0.9, img * 1.1], axis=-1)
    return np.clip(rgb + rng.normal(0, 3, rgb.shape), 0, 255).astype(
        np.uint8)


def test_device_path_runs_and_is_recorded():
    img = _image()
    stream = codestream.encode_lossy(img, distance=1.0, effort=3)
    info = {}
    dev, _ = codestream.decode(stream, device=True, decode_info=info)
    assert info["path"].startswith("device:"), info
    host_info = {}
    host, _ = codestream.decode(stream, device=False,
                                decode_info=host_info)
    assert host_info["path"] == "host:device-disabled"
    # device render is float32; the host reference float64 — equal to
    # within a rounding step on u8 output
    assert np.abs(dev.astype(int) - host.astype(int)).max() <= 1


def test_subsampled_stream_falls_back_loudly(caplog):
    from libjxl_tpu.api.codestream import write_codestream_header
    from libjxl_tpu.io.bits import BitWriter
    from libjxl_tpu.io.frame_header import (
        CT_YCBCR,
        ENC_VARDCT,
        FLAG_SKIP_ADAPTIVE_DC_SMOOTHING,
        FT_REGULAR,
        FrameHeader,
    )
    from libjxl_tpu.io.headers import CodecMetadata, SizeHeader
    from libjxl_tpu.vardct.frame import rgb_to_ycbcr
    from libjxl_tpu.vardct.subsampled import encode_vardct_subsampled

    img = _image(120, 144)
    meta = CodecMetadata()
    meta.size = SizeHeader().set(144, 120)
    meta.m.all_default = False
    meta.m.xyb_encoded = False
    w = BitWriter()
    write_codestream_header(w, meta)
    fh = FrameHeader(meta)
    fh.all_default = False
    fh.frame_type = FT_REGULAR
    fh.encoding = ENC_VARDCT
    fh.color_transform = CT_YCBCR
    fh.chroma_subsampling.channel_mode = [0, 1, 0]  # 4:2:0
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
    encode_vardct_subsampled(w, planes, fh, distance=1.0)
    stream = w.get_bytes()
    # round 3: subsampled YCbCr renders ON DEVICE (decode_render_
    # subsampled); the device output must track the host render
    info = {}
    out, _ = codestream.decode(stream, device=True, decode_info=info)
    assert info["path"] == "device:u8-ycbcr", info
    assert out.shape[:2] == (120, 144)
    host, _ = codestream.decode(stream, device=False)
    assert np.abs(host.astype(int) - out.astype(int)).max() <= 1
    # a post-stage needing floats (tone map) still falls back LOUDLY
    info = {}
    with caplog.at_level(logging.WARNING, logger="libjxl_tpu.device"):
        codestream.decode(stream, device=True, decode_info=info,
                          target_nits=100.0)
    assert info["path"].startswith("host:"), info
    assert any("fell back" in r.message for r in caplog.records)
