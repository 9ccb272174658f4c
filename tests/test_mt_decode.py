"""Multithreaded host entropy decode: per-AC-group pthread pool
(native/vardct_decode.c decode_ac_image, dec_frame.cc:716 RunOnPool
analog) must be pixel-identical to the serial decode."""

import numpy as np
import pytest

from libjxl_tpu.api import codestream
from libjxl_tpu.api.codestream import parse_codestream_header
from libjxl_tpu.io.bits import BitReader
from libjxl_tpu.io.frame_header import FrameHeader
from libjxl_tpu.vardct import frame as vf


def _image(h=600, w=520, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = (110 + 70 * np.sin(xx * 0.01) + 50 * np.cos(yy * 0.013)
           + rng.normal(0, 12, (h, w)))
    rgb = np.stack([img, img * 0.8 + 25, img * 1.15 - 20], axis=-1)
    return np.clip(rgb, 0, 255).astype(np.uint8)


def _entropy_decode(stream, num_threads):
    r = BitReader(stream)
    meta = parse_codestream_header(r)
    fh = FrameHeader(meta)
    fh.read(r)
    cap = {}

    def capture(state):
        cap["state"] = state
        state.restoration_done = True
        state.device_output_done = True

    vf.decode_vardct_frame(r, fh, render_fn=capture, want_qimg=True,
                           num_threads=num_threads)
    return cap["state"]


def test_mt_entropy_decode_matches_serial():
    # 600x520 -> 3x3 AC groups of 256px: enough groups to stripe
    stream = codestream.encode_lossy(_image(), distance=1.0, effort=3)
    st1 = _entropy_decode(stream, num_threads=1)
    assert st1.qimg is not None
    st4 = _entropy_decode(stream, num_threads=4)
    np.testing.assert_array_equal(st1.qimg, st4.qimg)
    np.testing.assert_array_equal(st1.raw_quant_field, st4.raw_quant_field)


def test_mt_threads_exceeding_groups():
    stream = codestream.encode_lossy(_image(300, 300), distance=1.0,
                                     effort=3)
    st1 = _entropy_decode(stream, num_threads=1)
    st16 = _entropy_decode(stream, num_threads=16)
    np.testing.assert_array_equal(st1.qimg, st16.qimg)


def test_full_decode_mt_matches():
    img = _image(512, 512, seed=3)
    stream = codestream.encode_lossy(img, distance=1.5, effort=3)
    a, _ = codestream.decode(stream)
    b, _ = codestream.decode(stream, num_threads=4)
    np.testing.assert_array_equal(a, b)
