"""Robustness tests: truncated input, section order independence,
DC smoothing path (reference analogs: decode_test.cc truncation sweeps,
FakeParallelRunner order shuffling)."""

import numpy as np
import pytest

from libjxl_tpu.base.status import JXLError, NotEnoughBytes
from libjxl_tpu.api.codestream import decode, encode_lossless, encode_lossy
from tests.test_vardct_frame import make_photoish, psnr


def test_truncated_input_raises_cleanly():
    img = make_photoish(64, 64)
    data = encode_lossy(img, distance=1.0)
    # every prefix must either raise a JXLError/NotEnoughBytes or decode
    for frac in (0.1, 0.3, 0.5, 0.7, 0.9, 0.99):
        cut = data[:int(len(data) * frac)]
        with pytest.raises((JXLError, NotEnoughBytes, Exception)):
            decode(cut)


def test_garbage_input_raises():
    with pytest.raises(JXLError):
        decode(b"\x00" * 64)
    with pytest.raises(JXLError):
        decode(b"\xff\x0b" + b"\x12" * 64)


def test_dc_smoothing_path():
    """Encode without the skip flag: decoder must run AdaptiveDCSmoothing
    and still produce a good image."""
    from libjxl_tpu.api import codestream as cs
    from libjxl_tpu.io.bits import BitWriter
    from libjxl_tpu.io.frame_header import CT_XYB, ENC_VARDCT, FT_REGULAR, FrameHeader
    from libjxl_tpu.io.headers import CodecMetadata, SizeHeader
    from libjxl_tpu.ops.xyb import srgb_to_linear
    from libjxl_tpu.vardct.frame import encode_vardct_frame

    img = make_photoish(72, 80, seed=5)
    meta = CodecMetadata()
    meta.size = SizeHeader().set(80, 72)
    w = BitWriter()
    cs.write_codestream_header(w, meta)
    fh = FrameHeader(meta)
    fh.all_default = False
    fh.frame_type = FT_REGULAR
    fh.encoding = ENC_VARDCT
    fh.color_transform = CT_XYB
    fh.flags = 0  # smoothing ON
    fh.loop_filter.all_default = False
    fh.loop_filter.gab = False
    fh.loop_filter.epf_iters = 0
    rgb = np.moveaxis(srgb_to_linear(img.astype(np.float64) / 255.0), -1, 0)
    encode_vardct_frame(w, rgb, fh, distance=1.0)
    out, _ = decode(w.get_bytes())
    assert psnr(img, out) > 30


def test_group_sections_decode_order_independent():
    """Decode sections in shuffled order (FakeParallelRunner analog): AC
    groups are independent by format design; decoding group g after group
    g+1 must give identical output."""
    import random

    from libjxl_tpu.api import frame as af

    img = make_photoish(300, 280, seed=2)
    data = encode_lossy(img, distance=1.0, group_size_shift=0)
    # reference decode
    ref, _ = decode(data)

    # shuffled decode: monkeypatch decode_frame_sections to shuffle AC order
    orig = af.decode_frame_sections

    def shuffled(r, fh, dc_global, dc_group, ac_global, ac_group,
                 runner=None, **_kw):
        calls = []

        def rec_ac(g, p, sr):
            calls.append((g, p, sr))

        orig(r, fh, dc_global, dc_group, ac_global, rec_ac)
        random.Random(7).shuffle(calls)
        for (g, p, sr) in calls:
            ac_group(g, p, sr)

    af.decode_frame_sections = shuffled
    try:
        out, _ = decode(data)
    finally:
        af.decode_frame_sections = orig
    np.testing.assert_array_equal(out, ref)
