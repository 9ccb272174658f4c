"""Progressive pass tests (reference analog: passes_test.cc)."""

import numpy as np
import pytest

from libjxl_tpu.api.codestream import decode, encode_lossy
from libjxl_tpu.vardct.frame import shift_right_round0, split_progressive
from tests.test_vardct_frame import make_photoish, psnr


def test_shift_right_round0_truncates_toward_zero():
    v = np.array([-7, -4, -1, 0, 1, 4, 7])
    np.testing.assert_array_equal(shift_right_round0(v, 1),
                                  np.array([-3, -2, 0, 0, 0, 2, 3]))


@pytest.mark.parametrize("shifts", [[0], [1, 0], [2, 1, 0]])
def test_split_progressive_reconstructs(shifts):
    rng = np.random.default_rng(13)
    q = rng.integers(-300, 300, (5, 64))
    parts = split_progressive(q, shifts)
    recon = np.zeros_like(q)
    for p, shift in enumerate(shifts):
        recon += parts[p] << shift
    np.testing.assert_array_equal(recon, q)


@pytest.mark.parametrize("passes", [2, 3])
def test_progressive_roundtrip(passes):
    img = make_photoish(80, 96, seed=14)
    data = encode_lossy(img, distance=1.0, progressive=passes)
    out, _ = decode(data)
    assert psnr(img, out) > 30


def test_progressive_multigroup_roundtrip():
    img = make_photoish(280, 200, seed=15)
    data = encode_lossy(img, distance=1.5, progressive=2, group_size_shift=0)
    out, _ = decode(data)
    assert psnr(img, out) > 28


def test_progressive_dc_api():
    """encode_lossy(progressive_dc=True) / cjxl --progressive_dc: DC
    coded as a separate 1:8 kDCFrame (frame_header.h:348 pyramid),
    decoded through the kUseDcFrame path at comparable quality."""
    import numpy as np

    from libjxl_tpu.api import codestream

    rng = np.random.default_rng(9)
    base = 128 + 40 * np.sin(np.arange(300)[:, None] * 0.02) \
        + rng.normal(0, 5, (300, 280))
    img = np.clip(np.stack([base, base * 0.9 + 8, base * 1.1 - 9], -1),
                  0, 255).astype(np.uint8)
    s = codestream.encode_lossy(img, distance=1.0, effort=3,
                                device=False, progressive_dc=True)
    dec, _ = codestream.decode(s, device=False)
    err = np.abs(dec[:, :, :3].astype(int) - img.astype(int)).mean()
    assert err < 3.0, err
    # stream really carries a kDCFrame
    from libjxl_tpu.api.codestream import parse_codestream_header
    from libjxl_tpu.io.bits import BitReader
    from libjxl_tpu.io.frame_header import FT_DC, FrameHeader

    r = BitReader(s)
    meta = parse_codestream_header(r)
    fh = FrameHeader(meta)
    fh.read(r)
    assert fh.frame_type == FT_DC and fh.dc_level == 1


def test_progressive_dc_with_resampling_degrades_loudly():
    """progressive_dc + resampling is refused (the kDCFrame dimension
    cross-term has no reference sample to pin); the encoder codes DC
    in-frame and the stream stays valid for BOTH decoders."""
    import numpy as np

    from libjxl_tpu.api import codestream

    rng = np.random.default_rng(5052)
    base = 120 + 60 * np.sin(np.arange(240)[:, None] * 0.05) \
        + rng.normal(0, 7, (240, 267))
    img = np.clip(np.stack([base, base * 0.94 + 6, base * 1.06 - 8],
                           -1), 0, 255).astype(np.uint8)
    data = codestream.encode_lossy(img, distance=2.0, effort=6,
                                   device=False, progressive=3,
                                   resampling=4, progressive_dc=True)
    ours, _ = codestream.decode(data, device=False)
    assert ours.shape[:2] == (240, 267)
    from libjxl_tpu.extras import oracle

    if oracle.available():
        theirs = oracle.decode(data)[0][:, :, :3]
        assert np.abs(ours[:, :, :3].astype(int)
                      - theirs.astype(int)).max() <= 2
