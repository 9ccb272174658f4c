"""Options-based encoder API (api/encoder.py vs encode.h protocol)."""

import numpy as np
import pytest

from libjxl_tpu.api import codestream, encoder
from libjxl_tpu.base.status import JXLError


def _image(h=96, w=96, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([100 + 80 * np.sin(xx * 0.04),
                    120 + 60 * np.cos(yy * 0.05),
                    90 + 70 * np.sin((xx + yy) * 0.02)], -1)
    return np.clip(img + rng.normal(0, 4, img.shape), 0, 255).astype(
        np.uint8)


def test_every_setting_id_validates():
    enc = encoder.Encoder()
    fs = enc.frame_settings()
    for setting, (lo, hi) in encoder._RANGES.items():
        fs.set_option(setting, lo)
        cap = min(hi, 10 if setting == encoder.SETTING_EFFORT else hi)
        if setting == encoder.SETTING_EFFORT:
            cap = 9  # 10 is expert-gated
        fs.set_option(setting, cap)
        with pytest.raises(JXLError):
            fs.set_option(setting, hi + 1)
    with pytest.raises(JXLError):
        fs.set_option("no_such_setting", 1)


def test_effort_10_is_expert_gated():
    enc = encoder.Encoder()
    fs = enc.frame_settings()
    with pytest.raises(JXLError):
        fs.set_option(encoder.SETTING_EFFORT, 10)
    enc.allow_expert_options()
    fs.set_option(encoder.SETTING_EFFORT, 10)


def test_lossy_roundtrip_with_options():
    img = _image()
    enc = encoder.Encoder()
    fs = enc.frame_settings()
    fs.set_option(encoder.SETTING_EFFORT, 5)
    fs.set_option(encoder.SETTING_EPF, 0)
    fs.set_option(encoder.SETTING_GABORISH, 0)
    fs.set_distance(1.0)
    enc.add_image_frame(fs, img)
    data = enc.process_output()
    dec, _ = codestream.decode(data, device=False)
    err = np.abs(dec.astype(float) - img.astype(float)).mean()
    assert err < 4.0, err
    # the signaled loop filter reflects the options
    from libjxl_tpu.api.codestream import parse_codestream_header
    from libjxl_tpu.io.bits import BitReader
    from libjxl_tpu.io.frame_header import FrameHeader

    r = BitReader(data)
    meta = parse_codestream_header(r)
    fh = FrameHeader(meta)
    fh.read(r)
    assert fh.loop_filter.epf_iters == 0
    assert not fh.loop_filter.gab


def test_lossless_via_distance_zero():
    img = _image(64, 64)
    enc = encoder.Encoder()
    fs = enc.frame_settings()
    fs.set_distance(0.0)
    enc.add_image_frame(fs, img)
    data = enc.process_output()
    dec, _ = codestream.decode(data)
    assert np.array_equal(dec, img)


def test_container_output():
    from libjxl_tpu.io.container import is_container

    img = _image(48, 48)
    enc = encoder.Encoder()
    enc.use_container = True
    fs = enc.frame_settings()
    fs.set_distance(0.0)
    enc.add_image_frame(fs, img)
    assert is_container(enc.process_output())
