"""Device (JAX) encode/decode vs host NumPy path.

The jitted encode_step must produce byte-identical codestreams to the
host encoder's DCT8 path, and decode_tpu must reproduce the host
decoder's pixels on such streams.
"""

import numpy as np

from libjxl_tpu.api.codestream import (
    CodecMetadata,
    SizeHeader,
    decode,
    write_codestream_header,
)
from libjxl_tpu.api.tpu_codec import decode_tpu, encode_lossy_tpu
from libjxl_tpu.io.bits import BitWriter
from libjxl_tpu.io.frame_header import (
    CT_XYB,
    ENC_VARDCT,
    FLAG_SKIP_ADAPTIVE_DC_SMOOTHING,
    FT_REGULAR,
    FrameHeader,
)
from libjxl_tpu.ops.xyb import srgb_to_linear
from libjxl_tpu.vardct.frame import encode_vardct_frame


def smooth(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 3))
    for i in range(3):
        img[:, :, i] = 128 + 80 * np.sin(xx / 17 + i) * np.cos(yy / 23 - i)
    img += rng.normal(0, 3, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def host_encode_dct8(img):
    h, w = img.shape[:2]
    meta = CodecMetadata()
    meta.size = SizeHeader().set(w, h)
    bw = BitWriter()
    write_codestream_header(bw, meta)
    fh = FrameHeader(meta)
    fh.all_default = False
    fh.frame_type = FT_REGULAR
    fh.encoding = ENC_VARDCT
    fh.color_transform = CT_XYB
    fh.flags = 0  # adaptive DC smoothing on, like encode_lossy
    fh.loop_filter.all_default = False
    fh.loop_filter.gab = True
    fh.loop_filter.epf_iters = 2
    rgb = np.moveaxis(srgb_to_linear(img.astype(np.float64) / 255.0), -1, 0)
    from libjxl_tpu.api.codestream import _calibrated_distance

    encode_vardct_frame(bw, rgb, fh, distance=_calibrated_distance(1.0),
                        ac_strategy_search=False, dc_distance=1.0)
    return bw.get_bytes()


def test_device_encode_matches_host_bytes():
    img = smooth(96, 80)
    host = host_encode_dct8(img)
    dev = encode_lossy_tpu(img, distance=1.0)
    assert dev == host


def test_device_decode_matches_host_pixels():
    img = smooth(96, 80, seed=3)
    data = encode_lossy_tpu(img, distance=1.0)
    o_host, _ = decode(data)
    o_dev, _ = decode_tpu(data)
    # float32 device vs float64 host: isolated +-1 rounding flips allowed
    diff = np.abs(o_dev.astype(int) - o_host[:, :, :3].astype(int))
    assert diff.max() <= 1 and (diff != 0).mean() < 1e-3
    err = np.abs(o_dev.astype(int) - img.astype(int)).mean()
    assert err < 6.0
