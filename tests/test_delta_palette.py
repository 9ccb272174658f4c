"""Lossy delta palette encoder (enc_palette.cc lossy path analog)."""

import numpy as np

from libjxl_tpu.api.codestream import (
    CodecMetadata,
    SizeHeader,
    decode,
    write_codestream_header,
)
from libjxl_tpu.api.frame import (
    ModularEncOptions,
    encode_modular_frame,
    make_modular_frame_header,
)
from libjxl_tpu.io.bits import BitWriter


def test_delta_palette_roundtrip():
    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(100 + xx + yy // 2) % 256, (50 + xx // 2) % 256,
                    (200 - yy) % 256], -1).astype(np.uint8)
    meta = CodecMetadata()
    meta.size = SizeHeader().set(w, h)
    meta.m.all_default = False
    meta.m.xyb_encoded = False
    bw = BitWriter()
    write_codestream_header(bw, meta)
    fh = make_modular_frame_header(meta)
    chans = [img[:, :, c].astype(np.int32) for c in range(3)]
    encode_modular_frame(bw, chans, fh,
                         ModularEncOptions(delta_palette=True,
                                           max_palette_colors=64,
                                           color_transform=None))
    data = bw.get_bytes()
    out, _ = decode(data)
    err = np.abs(out.astype(int) - img.astype(int)).mean()
    # lossy but close; far fewer colors than the source gradient
    assert err < 8.0
    assert len(data) < 1500
