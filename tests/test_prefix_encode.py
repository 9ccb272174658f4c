"""Prefix-code histogram writing (enc_huffman.cc analog)."""

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


def test_prefix_coded_modular_frame():
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:160, 0:200]
    img = np.stack([(128 + 60 * np.sin(xx / 19 + i) * np.cos(yy / 13 - i)
                     + rng.normal(0, 5, (160, 200))).clip(0, 255)
                    for i in range(3)], -1).astype(np.uint8)
    sizes = {}
    for use_prefix in (False, True):
        meta = CodecMetadata()
        meta.size = SizeHeader().set(200, 160)
        meta.m.all_default = False
        meta.m.xyb_encoded = False
        w = BitWriter()
        write_codestream_header(w, meta)
        fh = make_modular_frame_header(meta)
        chans = [img[:, :, c].astype(np.int32) for c in range(3)]
        encode_modular_frame(w, chans, fh,
                             ModularEncOptions(use_prefix=use_prefix,
                                               try_palette=False))
        data = w.get_bytes()
        out, _ = decode(data)
        np.testing.assert_array_equal(out, img)
        sizes[use_prefix] = len(data)
    # prefix streams are valid and within ~15% of the ANS size
    assert sizes[True] < sizes[False] * 1.15
