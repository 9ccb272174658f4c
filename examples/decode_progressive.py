"""Progressive decode example (examples/decode_progressive.cc analog):
decodes each pass of a progressive stream into its own image.

Usage: python examples/decode_progressive.py in.jxl out_prefix
"""

import sys

import numpy as np

from libjxl_tpu.api.codestream import parse_codestream_header
from libjxl_tpu.extras.io import save_image
from libjxl_tpu.io.bits import BitReader
from libjxl_tpu.io.container import extract_codestream
from libjxl_tpu.io.frame_header import FrameHeader
from libjxl_tpu.ops.xyb import linear_to_srgb
from libjxl_tpu.vardct import frame as vf


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 1
    with open(sys.argv[1], "rb") as f:
        data = extract_codestream(f.read())
    # decode pass-by-pass by truncating the AC group decode at each pass
    r = BitReader(data)
    meta = parse_codestream_header(r)
    fh = FrameHeader(meta)
    fh.read(r)
    num_passes = fh.passes.num_passes
    for upto in range(1, num_passes + 1):
        rr = BitReader(data)
        parse_codestream_header(rr)
        fh2 = FrameHeader(meta)
        fh2.read(rr)
        orig = vf.decode_ac_group

        def limited(sr, state, g, p=0):
            if p < upto:
                orig(sr, state, g, p)

        vf.decode_ac_group = limited
        try:
            chans = vf.decode_vardct_frame(rr, fh2)
        finally:
            vf.decode_ac_group = orig
        srgb = linear_to_srgb(np.stack(chans, axis=-1))
        img = np.clip(np.round(srgb * 255.0), 0, 255).astype(np.uint8)
        path = f"{sys.argv[2]}_pass{upto}.png"
        save_image(path, img)
        print(f"pass {upto}/{num_passes} -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
