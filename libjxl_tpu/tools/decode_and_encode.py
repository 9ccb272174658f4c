"""decode_and_encode CLI (tools/decode_and_encode.cc analog):
decode any supported input and re-encode to the output path's format —
a format-conversion pipe used by conformance/fuzz pipelines.

Usage: decode_and_encode in.(jxl|png|pnm|pgx|pfm|npy) out.(...)
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(prog="decode_and_encode")
    p.add_argument("input")
    p.add_argument("output")
    args = p.parse_args(argv)
    from ..extras.io import load_image, save_image

    if args.output.lower().endswith(".jxl"):
        from ..api.codestream import encode_lossless

        img = load_image(args.input)
        with open(args.output, "wb") as f:
            f.write(encode_lossless(img))
        return 0
    save_image(args.output, load_image(args.input))
    return 0


if __name__ == "__main__":
    sys.exit(main())
