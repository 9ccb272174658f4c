"""butteraugli CLI (tools/butteraugli_main.cc analog).

Usage: butteraugli orig.png distorted.png
Prints the approximate perceptual distance (higher = more different;
~1.0 is the visually-lossless threshold used by the encoder).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(prog="butteraugli")
    p.add_argument("orig", help="original image (png/pnm/npy/jxl)")
    p.add_argument("dist", help="distorted image")
    args = p.parse_args(argv)
    from ..extras.io import load_image
    from ..metrics import butteraugli_distance

    orig = load_image(args.orig)[:, :, :3]
    dist = load_image(args.dist)[:, :, :3]
    print(f"{butteraugli_distance(orig, dist):.8f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
