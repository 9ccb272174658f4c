"""ssimulacra2 CLI (tools/ssimulacra2_main.cc analog).

Usage: ssimulacra2 orig.png distorted.png [--bg 0.5]
Prints the SSIMULACRA 2.1 score; exit code 0.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="ssimulacra2",
        description="Perceptual quality score: 100 = identical; "
        "30 = low, 50 = medium, 70 = high, 90 = visually lossless.")
    p.add_argument("orig", help="original image (png/pnm/npy/jxl)")
    p.add_argument("dist", help="distorted image")
    p.add_argument("--bg", type=float, default=0.5,
                   help="background intensity for alpha blending [0,1]")
    args = p.parse_args(argv)
    from ..extras.io import load_image
    from ..metrics import ssimulacra2

    orig = load_image(args.orig)
    dist = load_image(args.dist)
    print(f"{ssimulacra2(orig, dist, bg=args.bg):.8f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
