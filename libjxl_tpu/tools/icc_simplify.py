"""icc_simplify CLI (tools/icc_simplify.cc analog): read an ICC
profile (.icc) or an image with an embedded profile, print the
detected enum color description, and optionally strip the profile
from a PNG when it matches sRGB (the simplification)."""

from __future__ import annotations

import argparse
import pathlib
import sys


def main(argv=None):
    p = argparse.ArgumentParser(prog="icc_simplify")
    p.add_argument("input", help=".icc profile or image with one")
    p.add_argument("output", nargs="?", default=None,
                   help="optional: rewrite image without the profile "
                        "when it simplifies to sRGB")
    args = p.parse_args(argv)
    from ..io.icc_analyze import analyze_icc

    path = pathlib.Path(args.input)
    if path.suffix.lower() in (".icc", ".icm"):
        icc = path.read_bytes()
    else:
        from ..extras.io import load_image

        _img, icc = load_image(path, return_icc=True)
        if icc is None:
            print("no embedded ICC profile", file=sys.stderr)
            return 1
    info = analyze_icc(icc)
    print(info["description"])
    if args.output:
        if info["description"] == "RGB_D65_SRG_Rel_SRG":
            from ..extras.io import load_image, save_image

            img, _ = load_image(path, return_icc=True)
            save_image(args.output, img)  # no icc: sRGB is the default
            print(f"simplified to untagged sRGB: {args.output}",
                  file=sys.stderr)
        else:
            print("profile does not simplify to sRGB; not rewritten",
                  file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
