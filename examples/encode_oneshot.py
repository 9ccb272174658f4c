"""One-shot encode example (examples/encode_oneshot.cc analog).

Usage: python examples/encode_oneshot.py in.png out.jxl [distance]
"""

import sys

from libjxl_tpu.api.codestream import encode_lossless, encode_lossy
from libjxl_tpu.extras.io import load_image
from libjxl_tpu.io.container import wrap_codestream


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 1
    distance = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    image, icc = load_image(sys.argv[1], return_icc=True)
    if distance == 0.0:
        data = encode_lossless(image, icc=icc)
    else:
        data = encode_lossy(image, distance=distance, icc=icc)
    with open(sys.argv[2], "wb") as f:
        f.write(wrap_codestream(data))
    print(f"wrote {len(data)} codestream bytes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
