"""One-shot decode example (examples/decode_oneshot.cc analog).

Usage: python examples/decode_oneshot.py in.jxl out.png
"""

import sys

from libjxl_tpu.api.codestream import decode
from libjxl_tpu.extras.io import save_image
from libjxl_tpu.io.container import extract_codestream

def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 1
    with open(sys.argv[1], "rb") as f:
        data = f.read()
    image, meta = decode(extract_codestream(data))
    save_image(sys.argv[2], image)
    print(f"decoded {image.shape[1]}x{image.shape[0]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
