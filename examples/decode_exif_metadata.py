"""Read Exif metadata from a JXL container and apply the orientation
(examples/decode_exif_metadata.cc analog).

Usage: python examples/decode_exif_metadata.py image.jxl [out.png]
"""

import sys

from libjxl_tpu.api.codestream import decode
from libjxl_tpu.extras.exif import (
    get_exif_orientation,
    reset_exif_orientation,
)
from libjxl_tpu.io.container import (
    extract_codestream,
    is_container,
    parse_boxes,
)


def main(argv):
    if len(argv) < 2:
        print(__doc__)
        return 1
    data = open(argv[1], "rb").read()
    exif = None
    if is_container(data):
        for box_type, payload, _ in parse_boxes(data[12:]):
            if box_type == b"Exif":
                exif = payload[4:]  # skip the 4-byte tiff header offset
        codestream = extract_codestream(data)
    else:
        codestream = data
    if exif is None:
        print("no Exif box present")
    else:
        orient = get_exif_orientation(exif)
        print(f"Exif payload: {len(exif)} bytes, orientation={orient}")
        reset = reset_exif_orientation(exif)
        print(f"orientation after reset: {get_exif_orientation(reset)}")
    image, _meta = decode(codestream)
    print(f"decoded {image.shape[1]}x{image.shape[0]} image")
    if len(argv) > 2:
        from libjxl_tpu.extras.io import save_image

        save_image(argv[2], image)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
