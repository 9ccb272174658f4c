"""Rate-distortion sweep vs the reference encoder (docs/RD_CURVE.md).

Usage: python -m libjxl_tpu.tools.rd_measure [image.png]
Requires a system libjxl (extras.oracle).
"""

import sys

import numpy as np

from ..api import codestream
from ..extras import oracle
from ..metrics.distance import butteraugli_distance


def corpus_image(h=512, w=512, seed=2):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = (np.stack([(xx * 255 // w), (yy * 255 // h),
                     ((xx + yy) * 255 // (h + w))], axis=-1)
           + rng.integers(-10, 11, (h, w, 3))
           + (30 * np.sin(xx * 0.05))[..., None])
    return np.clip(img, 0, 255).astype(np.uint8)


def main(argv):
    if len(argv) > 1:
        from ..extras.io import load_image

        img = load_image(argv[1])[:, :, :3]
    else:
        img = corpus_image()
    if not oracle.available():
        print("no system libjxl; cannot compare", file=sys.stderr)
        return 1
    print("| d | reference bytes | reference BA | ours bytes | ours BA |")
    print("|---|---|---|---|---|")
    for d in (0.5, 1.0, 1.5, 2.0, 3.0):
        ref = oracle.encode(img, distance=d, effort=5)
        b_ref = butteraugli_distance(img, oracle.decode(ref)[0][:, :, :3])
        ours = codestream.encode_lossy(img, distance=d, effort=5)
        b_ours = butteraugli_distance(img,
                                      oracle.decode(ours)[0][:, :, :3])
        print(f"| {d} | {len(ref)} | {b_ref:.3f} | {len(ours)} "
              f"| {b_ours:.3f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
