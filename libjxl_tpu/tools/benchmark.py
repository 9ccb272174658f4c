"""benchmark_xl analog: multi-config encode/decode benchmark harness.

Reports BPP, encode/decode MP/s, PSNR, perceptual distance per config
(tools/benchmark/benchmark_stats.cc:132-140 column set).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def run_config(image, config: str):
    from ..api.codestream import decode, encode_lossless, encode_lossy
    from ..metrics import (
        butteraugli_distance,
        compute_psnr,
        msssim_xyb,
        ssimulacra2,
    )

    h, w = image.shape[:2]
    mp = h * w / 1e6
    parts = config.split(":")
    t0 = time.perf_counter()
    if parts[0] == "m" or parts[0] == "lossless":
        data = encode_lossless(image)
    else:
        distance = float(parts[0][1:]) if parts[0].startswith("d") else 1.0
        data = encode_lossy(image, distance=distance)
    enc_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    out, _ = decode(data)
    dec_t = time.perf_counter() - t0
    res = {
        "config": config,
        "bpp": round(len(data) * 8 / (h * w), 4),
        "enc_mps": round(mp / enc_t, 4),
        "dec_mps": round(mp / dec_t, 4),
        "psnr": round(compute_psnr(image, out.reshape(image.shape)), 2),
    }
    if image.shape[-1] == 3 and image.dtype == np.uint8:
        res["butteraugli"] = round(
            butteraugli_distance(image, out.reshape(image.shape)), 3)
        res["msssim"] = round(msssim_xyb(image, out.reshape(image.shape)), 2)
        if image.shape[0] >= 8 and image.shape[1] >= 8:
            res["ssimulacra2"] = round(
                ssimulacra2(image, out.reshape(image.shape)), 2)
    return res


def main(argv=None):
    p = argparse.ArgumentParser(prog="benchmark_xl")
    p.add_argument("inputs", nargs="+", help="input images")
    p.add_argument("--codec", default="d1.0,d4.0,m",
                   help="comma-separated configs: dN (vardct), m (modular)")
    args = p.parse_args(argv)
    from ..extras.io import load_image

    for path in args.inputs:
        image = load_image(path)
        for config in args.codec.split(","):
            res = run_config(image, config)
            res["input"] = path
            print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
