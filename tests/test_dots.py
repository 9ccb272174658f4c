"""Automatic dot detection -> patch dictionary
(enc_detect_dots.cc + enc_dot_dictionary.cc analog)."""

import numpy as np

from libjxl_tpu.api.codestream import decode, encode_lossy

STARS = [(30, 40), (80, 160), (150, 60), (170, 200), (50, 220)]


def starfield():
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:200, 0:240]
    img = np.stack([120 + 50 * np.sin(xx / 29), 110 + 40 * np.cos(yy / 31),
                    np.full((200, 240), 100)], -1)
    for (y, x) in STARS:
        img[y - 1:y + 2, x - 1:x + 2] = 250
        img[y, x] = 255
    return np.clip(img + rng.normal(0, 2, img.shape), 0, 255).astype(np.uint8)


def test_dot_detection_preserves_stars():
    img = starfield()
    d5 = encode_lossy(img, distance=2.5, effort=5)
    d8 = encode_lossy(img, distance=2.5, effort=8)
    o5, _ = decode(d5)
    o8, _ = decode(d8)

    def star_err(o):
        return np.mean([abs(int(o[y, x, 0]) - 255) for (y, x) in STARS])

    assert star_err(o8) < 0.6 * star_err(o5)
    err8 = np.abs(o8.astype(int) - img.astype(int)).mean()
    err5 = np.abs(o5.astype(int) - img.astype(int)).mean()
    assert err8 <= err5 + 0.1


def test_find_dots_none_on_smooth():
    from libjxl_tpu.render.patches import find_dots

    yy, xx = np.mgrid[0:64, 0:64]
    xyb = np.stack([0.01 * np.sin(xx / 9)] * 3)
    assert find_dots(xyb) is None
