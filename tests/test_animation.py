"""Multi-frame / animation roundtrips (reference analog: animation tests
in jxl_test.cc)."""

import numpy as np

from libjxl_tpu.api.codestream import decode_frames, encode_animation


def test_lossless_animation_roundtrip():
    rng = np.random.default_rng(4)
    frames = [rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
              for _ in range(4)]
    data = encode_animation(frames, fps_numerator=30)
    out = list(decode_frames(data))
    assert len(out) == 4
    for (dec, dur), orig in zip(out, frames):
        assert dur == 1
        np.testing.assert_array_equal(dec, orig)


def test_lossy_animation_roundtrip():
    yy, xx = np.mgrid[0:40, 0:48]
    frames = []
    for t in range(3):
        f = np.stack([(xx * 2 + t * 10) % 200 + 20,
                      (yy * 3) % 180 + 40,
                      ((xx + yy)) % 160 + 50], axis=-1).astype(np.uint8)
        frames.append(f)
    data = encode_animation(frames, lossless=False, distance=1.5)
    out = list(decode_frames(data))
    assert len(out) == 3
    for (dec, dur), orig in zip(out, frames):
        err = np.mean((dec.astype(float) - orig.astype(float)) ** 2)
        assert err < 100
