"""Spot-color and tone-mapping render stages (stage_spot.cc,
stage_tone_mapping.cc / cms/tone_mapping-inl.h)."""

import numpy as np

from libjxl_tpu.api.codestream import decode, encode_lossy
from libjxl_tpu.render.tone_map import (
    hlg_inv_oetf,
    hlg_oetf,
    pq_eotf,
    pq_inv_eotf,
    rec2408_tone_map,
)


def smooth(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 3))
    for i in range(3):
        img[:, :, i] = 128 + 80 * np.sin(xx / 17 + i) * np.cos(yy / 23 - i)
    img += rng.normal(0, 3, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def test_transfer_function_inverses():
    x = np.linspace(0, 1, 257)
    np.testing.assert_allclose(pq_inv_eotf(pq_eotf(x)), x, atol=1e-6)
    np.testing.assert_allclose(hlg_oetf(hlg_inv_oetf(x)), x, atol=1e-6)


def test_rec2408_tone_map_properties():
    # peak source white maps to <= display max; dark values stay ~linear
    peak = np.ones((3, 2, 2))
    out = rec2408_tone_map(peak, 1000.0, 255.0)
    assert out.max() <= 1.05
    dark = np.full((3, 2, 2), 0.01)
    out_d = rec2408_tone_map(dark, 1000.0, 255.0)
    lin = 0.01 * 1000.0 / 255.0
    assert 0.5 * lin < out_d.mean() <= 1.1 * lin
    # monotonic in luminance
    vals = np.linspace(0.0, 1.0, 64).reshape(1, 8, 8) * np.ones((3, 1, 1))
    mapped = rec2408_tone_map(vals, 4000.0, 255.0)
    lum = mapped.mean(axis=0).reshape(-1)
    assert np.all(np.diff(lum) >= -1e-9)


def test_spot_color_stage():
    img = smooth(128, 128)
    plane = np.zeros((128, 128), np.uint8)
    plane[30:70, 30:90] = 255
    d = encode_lossy(img, distance=1.0,
                     spot_color=(plane, (1.0, 0.0, 0.0, 0.8)))
    out, meta = decode(d)
    assert out.shape == (128, 128, 3)  # spot channel consumed
    assert out[50, 50, 0] > 150  # red spot applied
    assert abs(int(out[10, 10, 0]) - int(img[10, 10, 0])) < 10  # outside


def test_decode_with_tone_mapping():
    img = smooth(96, 96)
    d = encode_lossy(img, distance=1.0)
    out_sdr, _ = decode(d, target_nits=100.0)
    # default intensity target is 255 > 100 -> mapped output still valid
    assert out_sdr.shape == img.shape
    assert out_sdr.dtype == np.uint8
