"""Signaled upsampling tests (stage_upsampling.cc analog)."""

import numpy as np
import pytest

from libjxl_tpu.api.codestream import decode, encode_lossy
from libjxl_tpu.render.upsample import downsample_box, upsample
from tests.test_vardct_frame import make_photoish, psnr


def test_upsample_preserves_mean():
    rng = np.random.default_rng(8)
    x = rng.uniform(0, 1, (16, 16))
    for n in (2, 4, 8):
        up = upsample(x, n)
        assert up.shape == (16 * n, 16 * n)
        assert abs(up.mean() - x.mean()) < 0.02


def test_upsample_flat_is_flat():
    x = np.full((8, 8), 0.7)
    for n in (2, 4, 8):
        up = upsample(x, n)
        np.testing.assert_allclose(up, 0.7, atol=1e-3)


@pytest.mark.parametrize("rs", [2, 4, 8])
def test_resampling_roundtrip(rs):
    img = make_photoish(96, 96, seed=7)
    data = encode_lossy(img, distance=1.0, resampling=rs)
    out, _ = decode(data)
    assert out.shape == img.shape
    assert psnr(img, out) > 25
    full = encode_lossy(img, distance=1.0)
    assert len(data) < len(full)
