"""Noise synthesis tests (reference analog: dec_noise + stage_noise)."""

import numpy as np

from libjxl_tpu.api.codestream import decode, encode_lossy
from libjxl_tpu.render.noise import (
    Xorshift128Plus,
    convolve_noise,
    noise_strength,
    photon_noise_lut,
    random_image,
)
from tests.test_vardct_frame import make_photoish, psnr


def test_xorshift_deterministic():
    a = Xorshift128Plus(1, 0, 64, 128)
    b = Xorshift128Plus(1, 0, 64, 128)
    np.testing.assert_array_equal(a.fill(), b.fill())
    c = Xorshift128Plus(1, 0, 64, 129)
    assert not np.array_equal(a.fill(), c.fill())


def test_random_image_range():
    rng = Xorshift128Plus(1, 0, 0, 0)
    img = random_image(rng, 37, 11)
    assert img.shape == (11, 37)
    assert (img >= 1.0).all() and (img < 2.0).all()
    assert img.std() > 0.1


def test_convolve_noise_zero_mean_ish():
    rng = Xorshift128Plus(1, 0, 0, 0)
    img = random_image(rng, 64, 64)
    conv = convolve_noise(img)
    assert abs(float(conv.mean())) < 0.05
    assert conv.std() > 0.5


def test_noise_strength_lut():
    lut = [0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7]
    x = np.array([0.0, 0.5, 1.0, 2.0])
    s = noise_strength(lut, x)
    assert s[0] == 0.0
    assert (np.diff(s) >= 0).all()


def test_photon_noise_roundtrip():
    img = make_photoish(64, 64, seed=6)
    data = encode_lossy(img, distance=1.0, photon_noise_iso=3200)
    plain = encode_lossy(img, distance=1.0)
    out_noise, _ = decode(data)
    out_plain, _ = decode(plain)
    # noise must actually perturb the output but keep the image recognizable
    assert not np.array_equal(out_noise, out_plain)
    assert psnr(out_plain, out_noise) > 20
    assert psnr(img, out_noise) > 25
