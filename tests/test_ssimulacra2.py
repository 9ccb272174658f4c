"""SSIMULACRA 2 metric (tools/ssimulacra2.cc reimplementation)."""

import numpy as np
import pytest

from libjxl_tpu.metrics import ssimulacra2
from libjxl_tpu.metrics.ssimulacra2 import (
    _blur,
    _downsample2,
    _recursive_gaussian_params,
)


def _test_image(h=96, w=120, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 3))
    for i in range(3):
        img[:, :, i] = 128 + 90 * np.sin(xx / 17 + i) * np.cos(yy / 11 - i)
    img += rng.normal(0, 4, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_identical_scores_100():
    img = _test_image()
    assert ssimulacra2(img, img) == 100.0


def test_monotonic_in_noise():
    img = _test_image()
    rng = np.random.default_rng(1)
    scores = []
    for sd in (2, 6, 15, 35):
        dist = np.clip(img.astype(float) + rng.normal(0, sd, img.shape),
                       0, 255).astype(np.uint8)
        scores.append(ssimulacra2(img, dist))
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 80  # slight noise: high quality
    assert scores[-1] < 45  # heavy noise: low quality


def test_blur_detected_as_detail_loss():
    img = _test_image(128, 128)
    f = img.astype(float)
    blurred = f.copy()
    for _ in range(3):
        blurred = (np.roll(blurred, 1, 0) + np.roll(blurred, -1, 0) +
                   np.roll(blurred, 1, 1) + np.roll(blurred, -1, 1) +
                   blurred) / 5
    s = ssimulacra2(img, np.clip(blurred, 0, 255).astype(np.uint8))
    assert 40 < s < 90


def test_recursive_gaussian_matches_true_gaussian():
    """Impulse response of the IIR filter ~ Gaussian sigma=1.5
    (gauss_blur.cc Charalampidis 2016 approximation)."""
    from libjxl_tpu.metrics.ssimulacra2 import _blur_axis0

    n, n2, d1 = _recursive_gaussian_params(1.5)
    assert n == 5
    imp = np.zeros((41, 1), np.float32)
    imp[20, 0] = 1.0
    out = _blur_axis0(imp, 1.5)[:, 0]
    xs = np.arange(41) - 20
    ref = np.exp(-xs ** 2 / (2 * 1.5 ** 2))
    ref /= ref.sum()
    assert np.abs(out - ref).max() < 2e-3
    assert abs(out.sum() - 1.0) < 1e-3
    # separable 2-D impulse response is symmetric
    imp2 = np.zeros((31, 31), np.float32)
    imp2[15, 15] = 1.0
    b2 = _blur(imp2, 1.5)
    assert np.abs(b2 - b2.T).max() < 1e-6


def test_downsample_edge_clamp():
    x = np.arange(9, dtype=np.float32).reshape(1, 3, 3)
    d = _downsample2(x)
    assert d.shape == (1, 2, 2)
    # bottom-right output averages the clamped edge pixels
    assert d[0, 1, 1] == pytest.approx(8.0)


def test_alpha_blending_and_gray():
    img = _test_image(64, 64)
    rgba = np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])
    assert ssimulacra2(rgba, img) == 100.0
    gray = img[:, :, :1]
    assert ssimulacra2(gray, np.repeat(gray, 3, axis=2)) == 100.0


def test_size_mismatch_raises():
    img = _test_image(64, 64)
    with pytest.raises(ValueError):
        ssimulacra2(img, img[:32])
    with pytest.raises(ValueError):
        ssimulacra2(img[:4, :4], img[:4, :4])


def test_jxl_encode_quality_ordering():
    from libjxl_tpu.api.codestream import decode, encode_lossy

    img = _test_image(128, 128, seed=3)
    scores = []
    for d in (0.5, 4.0):
        out, _ = decode(encode_lossy(img, distance=d))
        scores.append(ssimulacra2(img, out.reshape(img.shape)))
    assert scores[0] > scores[1]
    assert scores[0] > 75


def test_cli(tmp_path):
    from libjxl_tpu.extras.io import save_image
    from libjxl_tpu.tools.ssimulacra2_main import main

    img = _test_image(64, 64)
    a = tmp_path / "a.ppm"
    b = tmp_path / "b.ppm"
    save_image(a, img)
    save_image(b, np.clip(img.astype(int) + 6, 0, 255).astype(np.uint8))
    assert main([str(a), str(b)]) == 0
