"""Faithful butteraugli comparator (butteraugli/butteraugli.cc)."""

import numpy as np
import pytest

from libjxl_tpu.metrics.butteraugli import (
    butteraugli_diffmap,
    butteraugli_score,
    opsin_dynamics_image,
    separate_frequencies,
)
from libjxl_tpu.ops.xyb import srgb_to_linear


def _lin(u8):
    return np.moveaxis(srgb_to_linear(u8.astype(np.float64) / 255.0), -1, 0)


def _img(h=128, w=128, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([128 + 90 * np.sin(xx / 19 + i) * np.cos(yy / 13 - i)
                    for i in range(3)], -1)
    return np.clip(img + rng.normal(0, 5, (h, w, 3)), 0, 255).astype(
        np.uint8)


def test_identical_is_zero():
    a = _lin(_img())
    assert butteraugli_score(a, a) == 0.0


def test_monotonic_in_noise_and_plausible_range():
    img = _img()
    rng = np.random.default_rng(1)
    scores = []
    for sd in (1, 3, 9):
        d = np.clip(img.astype(float) + rng.normal(0, sd, img.shape),
                    0, 255).astype(np.uint8)
        scores.append(butteraugli_score(_lin(img), _lin(d)))
    assert scores[0] < scores[1] < scores[2]
    assert 0.2 < scores[0] < 2.5  # sd=1: near the visibility border
    assert scores[2] > 3.0


def test_frequency_bands_partition_energy():
    xyb = opsin_dynamics_image(_lin(_img(64, 64)))
    lf, mf, hf, uhf = separate_frequencies(xyb)
    assert lf.shape == mf.shape == (3, 64, 64)
    assert hf[0].shape == uhf[0].shape == (64, 64)
    # hf/uhf are zero-mean-ish residuals
    assert abs(float(np.mean(uhf[1]))) < 1.0


def test_masking_reduces_error_in_busy_areas():
    """The same absolute distortion must matter less on a noisy
    background than on a flat one (psychovisual masking)."""
    rng = np.random.default_rng(2)
    flat = np.full((96, 96, 3), 128, np.uint8)
    busy = np.clip(128 + rng.normal(0, 25, (96, 96, 3)), 0,
                   255).astype(np.uint8)
    bump = np.zeros((96, 96, 3))
    bump[48, 48] = 40.0
    s_flat = butteraugli_score(
        _lin(flat), _lin(np.clip(flat + bump, 0, 255).astype(np.uint8)))
    s_busy = butteraugli_score(
        _lin(busy), _lin(np.clip(busy + bump, 0, 255).astype(np.uint8)))
    assert s_flat > s_busy


def test_hf_asymmetry_penalizes_added_artifacts():
    img = _img(96, 96, seed=3)
    rng = np.random.default_rng(4)
    noisy = np.clip(img.astype(float) + rng.normal(0, 6, img.shape),
                    0, 255).astype(np.uint8)
    # adding noise (img -> noisy) should cost more than removing it
    added = butteraugli_score(_lin(img), _lin(noisy), hf_asymmetry=0.8)
    removed = butteraugli_score(_lin(noisy), _lin(img), hf_asymmetry=0.8)
    assert added != pytest.approx(removed, rel=1e-3)


def test_diffmap_localizes_distortion():
    img = _img(96, 96, seed=5)
    dist = img.copy().astype(float)
    dist[20:30, 20:30] += 35
    dm = butteraugli_diffmap(
        _lin(img), _lin(np.clip(dist, 0, 255).astype(np.uint8)))
    inside = dm[18:32, 18:32].max()
    outside = dm[50:, 50:].max()
    assert inside > 4 * outside


def test_quality_ladder_monotonic():
    from libjxl_tpu.api.codestream import decode, encode_lossy

    img = _img(96, 96, seed=6)
    scores = []
    for d in (0.5, 2.0, 6.0):
        out, _ = decode(encode_lossy(img, distance=d))
        scores.append(butteraugli_score(_lin(img),
                                        _lin(out.reshape(img.shape))))
    assert scores[0] < scores[1] < scores[2]


def test_comparator_anchored_to_reference():
    """Our comparator must agree with the REFERENCE Butteraugli (the
    system libjxl's JxlButteraugliCompute) within 2% on codec-artifact
    pairs — the external anchor demanded by round-3/4 verdicts
    (full table: docs/BUTTERAUGLI_ANCHOR.md)."""
    from libjxl_tpu.extras import oracle

    if not oracle.available():
        import pytest

        pytest.skip("no system libjxl")
    img = _img(128, 160, seed=11)
    for d in (1.0, 3.0):
        enc = oracle.encode(img, distance=d, effort=5)
        dec = oracle.decode(enc)[0][:, :, :3]
        ref_mx, _ = oracle.butteraugli(img, dec)
        ours = butteraugli_score(_lin(img), _lin(dec))
        assert abs(ours / ref_mx - 1.0) < 0.02, (d, ours, ref_mx)
