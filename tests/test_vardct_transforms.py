"""Transform zoo tests (reference analog: dct_test.cc, transforms fuzzing)."""

import numpy as np
import pytest

from libjxl_tpu.ops.dct import dct2d, idct2d, dct_matrix
from libjxl_tpu.vardct import ac_strategy as acs
from libjxl_tpu.vardct.transforms import (
    dc_from_lowest_frequencies,
    lowest_frequencies_from_dc,
    transform_from_pixels,
    transform_to_pixels,
)

RNG = np.random.default_rng(99)


def test_dct_dc_is_mean():
    x = RNG.normal(size=(8, 8))
    co = dct2d(x)
    assert abs(co[0, 0] - x.mean()) < 1e-12


def test_dct_matches_slow_reference():
    # slow O(N^2) definition (dct_for_test.h analog)
    n = 8
    x = RNG.normal(size=n)
    C = dct_matrix(n)
    f = (C / n) @ x
    for u in range(n):
        c = 1.0 if u == 0 else np.sqrt(2.0)
        expected = c / n * sum(
            x[k] * np.cos((2 * k + 1) * u * np.pi / (2 * n)) for k in range(n))
        assert abs(f[u] - expected) < 1e-12


@pytest.mark.parametrize("r,c", [(8, 8), (8, 16), (16, 8), (32, 8), (16, 32),
                                 (64, 64), (128, 256)])
def test_dct2d_roundtrip(r, c):
    x = RNG.normal(size=(r, c))
    co = dct2d(x)
    assert co.shape == (min(r, c), max(r, c))
    back = idct2d(co, r, c)
    np.testing.assert_allclose(back, x, atol=1e-9)


@pytest.mark.parametrize("strategy", list(range(27)))
def test_all_strategies_roundtrip(strategy):
    cx, cy = acs.COVERED_X[strategy], acs.COVERED_Y[strategy]
    pixels = RNG.normal(size=(cy * 8, cx * 8))
    co = transform_from_pixels(strategy, pixels)
    assert co.shape == (min(cy, cx) * 8, max(cy, cx) * 8)
    back = transform_to_pixels(strategy, co)
    np.testing.assert_allclose(back, pixels, atol=1e-8)


@pytest.mark.parametrize("strategy", [acs.DCT, acs.DCT16X16, acs.DCT8X16,
                                      acs.DCT32X32, acs.DCT64X32])
def test_llf_dc_roundtrip(strategy):
    cx, cy = acs.COVERED_X[strategy], acs.COVERED_Y[strategy]
    dc = RNG.normal(size=(cy, cx))
    llf = lowest_frequencies_from_dc(strategy, dc)
    back = dc_from_lowest_frequencies(strategy, llf)
    np.testing.assert_allclose(back, dc, atol=1e-9)


def test_llf_consistent_with_big_dct():
    """The LLF of a 16x16 DCT of a smooth (bilinear) image should match
    LowestFrequenciesFromDC applied to the 2x2 DC means: this is the format
    contract that lets DC be coded separately."""
    strategy = acs.DCT16X16
    # image exactly representable by the 2x2 lowest frequencies
    co_true = np.zeros((16, 16))
    co_true[:2, :2] = RNG.normal(size=(2, 2))
    pixels = idct2d(co_true, 16, 16)
    dc = np.array([[pixels[y * 8:(y + 1) * 8, x * 8:(x + 1) * 8].mean()
                    for x in range(2)] for y in range(2)])
    llf = lowest_frequencies_from_dc(strategy, dc)
    np.testing.assert_allclose(llf, co_true[:2, :2], atol=1e-9)


@pytest.mark.parametrize("strategy", list(range(27)))
def test_natural_order_is_permutation(strategy):
    order = acs.natural_coeff_order(strategy)
    n = acs.COVERED_X[strategy] * acs.COVERED_Y[strategy] * 64
    assert len(order) == n
    assert sorted(order) == list(range(n))


def test_natural_order_dct8_is_zigzag():
    order = acs.natural_coeff_order(acs.DCT)
    # classic zigzag start: 0, 1, 8, 16, 9, 2, 3, 10, ...
    assert list(order[:8]) == [0, 1, 8, 16, 9, 2, 3, 10]
