"""Progressive pass tests (reference analog: passes_test.cc)."""

import numpy as np
import pytest

from libjxl_tpu.api.codestream import decode, encode_lossy
from libjxl_tpu.vardct.frame import shift_right_round0, split_progressive
from tests.test_vardct_frame import make_photoish, psnr


def test_shift_right_round0_truncates_toward_zero():
    v = np.array([-7, -4, -1, 0, 1, 4, 7])
    np.testing.assert_array_equal(shift_right_round0(v, 1),
                                  np.array([-3, -2, 0, 0, 0, 2, 3]))


@pytest.mark.parametrize("shifts", [[0], [1, 0], [2, 1, 0]])
def test_split_progressive_reconstructs(shifts):
    rng = np.random.default_rng(13)
    q = rng.integers(-300, 300, (5, 64))
    parts = split_progressive(q, shifts)
    recon = np.zeros_like(q)
    for p, shift in enumerate(shifts):
        recon += parts[p] << shift
    np.testing.assert_array_equal(recon, q)


@pytest.mark.parametrize("passes", [2, 3])
def test_progressive_roundtrip(passes):
    img = make_photoish(80, 96, seed=14)
    data = encode_lossy(img, distance=1.0, progressive=passes)
    out, _ = decode(data)
    assert psnr(img, out) > 30


def test_progressive_multigroup_roundtrip():
    img = make_photoish(280, 200, seed=15)
    data = encode_lossy(img, distance=1.5, progressive=2, group_size_shift=0)
    out, _ = decode(data)
    assert psnr(img, out) > 28
