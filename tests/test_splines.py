"""Spline feature tests (reference analog: splines_test.cc)."""

import numpy as np
import pytest

from libjxl_tpu.io.bits import BitReader, BitWriter
from libjxl_tpu.render.splines import (
    Spline,
    SplinesState,
    compute_segments,
    continuous_idct,
    decode_splines,
    dequantize_spline,
    draw_centripetal_catmull_rom,
    draw_segments,
    encode_splines,
    equally_spaced_points,
    quantize_spline,
)


def make_spline(seed=0, n=4, scale=60):
    rng = np.random.default_rng(seed)
    pts = np.cumsum(rng.integers(5, 20, size=(n, 2)), axis=0) + 8
    color = np.zeros((3, 32))
    color[0, 0] = 0.2
    color[1, 0] = 0.5
    color[1, 1] = 0.1
    color[2, 0] = 0.4
    sigma = np.zeros(32)
    sigma[0] = 2.0
    return Spline(pts.astype(float), color, sigma)


def test_continuous_idct_constant():
    dct = np.zeros(32)
    dct[0] = 3.5
    # {x, 0, ..., 0} must interpolate to the constant x (splines.cc:47-50)
    # after the sqrt2 * dc convention: value = sqrt2 * x * cos(0) = x only
    # when combined with the encoder-side dc scaling; check linearity shape
    ts = np.linspace(0, 31, 7)
    vals = continuous_idct(dct, ts)
    assert np.allclose(vals, vals[0])


def test_catmull_rom_endpoints_and_density():
    pts = np.array([[10.0, 10.0], [20.0, 15.0], [30.0, 40.0]])
    up = draw_centripetal_catmull_rom(pts)
    assert np.allclose(up[0], pts[0])
    assert np.allclose(up[-1], pts[-1])
    assert len(up) == (len(pts) - 1) * 16 + 1


def test_equally_spaced_points_unit_distance():
    pts = np.array([[0.0, 0.0], [10.0, 0.0]])
    out = equally_spaced_points(pts)
    xs = [p[0][0] for p in out]
    assert np.allclose(np.diff(xs)[:-1], 1.0)


def test_quantize_dequantize_roundtrip():
    sp = make_spline()
    q = quantize_spline(sp, 0, 0.0, 1.0)
    back = dequantize_spline(q, sp.control_points[0], 0, 0.0, 1.0)
    assert np.allclose(back.control_points, sp.control_points)
    # quantization error bounded by channel weights
    assert np.allclose(back.color_dct, sp.color_dct, atol=0.08)
    assert np.allclose(back.sigma_dct, sp.sigma_dct, atol=0.35)


def test_splines_entropy_roundtrip():
    st = SplinesState(quantization_adjustment=1)
    for seed in range(3):
        sp = make_spline(seed)
        st.starting_points.append(tuple(
            int(v) for v in np.round(sp.control_points[0])))
        st.splines.append(quantize_spline(sp, 1, 0.0, 1.0))
    w = BitWriter()
    encode_splines(st, w)
    got = decode_splines(BitReader(w.get_bytes()), 256 * 256)
    assert got.quantization_adjustment == 1
    assert got.starting_points == st.starting_points
    for a, b in zip(got.splines, st.splines):
        assert a.control_points == b.control_points
        assert np.array_equal(a.color_dct, b.color_dct)
        assert np.array_equal(a.sigma_dct, b.sigma_dct)


def test_draw_segments_adds_energy():
    sp = make_spline()
    st = SplinesState()
    st.starting_points.append(tuple(
        int(v) for v in np.round(sp.control_points[0])))
    st.splines.append(quantize_spline(sp, 0, 0.0, 1.0))
    segs = compute_segments(st, 128, 128)
    assert segs
    xyb = np.zeros((3, 128, 128))
    draw_segments(xyb, segs, add=True)
    assert xyb[1].max() > 0.01
    # subtract inverts exactly
    draw_segments(xyb, segs, add=False)
    assert np.allclose(xyb, 0.0, atol=1e-12)


def test_vardct_roundtrip_with_splines():
    from libjxl_tpu.api.codestream import decode, encode_lossy

    rng = np.random.default_rng(5)
    img = np.full((96, 96, 3), 128, dtype=np.uint8)
    img += rng.integers(0, 6, img.shape).astype(np.uint8)
    sp = make_spline(2)
    data = encode_lossy(img, distance=1.0, splines=[sp])
    out, _ = decode(data)
    assert out.shape == img.shape
    mse = np.mean((out.astype(float) - img.astype(float)) ** 2)
    psnr = 10 * np.log10(255 ** 2 / mse)
    assert psnr > 26, psnr
