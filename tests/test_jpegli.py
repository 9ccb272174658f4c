"""jpegli sibling-codec tests (lib/jpegli encode/decode_api_test analog).

Cross-validates every produced JPEG against an independent decoder
(PIL/libjpeg) and checks the psychovisual win over libjpeg's encoder.
"""

import io
import subprocess
import sys

import numpy as np
import pytest

from libjxl_tpu.jpegli import (decode_jpegli, encode_jpegli,
                               quality_to_distance)
from libjxl_tpu.jpegli.quant import (distance_to_linear_quality,
                                     make_quant_tables)

PIL = pytest.importorskip("PIL.Image")


def _test_image(n=256, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:n, 0:n]
    img = (120 + 60 * np.sin(xx * 0.02) + 50 * np.cos(yy * 0.03 + 1)
           + rng.normal(0, 6, (n, n)))
    rgb = np.stack([img, img * 0.9 + 10, img * 1.1 - 12], -1)
    return np.clip(rgb, 0, 255).astype(np.uint8)


def _pil_decode(data, mode="RGB"):
    return np.asarray(PIL.open(io.BytesIO(data)).convert(mode))


def _pil_encode(rgb, quality, subsampling="4:4:4"):
    buf = io.BytesIO()
    PIL.fromarray(rgb).save(buf, "JPEG", quality=quality,
                            subsampling=subsampling)
    return buf.getvalue()


def test_roundtrip_444_decodable_by_libjpeg():
    rgb = _test_image()
    data = encode_jpegli(rgb, distance=1.0)
    out = _pil_decode(data)
    assert out.shape == rgb.shape
    rmse = np.sqrt(np.mean((out.astype(float) - rgb) ** 2))
    assert rmse < 4.5, rmse


def test_own_decoder_matches_libjpeg():
    rgb = _test_image()
    data = encode_jpegli(rgb, distance=1.0)
    ours = decode_jpegli(data)
    ref = _pil_decode(data)
    # same coefficients; IDCT/rounding differences only
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 3


def test_roundtrip_420():
    rgb = _test_image()
    data = encode_jpegli(rgb, distance=1.0, subsampling="420")
    out = _pil_decode(data)
    assert out.shape == rgb.shape
    assert len(data) < len(encode_jpegli(rgb, distance=1.0))
    rmse = np.sqrt(np.mean((out.astype(float) - rgb) ** 2))
    assert rmse < 6.0, rmse


def test_roundtrip_gray():
    g = _test_image()[:, :, 0]
    data = encode_jpegli(g, distance=1.0)
    out = _pil_decode(data, "L")
    assert out.shape == g.shape
    ours = decode_jpegli(data)
    assert ours.shape == (*g.shape, 1)
    rmse = np.sqrt(np.mean((out.astype(float) - g) ** 2))
    assert rmse < 4.5, rmse


@pytest.mark.parametrize("shape", [(1, 1), (7, 5), (8, 8), (17, 9),
                                   (199, 173)])
@pytest.mark.parametrize("ss", ["444", "420"])
def test_odd_sizes(shape, ss):
    rgb = _test_image()[:shape[0], :shape[1]]
    data = encode_jpegli(rgb, distance=1.0, subsampling=ss)
    out = _pil_decode(data)
    assert out.shape == rgb.shape
    assert decode_jpegli(data).shape == rgb.shape


def test_size_monotonic_in_distance():
    rgb = _test_image()
    sizes = [len(encode_jpegli(rgb, distance=d))
             for d in (0.5, 1.0, 2.0, 4.0)]
    assert sizes == sorted(sizes, reverse=True), sizes


def test_beats_libjpeg_size_at_equal_quality():
    """jpegli's pitch: smaller files than libjpeg at matching visual
    quality (lib/jpegli/README.md)."""
    from libjxl_tpu.metrics import butteraugli_distance

    rgb = _test_image(n=256, seed=11)
    ours = encode_jpegli(rgb, distance=2.0)
    d_ours = float(butteraugli_distance(rgb, _pil_decode(ours)))
    ref = _pil_encode(rgb, 70)
    d_ref = float(butteraugli_distance(rgb, _pil_decode(ref)))
    assert len(ours) < len(ref), (len(ours), len(ref))
    assert d_ours < d_ref + 0.15, (d_ours, d_ref)


def test_quality_to_distance_mapping():
    assert quality_to_distance(100) == pytest.approx(0.01)
    assert quality_to_distance(90) == pytest.approx(1.0)
    assert quality_to_distance(30) == pytest.approx(0.1 + 70 * 0.09)
    # below 30: quadratic ramp, continuous-ish and increasing
    assert quality_to_distance(10) > quality_to_distance(30)
    d = encode_jpegli(_test_image(), quality=90)
    d2 = encode_jpegli(_test_image(), distance=1.0)
    assert d == d2


def test_std_tables_and_fixed_code():
    rgb = _test_image()
    data = encode_jpegli(rgb, distance=1.0, std_tables=True)
    assert _pil_decode(data).shape == rgb.shape
    data = encode_jpegli(rgb, distance=1.0, optimize=False)
    assert _pil_decode(data).shape == rgb.shape
    # optimal Huffman must not be larger than the fixed tables
    assert len(encode_jpegli(rgb, distance=1.0)) <= len(data)


def test_quant_tables_scale():
    t1 = make_quant_tables(1.0)
    t2 = make_quant_tables(2.0)
    assert t1.shape == (3, 64)
    assert (t2.astype(int) >= t1.astype(int)).mean() > 0.95
    assert distance_to_linear_quality(0.05) == 1.0
    # 420 chroma tables are rescaled
    t420 = make_quant_tables(1.0, subsampling="420")
    assert not np.array_equal(t420[1], t1[1])


def test_adaptive_quant_reduces_size_on_mixed_content():
    """The dead-zone quantizer should spend fewer bits on masked
    (busy) regions: smaller file, bounded quality change."""
    rgb = _test_image(n=256, seed=7)
    with_aq = encode_jpegli(rgb, distance=1.0, adaptive=True)
    without = encode_jpegli(rgb, distance=1.0, adaptive=False)
    assert len(with_aq) < len(without)


def test_cli_roundtrip(tmp_path):
    from libjxl_tpu.extras.io import save_image

    rgb = _test_image(n=64)
    src = tmp_path / "in.png"
    jpg = tmp_path / "out.jpg"
    png = tmp_path / "out.png"
    save_image(str(src), rgb)
    r = subprocess.run(
        [sys.executable, "-m", "libjxl_tpu.tools.cjpegli", str(src),
         str(jpg), "-d", "1.0", "-v"], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [sys.executable, "-m", "libjxl_tpu.tools.djpegli", str(jpg),
         str(png), "-v"], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    out = np.asarray(PIL.open(png))
    assert out.shape == rgb.shape


@pytest.mark.parametrize("level", [1, 2])
@pytest.mark.parametrize("ss", ["444", "420"])
def test_progressive_matches_baseline_pixels(level, ss):
    """Progressive scans carry the same coefficients: identical decode,
    smaller file (SetDefaultScanScript, encode.cc:107)."""
    rgb = _test_image()
    prog = encode_jpegli(rgb, distance=1.0, progressive=level,
                         subsampling=ss)
    base = encode_jpegli(rgb, distance=1.0, subsampling=ss)
    assert np.array_equal(_pil_decode(prog), _pil_decode(base))
    assert len(prog) < len(base)
    # own progressive decoder agrees with libjpeg
    assert np.abs(decode_jpegli(prog).astype(int)
                  - _pil_decode(prog).astype(int)).max() <= 3


def test_progressive_odd_sizes_and_gray():
    rgb = _test_image()[:97, :61]
    for ss in ("444", "420"):
        d = encode_jpegli(rgb, distance=1.0, progressive=2,
                          subsampling=ss)
        assert _pil_decode(d).shape == rgb.shape
    g = rgb[:, :, 0]
    d = encode_jpegli(g, distance=1.0, progressive=2)
    assert _pil_decode(d, "L").shape == g.shape


def test_benchmark_jpegli_row():
    from libjxl_tpu.tools.benchmark import run_config

    rgb = _test_image(n=96)
    res = run_config(rgb, "jpegli:d1.0:p2:420")
    assert res["bpp"] > 0 and res["butteraugli"] > 0


def test_djpegli_16bit_output(tmp_path):
    """--bitdepth 16: the float pipeline quantizes only at the end, and
    the 16-bit PNG writer/reader roundtrip is exact (PIL handles neither
    direction for multi-channel 16-bit)."""
    import numpy as np

    from libjxl_tpu.extras.io import load_image, save_image
    from libjxl_tpu.jpegli import decode_jpegli, encode_jpegli

    rng = np.random.default_rng(11)
    img = np.clip(rng.normal(128, 40, (64, 80, 3)), 0, 255).astype(np.uint8)
    jb = encode_jpegli(img, distance=1.0)
    out16 = decode_jpegli(jb, bitdepth=16)
    assert out16.dtype == np.uint16
    out8 = decode_jpegli(jb)
    # the hi byte tracks the 8-bit output within one step
    assert np.abs((out16 // 257).astype(int) - out8.astype(int)).max() <= 1
    p = tmp_path / "x.png"
    save_image(p, out16)
    back = load_image(p)
    assert back.dtype == np.uint16 and np.array_equal(back, out16)
