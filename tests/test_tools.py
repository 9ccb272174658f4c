"""CLI + container + metrics tests (reference analog: bash_test.sh flows)."""

import json
import subprocess
import sys

import numpy as np
import pytest

from libjxl_tpu.extras.io import load_image, save_image
from libjxl_tpu.io.container import (
    extract_codestream,
    extract_metadata,
    is_container,
    wrap_codestream,
)
from libjxl_tpu.metrics import butteraugli_distance, compute_psnr, msssim_xyb

RNG = np.random.default_rng(77)


@pytest.fixture
def png_image(tmp_path):
    img = RNG.integers(0, 256, (40, 56, 3)).astype(np.uint8)
    path = tmp_path / "in.png"
    save_image(path, img)
    return path, img


def test_pnm_roundtrip(tmp_path):
    img = RNG.integers(0, 256, (9, 13, 3)).astype(np.uint8)
    path = tmp_path / "x.ppm"
    save_image(path, img)
    np.testing.assert_array_equal(load_image(path), img)


def test_container_roundtrip():
    cs = b"\xff\x0a" + bytes(100)
    boxed = wrap_codestream(cs, exif=b"EXIFDATA", xml=b"<x/>")
    assert is_container(boxed)
    assert extract_codestream(boxed) == cs
    meta = extract_metadata(boxed)
    assert meta["exif"] == b"EXIFDATA"
    assert meta["xml"] == [b"<x/>"]


def test_cjxl_djxl_lossless_cli(tmp_path, png_image):
    path, img = png_image
    from libjxl_tpu.tools import cjxl, djxl, jxlinfo

    out_jxl = tmp_path / "out.jxl"
    out_png = tmp_path / "dec.png"
    assert cjxl.main([str(path), str(out_jxl), "-q", "100", "-v"]) == 0
    assert djxl.main([str(out_jxl), str(out_png), "-v"]) == 0
    np.testing.assert_array_equal(load_image(out_png), img)
    # jxlinfo on the file
    info = jxlinfo.describe(out_jxl.read_bytes())
    assert "56x40" in info
    assert "Modular" in info


def test_cjxl_lossy_container_cli(tmp_path):
    yy, xx = np.mgrid[0:48, 0:64]
    img = np.stack([(xx * 3) % 256, (yy * 2 + 30) % 256,
                    ((xx + yy) * 2) % 256], axis=-1).astype(np.uint8)
    img = (img // 4 + 96).astype(np.uint8)  # smooth, photo-like range
    path = tmp_path / "in.png"
    save_image(path, img)
    from libjxl_tpu.tools import cjxl, djxl

    out_jxl = tmp_path / "out.jxl"
    out_png = tmp_path / "dec.png"
    assert cjxl.main([str(path), str(out_jxl), "-d", "2.0",
                      "--container"]) == 0
    assert is_container(out_jxl.read_bytes())
    assert djxl.main([str(out_jxl), str(out_png)]) == 0
    out = load_image(out_png)
    assert compute_psnr(img, out) > 30


def test_metrics_sanity(png_image):
    _, img = png_image
    assert compute_psnr(img, img) == float("inf")
    assert butteraugli_distance(img, img) == 0.0
    assert msssim_xyb(img, img) > 99.0
    noisy = np.clip(img.astype(int) + RNG.integers(-20, 20, img.shape),
                    0, 255).astype(np.uint8)
    assert butteraugli_distance(img, noisy) > 0.5
    assert compute_psnr(img, noisy) < 40


def test_quality_distance_mapping():
    from libjxl_tpu.tools.cjxl import quality_to_distance

    assert quality_to_distance(100) == 0.0
    assert abs(quality_to_distance(90) - 1.0) < 0.01
    assert quality_to_distance(50) > quality_to_distance(80)


def test_pgx_pfm_roundtrip(tmp_path):
    from libjxl_tpu.extras.io import load_image, save_image

    g = (np.arange(48, dtype=np.uint16) * 1200).reshape(6, 8, 1)
    p = tmp_path / "img.pgx"
    save_image(p, g)
    assert np.array_equal(load_image(p), g)
    f = np.random.default_rng(0).normal(0, 1, (5, 7, 3)).astype(np.float32)
    pf = tmp_path / "img.pfm"
    save_image(pf, f)
    assert np.array_equal(load_image(pf), f)


def test_nelder_mead_rosenbrock():
    from libjxl_tpu.tools.optimizer import nelder_mead

    def rosen(v):
        return (1 - v[0]) ** 2 + 100 * (v[1] - v[0] ** 2) ** 2

    x, fx = nelder_mead(rosen, [-1.2, 1.0], step=0.5, max_iter=400)
    assert fx < 1e-6
    assert abs(x[0] - 1) < 1e-2 and abs(x[1] - 1) < 1e-2


def test_optimizer_cli_fork_protocol(tmp_path):
    import os
    import stat

    from libjxl_tpu.tools.optimizer import main

    script = tmp_path / "objective.py"
    script.write_text(
        "#!" + os.environ.get("PYTEST_PYTHON", "/opt/venv/bin/python") + "\n"
        "import os\n"
        "x = float(os.environ['VAR0']); y = float(os.environ['VAR1'])\n"
        "print((x - 3) ** 2 + (y + 1) ** 2, 'optimized')\n")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    assert main([str(script), "2", "80", "--step", "1.0"]) == 0


def test_downsample2_sharper_beats_box():
    """The anti-ringing 12x12 kernel should reconstruct better than box
    through the full resampling=2 encode/decode path."""
    from libjxl_tpu.render.upsample import downsample2_sharper, downsample_box
    from libjxl_tpu.render.upsample import upsample as up

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:128, 0:128]
    img = (np.sin(xx / 5.0) * np.cos(yy / 7.0) * 0.4 + 0.5
           + rng.normal(0, 0.02, (128, 128)))
    for fn in (downsample2_sharper, lambda p: downsample_box(p, 2)):
        d = fn(img)
        assert d.shape == (64, 64)
    sh = upsample_err(img, downsample2_sharper(img))
    bx = upsample_err(img, downsample_box(img, 2))
    assert sh < bx


def upsample_err(orig, down):
    from libjxl_tpu.render.upsample import upsample

    rec = upsample(down, 2)[:orig.shape[0], :orig.shape[1]]
    return float(np.mean((rec - orig) ** 2))


def test_downsample2_iterative_beats_sharper():
    from libjxl_tpu.render.upsample import (
        downsample2_iterative,
        downsample2_sharper,
    )

    rng = np.random.default_rng(1)
    yy, xx = np.mgrid[0:96, 0:96]
    img = (np.sin(xx / 5.0) * np.cos(yy / 7.0) * 0.4 + 0.5
           + rng.normal(0, 0.02, (96, 96)))
    it = upsample_err(img, downsample2_iterative(img))
    sh = upsample_err(img, downsample2_sharper(img))
    assert it < sh


def test_upsample_clamps_to_support():
    """stage_upsampling.cc:139-150: upsampled samples stay within the
    5x5 support min/max — an isolated impulse cannot ring negative."""
    from libjxl_tpu.render.upsample import upsample

    imp = np.zeros((16, 16))
    imp[8, 8] = 1.0
    up = upsample(imp, 2)
    assert up.min() >= 0.0  # negative kernel lobes are clamped
    assert up.max() <= 1.0


def test_benchmark_other_codecs(png_image):
    from libjxl_tpu.tools.benchmark import run_config

    _path, img = png_image
    for cfg in ("png", "jpeg:q80"):
        res = run_config(img, cfg)
        assert res["bpp"] > 0
        assert "qabpp" in res and "pnorm" in res
    res = run_config(img, "m")
    assert res["psnr"] is None  # lossless: +inf encoded as null
