"""JPEG parse / bit-exact rewrite / pixel decode tests (reference analog:
jpeg data reader/writer tests)."""

import io

import numpy as np
import pytest

from libjxl_tpu.jpeg import jpeg_to_pixels, parse_jpeg, write_jpeg

PIL = pytest.importorskip("PIL.Image")


def make_jpeg_bytes(img, quality=85, subsampling=-1):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=quality,
                              subsampling=subsampling)
    return buf.getvalue()


def photo(h=64, w=80, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 120 + 60 * np.sin(xx / 13.0) * np.cos(yy / 11.0)
    img = np.stack([base + rng.normal(0, 6, (h, w)) for _ in range(3)],
                   axis=-1)
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("subsampling", [0, 2])  # 4:4:4 and 4:2:0
def test_jpeg_bit_exact_rewrite(subsampling):
    data = make_jpeg_bytes(photo(), quality=80, subsampling=subsampling)
    jd = parse_jpeg(data)
    out = write_jpeg(jd)
    assert out == data


def test_jpeg_rewrite_with_restarts():
    from PIL import Image

    img = photo(48, 64, seed=1)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=75, restart_marker_blocks=2)
    data = buf.getvalue()
    jd = parse_jpeg(data)
    assert write_jpeg(jd) == data


def test_jpeg_pixel_decode_matches_pil():
    from PIL import Image

    data = make_jpeg_bytes(photo(seed=2), quality=90, subsampling=0)
    jd = parse_jpeg(data)
    ours = jpeg_to_pixels(jd)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    # IDCT/rounding differences of a couple of code values are expected
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.mean() < 1.5
    assert np.percentile(diff, 99) <= 4


def test_jpeg_grayscale():
    img = photo(seed=3)[:, :, 0]
    data = make_jpeg_bytes(img, quality=85)
    jd = parse_jpeg(data)
    assert write_jpeg(jd) == data
    pix = jpeg_to_pixels(jd)
    assert pix.shape == (64, 80, 1)


def test_jpeg_recompression_roundtrip_and_cli(tmp_path):
    from libjxl_tpu.jpeg.recompress import recompress_jpeg, reconstruct_jpeg
    from libjxl_tpu.tools import cjxl, djxl

    data = make_jpeg_bytes(photo(128, 128, seed=9), quality=80, subsampling=2)
    rc = recompress_jpeg(data)
    assert reconstruct_jpeg(rc) == data
    # CLI path
    src = tmp_path / "in.jpg"
    src.write_bytes(data)
    out = tmp_path / "out.jxl"
    back = tmp_path / "back.jpg"
    assert cjxl.main([str(src), str(out), "-v"]) == 0
    assert djxl.main([str(out), str(back), "-v"]) == 0
    assert back.read_bytes() == data


def test_jpeg_recompression_shrinks_realistic_file():
    rng = np.random.default_rng(10)
    yy, xx = np.mgrid[0:256, 0:256]
    base = 120 + 60 * np.sin(xx / 13.0) * np.cos(yy / 11.0)
    img = np.clip(np.stack([base + rng.normal(0, 6, (256, 256))
                            for _ in range(3)], -1), 0, 255).astype(np.uint8)
    data = make_jpeg_bytes(img, quality=85, subsampling=2)
    from libjxl_tpu.jpeg.recompress import recompress_jpeg

    rc = recompress_jpeg(data)
    assert len(rc) < len(data)


@pytest.mark.parametrize("subsampling", [0, 1, 2])
def test_vardct_transcode_bit_exact(subsampling):
    """JPEG -> real VarDCT YCbCr frame -> bit-exact JPEG
    (ComputeJPEGTranscodingData analog)."""
    from libjxl_tpu.jpeg.recompress import (
        reconstruct_jpeg,
        recompress_jpeg_vardct,
    )

    data = make_jpeg_bytes(photo(120, 152), quality=80,
                           subsampling=subsampling)
    rec = recompress_jpeg_vardct(data)
    assert reconstruct_jpeg(rec) == data


def test_vardct_transcode_viewable():
    """The transcoded stream is a plain decodable codestream."""
    from libjxl_tpu.api.codestream import decode
    from libjxl_tpu.io.container import parse_boxes
    from libjxl_tpu.jpeg import jpeg_to_pixels, parse_jpeg
    from libjxl_tpu.jpeg.recompress import recompress_jpeg_vardct

    img = photo(96, 120)
    data = make_jpeg_bytes(img, quality=85, subsampling=2)
    rec = recompress_jpeg_vardct(data)
    stream = dict((t, p) for t, p, _ in parse_boxes(rec[12:]))[b"jxlc"]
    out, _ = decode(stream)
    ref = jpeg_to_pixels(parse_jpeg(data))
    assert np.abs(out.astype(float) - ref.astype(float)).mean() < 2.0


def test_progressive_jpeg_recompression():
    """Progressive (SOF2) JPEG parse + bit-exact reconstruction through
    the full jbrd pipeline (enc_jpeg_data_reader/dec_jpeg_data_writer
    progressive modes), with and without restart markers."""
    import io

    from PIL import Image

    from libjxl_tpu.jpeg import recompress
    from libjxl_tpu.jpeg.data import parse_jpeg

    img = photo(120, 200, seed=3)
    for kw in (dict(progressive=True),
               dict(progressive=True, restart_marker_blocks=2)):
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=85, **kw)
        jpeg = buf.getvalue()
        jd = parse_jpeg(jpeg)
        assert jd.progressive
        assert len(jd.scans) > 2
        jxl = recompress.recompress_jpeg_vardct(jpeg)
        assert len(jxl) < len(jpeg)
        assert recompress.reconstruct_jpeg(jxl) == jpeg
