"""Device render of YCbCr (JPEG-transcoded) frames: 420/422 via the
subsampled program, 444 via the same lean path (api/tpu_codec.py
_render_subsampled_device; ops/pipeline.py decode_render_subsampled —
dec_group.cc:569 quant-from-luma + stage_chroma_upsampling +
stage_ycbcr roles)."""

import io

import numpy as np
import pytest

from libjxl_tpu.api.codestream import decode
from libjxl_tpu.io.container import extract_codestream

PIL = pytest.importorskip("PIL.Image")


def _jpeg_stream(subsampling, quality=80, h=300, w=280):
    from PIL import Image

    from libjxl_tpu.jpeg.recompress import recompress_jpeg_vardct

    rng = np.random.default_rng(1)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.clip(np.stack([120 + 70 * np.sin(xx / 19),
                            110 + 60 * np.cos(yy / 23),
                            130 + 50 * np.sin((xx + yy) / 31)], -1)
                  + rng.normal(0, 3, (h, w, 3)), 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=quality,
                              subsampling=subsampling)
    return extract_codestream(recompress_jpeg_vardct(buf.getvalue()))


@pytest.mark.parametrize("subsampling", ["4:2:0", "4:2:2", "4:4:4"])
def test_jpeg_transcode_decodes_on_device(subsampling):
    stream = _jpeg_stream(subsampling)
    host, _ = decode(stream, device=False)
    info = {}
    dev, _ = decode(stream, device=True, decode_info=info)
    assert info["path"] == "device:u8-ycbcr", info
    # float32 device math vs float64 host math: at most 1 u8 step
    assert np.abs(host.astype(int) - dev.astype(int)).max() <= 1


def test_device_ycbcr_odd_dimensions():
    stream = _jpeg_stream("4:2:0", h=251, w=333)
    host, _ = decode(stream, device=False)
    info = {}
    dev, _ = decode(stream, device=True, decode_info=info)
    assert info["path"] == "device:u8-ycbcr", info
    assert dev.shape == host.shape
    assert np.abs(host.astype(int) - dev.astype(int)).max() <= 1
