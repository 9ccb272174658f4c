"""ICC codec tests (reference analog: icc_codec_test.cc)."""

import numpy as np
import pytest

from libjxl_tpu.io.bits import BitReader, BitWriter
from libjxl_tpu.io.icc import (
    icc_context,
    predict_icc,
    read_icc,
    unpredict_icc,
    write_icc,
)


def srgb_profile() -> bytes:
    ImageCms = pytest.importorskip("PIL.ImageCms")
    return ImageCms.ImageCmsProfile(ImageCms.createProfile("sRGB")).tobytes()


def synthetic_monitor_profile() -> bytes:
    """Hand-built RGB monitor profile exercising the tag-list fast paths
    (rXYZ/gXYZ/bXYZ triple, TRC curves, desc/wtpt/cprt)."""
    ntags = 9
    taglist = []
    body = b""
    header_size = 128 + 4 + 12 * ntags

    def add(tag, payload):
        nonlocal body
        taglist.append((tag, header_size + len(body), len(payload)))
        body += payload

    desc = b"desc" + bytes(4) + bytes(8) + b"test monitor profile\0" + bytes(57)
    add(b"desc", desc)
    add(b"wtpt", b"XYZ " + bytes(4) + bytes.fromhex(
        "0000f6d6000100000000d32d"))
    for t, xyz in ((b"rXYZ", "00006fa2000038f500000390"),
                   (b"gXYZ", "000062990000b78500000bbc"),
                   (b"bXYZ", "000024a000000f840000b6c4")):
        add(t, b"XYZ " + bytes(4) + bytes.fromhex(xyz))
    # shared gamma curve with 64 16-bit entries (curv fast path needs >16)
    curve = (np.linspace(0, 65535, 64).astype(">u2")).tobytes()
    curv = b"curv" + bytes(4) + (64).to_bytes(4, "big") + curve
    start = header_size + len(body)
    body += curv
    for t in (b"rTRC", b"gTRC", b"bTRC"):
        taglist.append((t, start, len(curv)))
    add(b"cprt", b"text" + bytes(4) + b"no copyright\0\0\0\0")

    size = header_size + len(body)
    header = bytearray(128)
    header[0:4] = size.to_bytes(4, "big")
    header[4:8] = b"lcms"
    header[8:12] = bytes([4, 48, 0, 0])
    header[12:16] = b"mntr"
    header[16:20] = b"RGB "
    header[20:24] = b"XYZ "
    header[36:40] = b"acsp"
    header[68:80] = bytes.fromhex("0000f6d6000100000000d32d")
    out = bytes(header) + ntags.to_bytes(4, "big")
    for tag, off, ln in taglist:
        out += tag + off.to_bytes(4, "big") + ln.to_bytes(4, "big")
    return out + body


@pytest.mark.parametrize("profile", ["srgb", "synthetic"])
def test_predict_unpredict_roundtrip(profile):
    icc = srgb_profile() if profile == "srgb" else synthetic_monitor_profile()
    enc = predict_icc(icc)
    assert unpredict_icc(enc) == icc


def test_predict_roundtrip_random_bytes():
    # The encoder must accept ANY byte stream (enc_icc_codec.cc:58-60)
    rng = np.random.default_rng(0)
    for n in (0, 1, 17, 128, 129, 400, 2000):
        blob = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert unpredict_icc(predict_icc(blob)) == blob


def test_predict_roundtrip_tiny_header_only():
    icc = bytes(range(100))
    assert unpredict_icc(predict_icc(icc)) == icc


def test_icc_context_range():
    ctxs = {icc_context(i, b1, b2) for i in (0, 128, 129, 4000)
            for b1 in range(0, 256, 17) for b2 in range(0, 256, 13)}
    assert min(ctxs) == 0
    assert max(ctxs) < 41


def test_bitstream_roundtrip_and_compression():
    icc = srgb_profile()
    w = BitWriter()
    write_icc(icc, w)
    data = w.get_bytes()
    got = read_icc(BitReader(data))
    assert got == icc
    # entropy-coded form should beat the raw profile for a real profile
    assert len(data) < len(icc)


def test_bitstream_roundtrip_synthetic():
    icc = synthetic_monitor_profile()
    w = BitWriter()
    write_icc(icc, w)
    assert read_icc(BitReader(w.get_bytes())) == icc


def test_codestream_embeds_icc():
    from libjxl_tpu.api.codestream import decode, encode_lossless

    icc = synthetic_monitor_profile()
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
    data = encode_lossless(img, icc=icc)
    out, meta = decode(data)
    assert np.array_equal(out.squeeze(), img)
    assert meta.m.color_encoding.want_icc
    assert meta.m.color_encoding.icc == icc
