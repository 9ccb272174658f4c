"""Appendix-E API parity: preview frames, gain map bundle, standalone
compressed ICC, jxl_from_tree."""

import numpy as np

from libjxl_tpu.api.codestream import decode, decode_preview, encode_lossy
from libjxl_tpu.extras.gain_map import (
    GainMapBundle,
    icc_profile_decode,
    icc_profile_encode,
    read_gain_map_bundle,
    write_gain_map_bundle,
)


def smooth(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 3))
    for i in range(3):
        img[:, :, i] = 128 + 80 * np.sin(xx / 17 + i) * np.cos(yy / 23 - i)
    img += rng.normal(0, 3, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def test_preview_frame():
    img = smooth(300, 260)
    data = encode_lossy(img, distance=1.0, preview=64)
    pv, meta = decode_preview(data)
    assert meta.m.have_preview
    assert pv is not None and max(pv.shape[:2]) <= 80
    # main image still decodes correctly after the preview frame
    out, _ = decode(data)
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int)).mean()
    assert err < 6.0
    # preview resembles the downscaled original
    scale = img.shape[0] // pv.shape[0]
    small = img[:pv.shape[0] * scale, :pv.shape[1] * scale].reshape(
        pv.shape[0], scale, pv.shape[1], scale, 3).mean(axis=(1, 3))
    assert np.abs(small - pv.astype(float)).mean() < 16.0


def test_no_preview_returns_none():
    img = smooth(64, 64)
    data = encode_lossy(img, distance=1.0)
    pv, meta = decode_preview(data)
    assert pv is None and not meta.m.have_preview


def test_gain_map_bundle_roundtrip():
    gm_stream = encode_lossy(smooth(64, 64, 5), distance=3.0)
    icc = b"\x00\x00\x02\x00" + bytes(range(256)) * 2
    b = GainMapBundle(jhgm_version=1, gain_map_metadata=b"xmp-meta",
                      alt_icc=icc_profile_encode(icc), gain_map=gm_stream)
    blob = write_gain_map_bundle(b)
    b2 = read_gain_map_bundle(blob)
    assert b2.jhgm_version == 1
    assert b2.gain_map_metadata == b"xmp-meta"
    assert b2.gain_map == gm_stream
    assert icc_profile_decode(b2.alt_icc) == icc
    img, _ = decode(b2.gain_map)
    assert img.shape == (64, 64, 3)


def test_jxl_from_tree(tmp_path):
    from libjxl_tpu.tools.jxl_from_tree import build_codestream, \
        parse_tree_file

    spec = parse_tree_file("""
    RCT 6
    Width 128 Height 96 Bitdepth 8
    if c > 0
      - Set 7
      if x > 63
        - Set 255
        if y > 48
          - Gradient + 2
          - Set 0
    """)
    data = build_codestream(spec)
    assert len(data) < 128  # the tree IS the image
    img, _ = decode(data)
    assert img.shape == (96, 128, 3)
    assert len(np.unique(img)) > 1


def test_orientation_applied_on_decode():
    """ImageMetadata.orientation (1-8) is applied by the decoder
    (dec_external_image orientation handling)."""
    from libjxl_tpu.api.codestream import encode_lossless
    from libjxl_tpu.extras.exif import apply_orientation

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (40, 60, 3)).astype(np.uint8)
    for o in range(1, 9):
        data = encode_lossless(img, orientation=o)
        out, meta = decode(data)
        assert meta.m.orientation == o
        np.testing.assert_array_equal(out, apply_orientation(img, o))


def test_exif_orientation_helpers():
    import struct

    from libjxl_tpu.extras.exif import (
        get_exif_orientation,
        reset_exif_orientation,
    )

    exif = (b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 1)
            + struct.pack("<HHI", 0x112, 3, 1) + struct.pack("<HH", 6, 0)
            + struct.pack("<I", 0))
    assert get_exif_orientation(exif) == 6
    assert get_exif_orientation(reset_exif_orientation(exif)) == 1
    assert get_exif_orientation(b"junk") == 1
