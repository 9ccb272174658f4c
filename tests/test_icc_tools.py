"""ICC analysis + small conversion tools."""

import struct

import numpy as np
import pytest

from libjxl_tpu.io.icc_analyze import analyze_icc


def _pil_srgb():
    from PIL import ImageCms

    return ImageCms.ImageCmsProfile(ImageCms.createProfile("sRGB")).tobytes()


def test_srgb_profile_detected():
    info = analyze_icc(_pil_srgb())
    assert info["description"] == "RGB_D65_SRG_Rel_SRG"
    assert info["primaries"] == "srgb"


def test_truncated_profile_rejected():
    from libjxl_tpu.base.status import JXLError

    with pytest.raises(JXLError):
        analyze_icc(b"\x00" * 40)


def test_cicp_tag_wins():
    # minimal profile: header + tag table with one cicp tag (PQ/2020)
    cicp = b"cicp" + b"\x00" * 4 + bytes([9, 16, 0, 1])
    hdr = bytearray(132)
    hdr[16:20] = b"RGB "
    hdr[128:132] = struct.pack(">I", 1)
    tag_entry = b"cicp" + struct.pack(">II", 144, len(cicp))
    icc = bytes(hdr[:132]) + tag_entry + cicp
    info = analyze_icc(icc)
    assert info["primaries"] == "rec2020"
    assert info["transfer"] == "PQ"
    assert info["description"] == "RGB_D65_202_Rel_PQ"


def test_icc_simplify_cli(tmp_path):
    from PIL import Image

    from libjxl_tpu.tools.icc_simplify import main

    img = Image.fromarray(np.full((8, 8, 3), 99, np.uint8))
    p = tmp_path / "t.png"
    img.save(p, icc_profile=_pil_srgb())
    out = tmp_path / "o.png"
    assert main([str(p), str(out)]) == 0
    assert out.exists()
    assert Image.open(out).info.get("icc_profile") is None


def test_decode_and_encode_cli(tmp_path):
    from libjxl_tpu.extras.io import load_image, save_image
    from libjxl_tpu.tools.decode_and_encode import main

    img = (np.arange(192, dtype=np.uint8) % 251).reshape(8, 8, 3)
    src = tmp_path / "a.ppm"
    save_image(src, img)
    jxl = tmp_path / "a.jxl"
    back = tmp_path / "b.ppm"
    assert main([str(src), str(jxl)]) == 0
    assert main([str(jxl), str(back)]) == 0
    assert np.array_equal(load_image(back), img)
