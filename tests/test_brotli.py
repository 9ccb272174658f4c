"""Brotli codec (RFC 7932) + brob container boxes.

The pure-Python subset decoder is cross-validated against streams
produced by the system libbrotli encoder when available."""

import numpy as np
import pytest

from libjxl_tpu.base.status import JXLError
from libjxl_tpu.io.brotli import (
    _load_system_brotli,
    brotli_compress,
    brotli_decode,
    brotli_decompress,
    brotli_store,
)
from libjxl_tpu.io.container import extract_metadata, wrap_codestream


@pytest.mark.parametrize("n", [0, 1, 10, 1000, 70000])
def test_store_mode_roundtrip(n):
    rng = np.random.default_rng(n)
    data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
    enc = brotli_store(data)
    assert brotli_decode(enc) == data
    # store mode must also decode with the full decoder (system lib when
    # present)
    assert brotli_decompress(enc) == data


def _have_system_brotli():
    import libjxl_tpu.io.brotli as B

    _load_system_brotli()
    return B._enc_lib is not None


@pytest.mark.skipif(not _have_system_brotli(),
                    reason="system libbrotli unavailable")
def test_python_decoder_vs_libbrotli():
    """The subset decoder must decode real libbrotli streams that avoid
    the static dictionary (repetitive binary + incompressible data)."""
    rng = np.random.default_rng(0)
    cases = [
        b"abcabcabcabcabcabcabcabcabcabc",
        bytes(rng.integers(0, 256, 64, dtype=np.uint8)) * 300,
        b"\x00" * 5000,
        bytes(rng.integers(0, 256, 3000, dtype=np.uint8)),
    ]
    for data in cases:
        for q in (1, 5, 9):
            enc = brotli_compress(data, quality=q)
            assert brotli_decode(enc) == data


def test_dictionary_reference_is_clean_error():
    if not _have_system_brotli():
        pytest.skip("system libbrotli unavailable")
    # ASCII text at high quality uses the static dictionary
    text = b"the quick brown fox jumps over the lazy dog " * 50
    enc = brotli_compress(text, quality=11)
    try:
        out = brotli_decode(enc)
        assert out == text  # some encodes avoid the dictionary entirely
    except JXLError as e:
        assert "dictionary" in str(e) or "context" in str(e)
    # the full decoder always handles it
    assert brotli_decompress(enc) == text


def test_brob_container_boxes():
    exif = b"II*\x00" + b"\x01" * 300
    xml = b"<x:xmpmeta>" + b"hello world " * 50 + b"</x:xmpmeta>"
    plain = wrap_codestream(b"\xff\x0a x", exif=exif, xml=xml)
    comp = wrap_codestream(b"\xff\x0a x", exif=exif, xml=xml,
                           compress_boxes=True)
    for data in (plain, comp):
        meta = extract_metadata(data)
        assert meta["exif"] == exif
        assert meta["xml"] == [xml]
    assert len(comp) < len(plain)
