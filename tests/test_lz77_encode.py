"""LZ77 (RLE) encode search (ApplyLZ77_RLE, enc_ans.cc:931-1001)."""

import numpy as np

from libjxl_tpu.api.codestream import (
    CodecMetadata,
    SizeHeader,
    decode,
    write_codestream_header,
)
from libjxl_tpu.api.frame import (
    ModularEncOptions,
    encode_modular_frame,
    make_modular_frame_header,
)
from libjxl_tpu.entropy.decode import ANSSymbolReader, decode_histograms
from libjxl_tpu.entropy.encode import (
    Token,
    build_and_encode_histograms,
    write_tokens,
)
from libjxl_tpu.io.bits import BitReader, BitWriter


def test_rle_token_stream_roundtrip():
    rng = np.random.default_rng(0)
    vals = []
    for _ in range(200):
        v = int(rng.integers(0, 8))
        vals.extend([v] * int(rng.integers(1, 60)))
    tokens = [Token(0, v) for v in vals]

    w_plain = BitWriter()
    codes, cmap = build_and_encode_histograms([tokens], 1, w_plain)
    write_tokens(tokens, codes, cmap, w_plain)

    w_rle = BitWriter()
    codes, cmap = build_and_encode_histograms([tokens], 1, w_rle,
                                              lz77_method="rle")
    assert codes.lz77.enabled
    write_tokens(codes.lz77_tokens[0], codes, cmap, w_rle)
    assert len(w_rle.get_bytes()) < 0.3 * len(w_plain.get_bytes())

    r = BitReader(w_rle.get_bytes())
    code, dmap = decode_histograms(r, 1)
    reader = ANSSymbolReader(code, r)
    out = [reader.read_hybrid_uint(0, r, dmap) for _ in range(len(vals))]
    assert reader.check_final_state()
    assert out == vals


def _encode_image(img, lz77):
    meta = CodecMetadata()
    meta.size = SizeHeader().set(img.shape[1], img.shape[0])
    meta.m.all_default = False
    meta.m.xyb_encoded = False
    w = BitWriter()
    write_codestream_header(w, meta)
    fh = make_modular_frame_header(meta)
    chans = [img[:, :, c].astype(np.int32) for c in range(img.shape[2])]
    encode_modular_frame(w, chans, fh,
                         ModularEncOptions(lz77=lz77, try_palette=False,
                                           color_transform=None))
    return w.get_bytes()


def test_rle_modular_frame():
    """Mixed noise+flat content: RLE must trigger (distance symbol 1,
    modular readers have a distance multiplier) and stay bit-exact."""
    rng = np.random.default_rng(1)
    img = np.zeros((256, 256, 3), np.uint8)
    img[:150] = rng.integers(0, 256, (150, 256, 3))
    img[150:] = 77
    plain = _encode_image(img, lz77=False)
    rle = _encode_image(img, lz77=True)
    assert len(rle) < len(plain)
    out, _ = decode(rle)
    np.testing.assert_array_equal(out, img)


def test_rle_not_forced_when_unhelpful():
    """ANS already codes zero-runs well; acceptance must decline."""
    img = np.full((128, 128, 3), 42, np.uint8)
    plain = _encode_image(img, lz77=False)
    rle = _encode_image(img, lz77=True)
    out, _ = decode(rle)
    np.testing.assert_array_equal(out, img)
    assert len(rle) <= len(plain) + 8


def test_lz77_chain_beats_rle_on_repetitive_content():
    """Hash-chain match search (enc_ans.cc kLZ77 analog) must win over
    the RLE-only transform on screenshot-style tiled content and stay
    decodable (including by the reference decoder when present)."""
    import numpy as np

    from libjxl_tpu.api import codestream

    rng = np.random.default_rng(4)
    tile = rng.integers(0, 256, (8, 32, 3), dtype=np.uint8)
    img = np.tile(tile, (8, 4, 1))
    e7 = codestream.encode_lossless(img, effort=7)
    e3 = codestream.encode_lossless(img, effort=3)
    assert len(e7) < len(e3)
    dec, _ = codestream.decode(e7)
    assert np.array_equal(dec[:, :, :3], img)
    from libjxl_tpu.extras import oracle

    if oracle.available():
        od, _ = oracle.decode(e7)
        assert np.array_equal(od[:, :, :3], img)
