"""Patch dictionary tests (reference analog: patch_dictionary_test.cc)."""

import numpy as np

from libjxl_tpu.io.bits import BitReader, BitWriter
from libjxl_tpu.render.patches import (
    BLEND_ADD,
    BLEND_REPLACE,
    PatchBlending,
    PatchPosition,
    PatchReferencePosition,
    PatchesState,
    apply_patches,
    decode_patches,
    encode_patches,
    get_references,
)


def make_state():
    st = PatchesState()
    st.ref_positions = [PatchReferencePosition(0, 2, 3, 8, 6),
                        PatchReferencePosition(0, 0, 0, 4, 4)]
    st.positions = [PatchPosition(10, 12, 0), PatchPosition(30, 12, 0),
                    PatchPosition(5, 40, 1)]
    st.blendings = [[PatchBlending(BLEND_ADD)],
                    [PatchBlending(BLEND_ADD)],
                    [PatchBlending(BLEND_REPLACE)]]
    return st


def test_patches_entropy_roundtrip():
    st = make_state()
    w = BitWriter()
    encode_patches(st, w)
    ref = [np.zeros((3, 16, 16))]
    got = decode_patches(BitReader(w.get_bytes()), 64, 64, 0, ref)
    assert [(r.ref, r.x0, r.y0, r.xsize, r.ysize) for r in got.ref_positions] \
        == [(r.ref, r.x0, r.y0, r.xsize, r.ysize) for r in st.ref_positions]
    assert [(p.x, p.y, p.ref_pos_idx) for p in got.positions] \
        == [(p.x, p.y, p.ref_pos_idx) for p in st.positions]
    assert [b[0].mode for b in got.blendings] \
        == [b[0].mode for b in st.blendings]
    assert get_references(got) == 1


def test_apply_patches_add_and_subtract():
    st = make_state()
    rng = np.random.default_rng(0)
    ref = [rng.normal(size=(3, 16, 16))]
    img = rng.normal(size=(3, 64, 64))
    orig = img.copy()
    apply_patches(img, st, ref, add=True)
    assert not np.allclose(img, orig)
    # add patch content at (10,12)
    assert np.allclose(img[:, 12:18, 10:18] - orig[:, 12:18, 10:18],
                       ref[0][:, 3:9, 2:10])
    # replace at (5,40)
    assert np.allclose(img[:, 40:44, 5:9], ref[0][:, 0:4, 0:4])


def test_end_to_end_patches_roundtrip():
    from libjxl_tpu.api.codestream import decode, encode_with_patches

    rng = np.random.default_rng(1)
    # background
    img = np.full((96, 96, 3), 110, dtype=np.uint8)
    img += rng.integers(0, 5, img.shape).astype(np.uint8)
    # a "glyph" sheet: bright blob
    sheet = np.full((32, 32, 3), 110, dtype=np.uint8)
    yy, xx = np.mgrid[0:16, 0:16]
    blob = (80 * np.exp(-((yy - 8) ** 2 + (xx - 8) ** 2) / 18)).astype(int)
    for c in range(3):
        sheet[:16, :16, c] = np.clip(110 + blob, 0, 255)
    # final image contains the glyph (minus background level) at 3 spots
    final = img.astype(int).copy()
    for (x, y) in [(8, 8), (40, 40), (70, 20)]:
        final[y:y + 16, x:x + 16] += (
            sheet[:16, :16].astype(int) - 110)
    final = np.clip(final, 0, 255).astype(np.uint8)

    placements = [(0, 0, 16, 16, [(8, 8), (40, 40), (70, 20)])]
    data = encode_with_patches(final, sheet, placements, distance=1.0)
    out, _ = decode(data)
    assert out.shape == final.shape
    mse = np.mean((out.astype(float) - final.astype(float)) ** 2)
    psnr = 10 * np.log10(255 ** 2 / mse)
    assert psnr > 26, psnr
