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


def _screenshot_image():
    img = np.full((160, 240, 3), 230, np.uint8)
    glyph = np.zeros((7, 5), bool)
    glyph[0, :] = glyph[:, 0] = glyph[3, :3] = True
    for (gy, gx) in [(20, 30), (20, 60), (50, 30), (50, 90),
                     (90, 120), (90, 160), (120, 40), (120, 200)]:
        img[gy:gy + 7, gx:gx + 5][glyph] = (20, 30, 180)
    return img


def test_find_text_patches_detects_glyphs():
    from libjxl_tpu.ops.xyb import linear_rgb_to_xyb, srgb_to_linear
    from libjxl_tpu.render.patches import find_text_patches

    img = _screenshot_image()
    xyb = linear_rgb_to_xyb(np.moveaxis(
        srgb_to_linear(img.astype(np.float64) / 255.0), -1, 0))
    res = find_text_patches(xyb)
    assert res is not None
    sheet, placements = res
    # one unique glyph, all eight occurrences found
    assert len(placements) == 1
    sx, sy, pw, ph, poses = placements[0]
    assert (pw, ph) == (5, 7)
    assert len(poses) == 8
    # photographic content must NOT trigger the detector
    rng = np.random.default_rng(3)
    photo = np.clip(rng.normal(128, 30, (96, 96, 3)), 0, 255) \
        .astype(np.uint8)
    pxyb = linear_rgb_to_xyb(np.moveaxis(
        srgb_to_linear(photo.astype(np.float64) / 255.0), -1, 0))
    assert find_text_patches(pxyb) is None


def test_text_patches_end_to_end():
    from libjxl_tpu.api.codestream import decode, encode_lossy

    img = _screenshot_image()
    with_p = encode_lossy(img, distance=1.0, effort=7)
    without = encode_lossy(img, distance=1.0, effort=6)
    out, _ = decode(with_p)
    err = np.abs(out[:, :, :3].astype(np.int32) - img.astype(np.int32))
    assert err.mean() < 0.05
    assert err.max() <= 16
    # the dictionary must pay for itself on repeated glyphs
    assert len(with_p) < len(without)
