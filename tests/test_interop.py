"""Interop tests against the reference implementation (system libjxl).

The single most important test file: everything else in tests/ is a
self-roundtrip, which a symmetric encoder/decoder bug can pass. Here the
*reference decoder* must accept our streams and the *reference encoder's*
streams must decode identically to the reference's own decode.

Mirrors the conformance stance of tools/conformance/conformance.py:26-45
(RMSE + peak-error bounds) with bit-exactness for lossless paths.
"""

import io

import numpy as np
import pytest

from libjxl_tpu.api import codestream
from libjxl_tpu.extras import oracle

pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="no system libjxl")


def _rmse(a, b):
    a = a[:, :, :3].astype(np.float64)
    b = b[:, :, :3].astype(np.float64)
    return float(np.sqrt(((a - b) ** 2).mean()))


def _peak(a, b):
    return int(np.abs(a[:, :, :3].astype(np.int64)
                      - b[:, :, :3].astype(np.int64)).max())


def _test_image(h=96, w=128, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(xx * 255 // w), (yy * 255 // h),
                    ((xx + yy) * 255 // (h + w))], axis=-1).astype(np.uint8)
    img[h // 4:h // 2, w // 4:w // 2] = rng.integers(
        0, 256, (h // 4, w // 4, 3), dtype=np.uint8)
    return img


# ---------------------------------------------------------------- lossless

@pytest.mark.parametrize("effort", [1, 2, 3])
def test_our_lossless_oracle_decodes_bit_exact(effort):
    img = _test_image()
    data = codestream.encode_lossless(img, effort=effort)
    dec, info = oracle.decode(data)
    assert info["xsize"] == 128 and info["ysize"] == 96
    assert np.array_equal(dec, img)


def test_our_lossless_gray_oracle_bit_exact():
    img = _test_image()[:, :, 0]
    data = codestream.encode_lossless(img)
    dec, info = oracle.decode(data)
    assert info["num_color_channels"] == 1
    assert np.array_equal(dec[:, :, 0], img)


def test_our_lossless_alpha_oracle_bit_exact():
    img = _test_image()
    rgba = np.dstack([img, np.linspace(0, 255, 96 * 128).reshape(
        96, 128).astype(np.uint8)])
    data = codestream.encode_lossless(rgba)
    dec, info = oracle.decode(data)
    assert info["alpha_bits"] == 8
    assert np.array_equal(dec, rgba)


def test_our_lossless_16bit_oracle_bit_exact():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 65536, (48, 64, 3), dtype=np.uint16)
    img[:24] = (img[:24] // 257 * 257)  # mixed smooth-ish rows
    data = codestream.encode_lossless(img)
    dec, info = oracle.decode(data, pixel_type="uint16")
    assert info["bits_per_sample"] == 16
    assert np.array_equal(dec, img)


@pytest.mark.parametrize("effort,modular", [(3, True), (5, True), (7, True)])
def test_oracle_lossless_our_decoder_bit_exact(effort, modular):
    img = _test_image(seed=11)
    data = oracle.encode(img, lossless=True, effort=effort, modular=modular)
    dec, meta = codestream.decode(data)
    assert np.array_equal(dec[:, :, :3], img)


# ---------------------------------------------------------------- lossy

@pytest.mark.parametrize("distance", [0.5, 1.0, 2.0])
def test_our_lossy_oracle_decode_matches_ours(distance):
    """The reference decoder's view of our stream must match our own
    decoder's view (shared-bug detector)."""
    img = _test_image()
    data = codestream.encode_lossy(img, distance=distance, effort=5)
    ours, _ = codestream.decode(data)
    theirs, _ = oracle.decode(data)
    # float pipeline differences only: tight bounds (measured peak
    # is 1 u8 step across d0.5-d2; 2 leaves headroom for content)
    assert _rmse(ours, theirs) < 0.1, _rmse(ours, theirs)
    assert _peak(ours, theirs) <= 2


@pytest.mark.parametrize("effort", [3, 5, 7])
def test_oracle_lossy_our_decode_matches_oracle(effort):
    img = _test_image(seed=5)
    data = oracle.encode(img, distance=1.0, effort=effort)
    theirs, _ = oracle.decode(data)
    ours, _ = codestream.decode(data)
    assert _rmse(ours, theirs) < 0.1, _rmse(ours, theirs)
    assert _peak(ours, theirs) <= 2


def test_our_lossy_reconstruction_quality_parity():
    """Our encoder's stream, decoded by the reference, must be about as
    close to the original as the reference encoder's own stream."""
    img = _test_image(seed=9)
    ours = codestream.encode_lossy(img, distance=1.0, effort=5)
    ref = oracle.encode(img, distance=1.0, effort=5)
    q_ours = _rmse(oracle.decode(ours)[0], img)
    q_ref = _rmse(oracle.decode(ref)[0], img)
    assert q_ours < q_ref * 1.35 + 0.5, (q_ours, q_ref)


def test_all_dct8_modes_interop():
    """Every DCT8 frequency both directions (catches layout transposes)."""
    ys, xs = np.mgrid[0:8, 0:8]
    tiles = []
    for u, v in [(0, 1), (1, 0), (2, 5), (5, 2), (7, 1), (3, 6)]:
        tiles.append(np.cos((2 * ys + 1) * u * np.pi / 16)
                     * np.cos((2 * xs + 1) * v * np.pi / 16) * 40.0)
    img8 = np.clip(128 + sum(tiles), 0, 255).astype(np.uint8)
    img = np.stack([np.tile(img8, (4, 4))] * 3, axis=-1)
    data = codestream.encode_lossy(img, distance=1.0, effort=5)
    assert _rmse(oracle.decode(data)[0], codestream.decode(data)[0]) < 0.5
    data2 = oracle.encode(img, distance=1.0, effort=5)
    assert _rmse(codestream.decode(data2)[0], oracle.decode(data2)[0]) < 0.5


@pytest.mark.parametrize("strategy", range(27))
def test_every_ac_strategy_decodes_identically(strategy):
    """Force a uniform strategy map and require the reference decoder to
    reconstruct the same pixels we do (catches per-strategy coefficient
    layout and dequant-table orientation bugs for the whole zoo of
    ac_strategy.h:35-79 transforms)."""
    from libjxl_tpu.vardct import ac_strategy as acs
    from libjxl_tpu.vardct import frame as vf

    cx, cy = acs.COVERED_X[strategy], acs.COVERED_Y[strategy]
    n = max(cx, cy) * 8 * 2  # at least 2 tiles per axis
    n = max(n, 32)
    yy, xx = np.mgrid[0:n, 0:n]
    base = (np.sin(xx * 0.21) * 40 + np.cos(yy * 0.13) * 40
            + np.sin((xx + 2 * yy) * 0.07) * 30)
    img = np.clip(128 + base, 0, 255).astype(np.uint8)
    rgb = np.stack([img, 255 - img, np.roll(img, 3, axis=1)], axis=-1)

    def force(state, xyb, max_px=256, **kw):
        state.strategy[:, :] = strategy
        state.is_origin[:, :] = False
        for by in range(0, state.fd.ysize_blocks - cy + 1, cy):
            for bx in range(0, state.fd.xsize_blocks - cx + 1, cx):
                state.is_origin[by, bx] = True
        # cover any ragged edge with plain DCT8
        cov = np.zeros_like(state.is_origin, dtype=bool)
        for by in range(state.fd.ysize_blocks):
            for bx in range(state.fd.xsize_blocks):
                if state.is_origin[by, bx]:
                    cov[by:by + cy, bx:bx + cx] = True
        for by in range(state.fd.ysize_blocks):
            for bx in range(state.fd.xsize_blocks):
                if not cov[by, bx]:
                    state.strategy[by, bx] = acs.DCT
                    state.is_origin[by, bx] = True

    orig = vf._choose_ac_strategies
    vf._choose_ac_strategies = force
    try:
        data = codestream.encode_lossy(rgb, distance=1.0, effort=5)
    finally:
        vf._choose_ac_strategies = orig
    ours, _ = codestream.decode(data)
    theirs, _ = oracle.decode(data)
    assert _rmse(ours, theirs) < 0.6, \
        (acs.STRATEGY_NAMES[strategy], _rmse(ours, theirs), _peak(ours, theirs))


def test_noise_image_interop_both_directions():
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    ours = codestream.encode_lossy(img, distance=1.0, effort=5)
    assert _rmse(oracle.decode(ours)[0], codestream.decode(ours)[0]) < 0.5
    ref = oracle.encode(img, distance=1.0, effort=5)
    assert _rmse(codestream.decode(ref)[0], oracle.decode(ref)[0]) < 0.5


# ---------------------------------------------------------------- JPEG

def _make_jpeg(img):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=88)
    return buf.getvalue()


def test_our_jpeg_recompression_oracle_reconstructs():
    """Our JPEG-in-JXL stream must let the reference decoder reproduce the
    original JPEG bytes bit-exactly (dec_jpeg_data_writer parity)."""
    from libjxl_tpu.jpeg import recompress
    jpeg = _make_jpeg(_test_image(seed=21))
    jxl = recompress.recompress_jpeg_vardct(jpeg)
    rec, info = oracle.decode(jxl, want_jpeg=True)
    assert isinstance(rec, bytes)
    assert rec == jpeg


def test_oracle_jpeg_recompression_our_reconstruction():
    from libjxl_tpu.jpeg import recompress
    jpeg = _make_jpeg(_test_image(seed=23))
    jxl = oracle.encode_jpeg(jpeg)
    rec = recompress.reconstruct_jpeg(jxl)
    assert rec == jpeg


@pytest.mark.parametrize("effort", [8, 9])
def test_oracle_wp_lossless_bit_exact(effort):
    """High-effort reference lossless streams lean on the self-correcting
    Weighted predictor; the native WP decode path (context_predict.h
    analog in C) must reproduce them bit-exactly."""
    rng = np.random.default_rng(31)
    img = np.clip(np.cumsum(rng.normal(0, 3, (160, 192, 3)), axis=1)
                  + 128, 0, 255).astype(np.uint8)
    data = oracle.encode(img, lossless=True, effort=effort, modular=True)
    dec, _ = codestream.decode(data)
    assert np.array_equal(dec[:, :, :3], img)


def test_oracle_noise_synthesis_matches():
    """Noise synthesis parity (dec_noise.cc RandomImage + stage_noise.cc).

    Width deliberately NOT a multiple of 16: for 16-multiple widths the
    0.7-era oracle consumed one extra RNG batch per row (fixed upstream
    by 0.12, whose behavior we implement), so fields diverge there by
    design. Elsewhere synthesis must agree pixel-for-pixel up to u8
    rounding.
    """
    img = np.full((130, 130, 3), 128, np.uint8)
    noisy = oracle.encode(img, distance=0.5, effort=5,
                          photon_noise_iso=1600.0)
    odec, _ = oracle.decode(noisy)
    ours, _ = codestream.decode(noisy)
    diff = np.abs(odec.astype(np.int32) - ours[:, :, :3].astype(np.int32))
    assert diff.max() <= 2
    assert diff.mean() < 0.05
    # and the noise is real: the field must differ from the flat base
    base, _ = oracle.decode(oracle.encode(img, distance=0.5, effort=5))
    field = odec.astype(np.float32) - base.astype(np.float32)
    assert field.std() > 0.2


def test_tiny_images_decode_oracle_exact():
    """Images smaller than their block padding exercise the frame-edge
    mirror (mirror_fill_padding); the reference decoder must agree
    exactly (a slice-binding bug here used to copy pre-mirror padding
    into the filter windows)."""
    rng = np.random.default_rng(5)
    for h, w in [(2, 2), (3, 9), (4, 4), (6, 20)]:
        img = np.clip(rng.normal(128, 40, (h, w, 3)), 0,
                      255).astype(np.uint8)
        data = codestream.encode_lossy(img, distance=1.0, effort=3,
                                       device=False)
        ours, _ = codestream.decode(data, device=False)
        theirs, _ = oracle.decode(data)
        assert np.array_equal(ours[:, :, :3], theirs[:, :, :3]), (h, w)


@pytest.mark.parametrize("distance", [0.5, 1.0, 2.0])
def test_oracle_lossy_modular_our_decode(distance):
    """Lossy-modular (XYB-coded modular) main frames: ints are YX(B-Y)
    scaled by the DC quants (dec_modular.cc:553-600); our decode must
    track the reference decoder within u8 rounding."""
    img = _test_image(seed=13)
    data = oracle.encode(img, distance=distance, effort=5, modular=True)
    theirs, _ = oracle.decode(data)
    ours, _ = codestream.decode(data)
    assert _peak(ours, theirs) <= 1
    assert _rmse(ours, theirs) < 0.05


def test_preview_stream_oracle_decodes():
    """Preview frames are non-last zero-duration frames: per
    CanBeReferenced (frame_header.h:373-379) they carry the
    save_before_color_transform bool even with save_as_reference == 0.
    Regression: a 1-bit desync here made the reference reject every
    preview stream we emitted."""
    img = _test_image()
    data = codestream.encode_lossy(img, distance=1.0, effort=3,
                                   preview=32)
    theirs, info = oracle.decode(data)
    ours, _ = codestream.decode(data)
    assert _peak(ours, theirs) <= 2
