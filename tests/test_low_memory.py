"""Bounded-memory group-at-a-time decode (vardct/low_memory.py;
reference low_memory_render_pipeline.{h,cc}, dec_group_border.h)."""

import numpy as np
import pytest

from libjxl_tpu.api import codestream
from libjxl_tpu.base.status import JXLError


def _image(h, w, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(yy * 0.4 + xx * 0.1) % 256, (xx * 0.6) % 256,
                    ((yy - xx) * 0.3) % 256], -1)
    return np.clip(img + rng.normal(0, 6, (h, w, 3)), 0,
                   255).astype(np.uint8)


def _assemble(stream):
    out, h = [], 0
    for y0, rows in codestream.decode_rows(stream):
        assert y0 == h  # strips arrive in order, no gaps
        out.append(rows)
        h += rows.shape[0]
    return np.concatenate(out, axis=0)


@pytest.mark.parametrize("h,w,d", [
    (600, 520, 1.0),    # multi-strip, odd width
    (256, 256, 2.0),    # exactly one group
    (64, 48, 1.0),      # single-section special case
    (257, 1030, 1.5),   # padding rows and columns
])
def test_strips_match_whole_image(h, w, d):
    img = _image(h, w)
    stream = codestream.encode_lossy(img, distance=d, effort=3,
                                     device=False)
    ref, _ = codestream.decode(stream, device=False)
    out = _assemble(stream)
    assert out.shape == ref[:, :, :3].shape
    assert np.array_equal(ref[:, :, :3], out)


def test_strips_match_with_noise():
    img = _image(700, 300)
    stream = codestream.encode_lossy(img, distance=1.0, effort=3,
                                     device=False, photon_noise_iso=1600)
    ref, _ = codestream.decode(stream, device=False)
    assert np.array_equal(ref[:, :, :3], _assemble(stream))


@pytest.mark.parametrize("passes", [2, 3])
def test_strips_match_progressive(passes):
    """All passes of a group row entropy-decode before the row renders
    (the dec_frame.cc pass loop, strip-scheduled)."""
    img = _image(600, 330)
    stream = codestream.encode_lossy(img, distance=1.0, effort=3,
                                     device=False, progressive=passes)
    ref, _ = codestream.decode(stream, device=False)
    assert np.array_equal(ref[:, :, :3], _assemble(stream))


@pytest.mark.parametrize("resampling", [2, 4])
def test_strips_match_upsampling(resampling):
    """Strip-wise 5x5-kernel upsampling with 2 exact context rows at
    interior seams (stage_upsampling.cc as a rolling-window stage)."""
    img = _image(520, 280, seed=8)
    stream = codestream.encode_lossy(img, distance=1.0, effort=3,
                                     device=False, resampling=resampling)
    ref, _ = codestream.decode(stream, device=False)
    out = _assemble(stream)
    assert out.shape == ref[:, :, :3].shape
    assert np.array_equal(ref[:, :, :3], out)


def test_strips_match_progressive_upsampled():
    img = _image(600, 256, seed=12)
    stream = codestream.encode_lossy(img, distance=1.0, effort=3,
                                     device=False, resampling=2,
                                     progressive=2)
    ref, _ = codestream.decode(stream, device=False)
    assert np.array_equal(ref[:, :, :3], _assemble(stream))


def test_unsupported_features_raise():
    img = _image(128, 128)
    noisy_up = codestream.encode_lossy(img, distance=1.0, effort=3,
                                       device=False, resampling=2,
                                       photon_noise_iso=1600)
    with pytest.raises(JXLError):
        list(codestream.decode_rows(noisy_up))
    lossless = codestream.encode_lossless(img)
    with pytest.raises(JXLError):
        list(codestream.decode_rows(lossless))


def test_peak_memory_is_bounded():
    """The strip decoder must never materialize the full image: peak
    traced allocation stays well under the whole-image decoder's."""
    import tracemalloc

    img = _image(1536, 256)
    stream = codestream.encode_lossy(img, distance=1.0, effort=3,
                                     device=False)
    codestream.decode(stream, device=False)  # warm caches
    _assemble(stream)

    tracemalloc.start()
    codestream.decode(stream, device=False)
    _, peak_full = tracemalloc.get_traced_memory()
    tracemalloc.stop()

    tracemalloc.start()
    out = _assemble(stream)
    _, peak_strips = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # exclude the assembled result buffer the test itself accumulates
    peak_strips -= out.nbytes
    assert peak_strips < 0.55 * peak_full, (peak_strips, peak_full)


def test_djxl_low_memory_flag(tmp_path):
    from libjxl_tpu.extras.io import load_image, save_image
    from libjxl_tpu.tools import cjxl, djxl

    img = _image(320, 200)
    src = tmp_path / "in.png"
    save_image(str(src), img)
    jxl = tmp_path / "out.jxl"
    dec = tmp_path / "dec.png"
    cjxl._main([str(src), str(jxl), "-d", "1.0", "-e", "3"])
    djxl._main([str(jxl), str(dec), "--low_memory"])
    ref = tmp_path / "ref.png"
    djxl._main([str(jxl), str(ref), "--host"])
    assert np.array_equal(load_image(str(dec)), load_image(str(ref)))


def test_device_strips_match_device_whole_image():
    """Device-rendered strips (64px haloed composites through the same
    jitted program) track the whole-image device render within 1 u8
    step (different XLA fusion shapes can shift rounding by 1 ulp)."""
    from libjxl_tpu.api.codestream import parse_codestream_header
    from libjxl_tpu.io.bits import BitReader
    from libjxl_tpu.io.frame_header import FrameHeader
    from libjxl_tpu.vardct.low_memory import decode_vardct_strips

    for h, w in [(600, 520), (257, 1030)]:
        img = _image(h, w)
        stream = codestream.encode_lossy(img, distance=1.0, effort=3,
                                         device=False)
        whole, _ = codestream.decode(stream, device=True)
        r = BitReader(stream)
        meta = parse_codestream_header(r)
        fh = FrameHeader(meta)
        fh.read(r)
        out = np.zeros_like(whole[:, :, :3])
        for y0, strip in decode_vardct_strips(r, fh, device=True):
            assert strip.dtype == np.uint8  # final u8 rows from device
            out[y0:y0 + strip.shape[0]] = strip
        assert np.abs(whole[:, :, :3].astype(int)
                      - out.astype(int)).max() <= 1


def test_truncated_stream_raises_cleanly():
    img = _image(300, 280)
    stream = codestream.encode_lossy(img, distance=1.0, effort=3,
                                     device=False)
    for cut in (50, len(stream) // 2, len(stream) - 10):
        with pytest.raises(JXLError):
            for _ in codestream.decode_rows(stream[:cut]):
                pass


@pytest.mark.parametrize("mode", [[0, 1, 0], [0, 2, 0]])
def test_strips_match_subsampled_ycbcr(mode):
    """Subsampled YCbCr strips: per-channel strip render + box chroma
    upsampling, bit-exact vs the whole-image decoder."""
    from libjxl_tpu.api.codestream import (CodecMetadata, SizeHeader,
                                           write_codestream_header)
    from libjxl_tpu.io.bits import BitWriter
    from libjxl_tpu.io.frame_header import (
        CT_YCBCR, ENC_VARDCT, FLAG_SKIP_ADAPTIVE_DC_SMOOTHING,
        FT_REGULAR, FrameHeader)
    from libjxl_tpu.vardct.frame import rgb_to_ycbcr
    from libjxl_tpu.vardct.subsampled import encode_vardct_subsampled

    img = _image(600, 320, seed=17)
    meta = CodecMetadata()
    meta.size = SizeHeader().set(320, 600)
    meta.m.all_default = False
    meta.m.xyb_encoded = False
    w = BitWriter()
    write_codestream_header(w, meta)
    fh = FrameHeader(meta)
    fh.all_default = False
    fh.frame_type = FT_REGULAR
    fh.encoding = ENC_VARDCT
    fh.color_transform = CT_YCBCR
    fh.chroma_subsampling.channel_mode = mode
    fh.flags = FLAG_SKIP_ADAPTIVE_DC_SMOOTHING
    fh.loop_filter.all_default = False
    fh.loop_filter.gab = False
    fh.loop_filter.epf_iters = 0
    hs = [fh.chroma_subsampling.hshift(c) for c in range(3)]
    vs = [fh.chroma_subsampling.vshift(c) for c in range(3)]
    ycbcr = rgb_to_ycbcr(np.moveaxis(img.astype(np.float64) / 255, -1, 0))

    def ds(p, fy, fx):
        h2, w2 = p.shape[0] // fy * fy, p.shape[1] // fx * fx
        return p[:h2, :w2].reshape(h2 // fy, fy, w2 // fx, fx).mean(
            axis=(1, 3))

    planes = [ds(ycbcr[c], 1 << vs[c], 1 << hs[c]) for c in range(3)]
    encode_vardct_subsampled(w, planes, fh, distance=1.0)
    stream = w.get_bytes()
    ref, _ = codestream.decode(stream, device=False)
    out = _assemble(stream)
    assert out.shape == ref[:, :, :3].shape
    # the whole-image subsampled renderer accumulates in float32; the
    # strip renderer in float64 — equal within one u8 rounding step
    d = np.abs(ref[:, :, :3].astype(int) - out.astype(int))
    assert d.max() <= 1 and (d != 0).mean() < 1e-4, (
        d.max(), (d != 0).mean())


def test_strips_16bit_progressive_hdr():
    """The HDR north-star leg: a 16-bit progressive lossy stream
    decodes bounded-memory to u16 rows identical to the whole-image
    decoder."""
    rng = np.random.default_rng(4)
    base = (30000 + 12000 * np.sin(np.arange(600)[:, None] * 0.01)
            + 9000 * np.cos(np.arange(320)[None, :] * 0.013)
            + rng.normal(0, 800, (600, 320)))
    img = np.clip(np.stack([base, base * 0.92, base * 1.05], -1),
                  0, 65535).astype(np.uint16)
    s = codestream.encode_lossy(img, distance=1.0, effort=3,
                                device=False, progressive=2)
    dec, meta = codestream.decode(s, device=False)
    assert dec.dtype == np.uint16
    assert meta.m.bit_depth.bits_per_sample == 16
    # quality sanity in 8-bit units
    err = np.abs(dec.astype(np.int64)
                 - img.astype(np.int64)).mean() / 257.0
    assert err < 3.0, err
    strips = _assemble(s)
    assert strips.dtype == np.uint16
    assert np.array_equal(strips, dec[:, :, :3])


def test_strips_with_alpha():
    """Extra channels (alpha) emit row-wise: each AC group's modular
    sub-stream decodes with its group and the rows join the strip —
    bit-exact vs the whole-image decoder."""
    rng = np.random.default_rng(7)
    img = _image(600, 300, seed=7)
    alpha = np.clip(np.linspace(0, 255, 600)[:, None]
                    + rng.normal(0, 10, (600, 300)), 0,
                    255).astype(np.uint8)
    rgba = np.dstack([img, alpha])
    s = codestream.encode_lossy(rgba, distance=1.0, effort=3,
                                device=False)
    ref, _ = codestream.decode(s, device=False)
    strips = _assemble(s)
    assert strips.shape == ref.shape
    assert np.array_equal(strips, ref)


def test_strips_with_splines():
    """Splines draw strip-wise: segments are additive Gaussians with
    bounded extent, so each strip draws exactly the overlapping ones —
    bit-exact vs the whole-image decoder."""
    from libjxl_tpu.render.splines import Spline

    rng = np.random.default_rng(3)
    img = np.clip(np.full((600, 300, 3), 128.0)
                  + rng.normal(0, 4, (600, 300, 3)), 0,
                  255).astype(np.uint8)
    pts = np.cumsum(rng.integers(10, 60, size=(8, 2)), axis=0) + 12.0
    pts[:, 0] = np.clip(pts[:, 0], 0, 280)  # x
    pts[:, 1] = np.clip(pts[:, 1] * 2.0, 0, 580)  # y spans strips
    color = np.zeros((3, 32))
    color[0, 0] = 0.2
    color[1, 0] = 0.6
    color[2, 0] = 0.3
    sigma = np.zeros(32)
    sigma[0] = 2.5
    s = codestream.encode_lossy(img, distance=1.0, effort=3,
                                device=False,
                                splines=[Spline(pts, color, sigma)])
    ref, _ = codestream.decode(s, device=False)
    strips = _assemble(s)
    assert np.array_equal(strips, ref[:, :, :3])


def test_strips_with_patches():
    """Patch dictionaries strip-decode: the kReferenceOnly sheet decodes
    whole-image (small by construction), then each strip blends the
    overlapping placements clipped to its rows — bit-exact vs the
    whole-image decoder, including a placement spanning a strip seam."""
    rng = np.random.default_rng(5)
    base = np.clip(np.full((600, 280, 3), 200.0)
                   + rng.normal(0, 3, (600, 280, 3)), 0,
                   255).astype(np.uint8)
    sheet = np.zeros((24, 24, 3), np.uint8)
    sheet[4:20, 4:20] = (40, 180, 90)
    placements = [(0, 0, 24, 24,
                   [(30, 100), (200, 250), (100, 500), (40, 245)])]
    s = codestream.encode_with_patches(base, sheet, placements,
                                       distance=1.0)
    ref, _ = codestream.decode(s, device=False)
    strips = _assemble(s)
    assert np.array_equal(strips, ref[:, :, :3])
