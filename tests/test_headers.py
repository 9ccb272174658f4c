"""Header bundle roundtrips (reference analog: headers in fields_test.cc)."""

import pytest

from libjxl_tpu.io.bits import BitReader, BitWriter
from libjxl_tpu.io.frame_header import (
    ENC_MODULAR,
    FT_REGULAR,
    FrameDimensions,
    FrameHeader,
    LoopFilter,
    Passes,
)
from libjxl_tpu.io.headers import (
    CS_GRAY,
    TF_LINEAR,
    AnimationHeader,
    BitDepth,
    CodecMetadata,
    ColorEncoding,
    ImageMetadata,
    SizeHeader,
)
from libjxl_tpu.io.lehmer import compute_lehmer_code, decode_lehmer_code


def roundtrip(bundle, make_empty):
    w = BitWriter()
    bundle.write(w)
    out = make_empty()
    out.read(BitReader(w.get_bytes()))
    return out


@pytest.mark.parametrize("xsize,ysize", [(1, 1), (256, 256), (255, 257), (512, 512),
                                         (1920, 1080), (65536, 1), (123456, 789)])
def test_size_header_roundtrip(xsize, ysize):
    sh = SizeHeader().set(xsize, ysize)
    out = roundtrip(sh, SizeHeader)
    assert out.xsize() == xsize and out.ysize() == ysize


def test_size_header_small_is_compact():
    sh = SizeHeader().set(256, 256)
    w = BitWriter()
    sh.write(w)
    assert w.bits_written() <= 16  # small path: 1+5+3 bits (+ratio)


def test_bit_depth_roundtrips():
    for bits, fp, exp in [(8, False, 0), (16, False, 0), (31, False, 0),
                          (32, True, 8), (16, True, 5)]:
        bd = BitDepth()
        bd.floating_point_sample = fp
        bd.bits_per_sample = bits
        bd.exponent_bits_per_sample = exp
        out = roundtrip(bd, BitDepth)
        assert (out.bits_per_sample, out.floating_point_sample,
                out.exponent_bits_per_sample) == (bits, fp, exp)


def test_image_metadata_default_is_one_bit():
    im = ImageMetadata()
    w = BitWriter()
    im.write(w)
    assert w.bits_written() == 1
    out = roundtrip(im, ImageMetadata)
    assert out.bit_depth.bits_per_sample == 8
    assert out.xyb_encoded is True
    assert out.orientation == 1


def test_image_metadata_with_alpha_roundtrip():
    im = ImageMetadata()
    im.all_default = False
    im.set_alpha_bits(8)
    out = roundtrip(im, ImageMetadata)
    assert out.num_extra_channels == 1
    assert out.has_alpha()
    assert out.extra_channel_info[0].bit_depth.bits_per_sample == 8


def test_color_encoding_linear_srgb_roundtrip():
    ce = ColorEncoding.linear_srgb(is_gray=True)
    out = roundtrip(ce, ColorEncoding)
    assert out.color_space == CS_GRAY
    assert out.tf.transfer_function == TF_LINEAR


def test_animation_header_roundtrip():
    ah = AnimationHeader()
    ah.tps_numerator = 30
    ah.tps_denominator = 1
    ah.num_loops = 5
    out = roundtrip(ah, AnimationHeader)
    assert (out.tps_numerator, out.tps_denominator, out.num_loops) == (30, 1, 5)


def test_frame_header_default_roundtrip():
    meta = CodecMetadata()
    meta.size.set(100, 100)
    fh = FrameHeader(meta)
    w = BitWriter()
    fh.write(w)
    out = FrameHeader(meta)
    out.read(BitReader(w.get_bytes()))
    assert out.frame_type == FT_REGULAR
    assert out.is_last


def test_frame_header_modular_roundtrip():
    meta = CodecMetadata()
    meta.size.set(300, 200)
    meta.m.all_default = False
    meta.m.xyb_encoded = False
    fh = FrameHeader(meta)
    fh.all_default = False
    fh.encoding = ENC_MODULAR
    fh.group_size_shift = 2
    fh.loop_filter.all_default = False
    fh.loop_filter.gab = False
    fh.loop_filter.epf_iters = 0
    fh.name = "layer-1"
    w = BitWriter()
    fh.write(w)
    out = FrameHeader(meta)
    out.read(BitReader(w.get_bytes()))
    assert out.encoding == ENC_MODULAR
    assert out.group_size_shift == 2
    assert out.name == "layer-1"
    assert out.loop_filter.gab is False
    assert out.loop_filter.epf_iters == 0


def test_frame_dimensions():
    fd = FrameDimensions().set(1000, 600)
    assert fd.xsize_blocks == 125 and fd.ysize_blocks == 75
    assert fd.xsize_groups == 4 and fd.ysize_groups == 3
    assert fd.num_groups == 12
    assert fd.num_dc_groups == 1
    assert fd.group_rect(3) == (768, 0, 232, 256)


def test_lehmer_roundtrip():
    import random

    rng = random.Random(42)
    for n in [1, 2, 3, 7, 64, 257]:
        perm = list(range(n))
        rng.shuffle(perm)
        code = compute_lehmer_code(perm)
        assert decode_lehmer_code(code) == perm


def test_loop_filter_custom_roundtrip():
    lf = LoopFilter()
    lf.all_default = False
    lf.epf_iters = 3
    lf.epf_sigma_custom = True
    lf.epf_pass0_sigma_scale = 1.25
    out = roundtrip(lf, LoopFilter)
    assert out.epf_iters == 3
    assert out.epf_sigma_custom
    assert abs(out.epf_pass0_sigma_scale - 1.25) < 1e-3


def test_passes_roundtrip():
    p = Passes()
    p.num_passes = 3
    p.shift = [2, 1, 0] + [0] * 8
    out = roundtrip(p, Passes)
    assert out.num_passes == 3
    assert out.shift[:3] == [2, 1, 0]
