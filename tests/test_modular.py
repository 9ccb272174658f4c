"""Modular codec roundtrips (reference analog: modular_test.cc)."""

import numpy as np
import pytest

from libjxl_tpu.io.bits import BitReader, BitWriter
from libjxl_tpu.modular.codec import ModularOptions, modular_decode, modular_encode
from libjxl_tpu.modular.image import Channel, ModularImage
from libjxl_tpu.modular.predict import (
    P_GRADIENT,
    P_SELECT,
    P_WEIGHTED,
    P_ZERO,
    WeightedHeader,
)
from libjxl_tpu.modular.transforms import (
    SqueezeParams,
    Transform,
    T_RCT,
    T_SQUEEZE,
    fwd_rct,
    fwd_squeeze,
    inv_rct,
    inv_squeeze,
    default_squeeze_parameters,
    meta_squeeze,
)
from libjxl_tpu.modular.tree import TreeNode, make_fixed_tree


def make_image(arrays, bitdepth=8):
    arrays = [np.asarray(a, dtype=np.int32) for a in arrays]
    h, w = arrays[0].shape
    img = ModularImage(w, h, bitdepth, 0)
    img.channel = [Channel(w, h, data=a.copy()) for a in arrays]
    return img


def roundtrip(img, tree=None, options=None, orig_channels=None):
    """orig_channels: (w, h) list of the image BEFORE transforms — the
    decoder starts from metadata shapes and meta_apply reshapes them."""
    w = BitWriter()
    modular_encode(img, w, tree=tree, options=options)
    data = w.get_bytes()
    out = ModularImage(img.w, img.h, img.bitdepth, 0)
    if orig_channels is None:
        orig_channels = [(c.w, c.h) for c in img.channel]
    out.channel = [Channel(cw, ch) for cw, ch in orig_channels]
    modular_decode(BitReader(data), out, options=options)
    return out, data


RNG = np.random.default_rng(42)


@pytest.mark.parametrize("pred", [P_ZERO, P_GRADIENT])
def test_modular_roundtrip_noise(pred):
    a = RNG.integers(0, 256, (16, 24))
    img = make_image([a])
    out, _ = roundtrip(img, tree=make_fixed_tree(pred))
    np.testing.assert_array_equal(out.channel[0].data, a)


def test_modular_roundtrip_multichannel():
    chans = [RNG.integers(-500, 500, (21, 13)) for _ in range(3)]
    img = make_image(chans, bitdepth=16)
    out, _ = roundtrip(img)
    for c, a in zip(out.channel, chans):
        np.testing.assert_array_equal(c.data, a)


def test_modular_smooth_image_compresses():
    yy, xx = np.mgrid[0:64, 0:64]
    smooth = (xx + 2 * yy) // 3
    img = make_image([smooth])
    out, data = roundtrip(img)
    np.testing.assert_array_equal(out.channel[0].data, smooth)
    assert len(data) < 64 * 64  # must beat raw 1 byte/px easily


def test_modular_weighted_predictor_roundtrip():
    a = RNG.integers(0, 4096, (18, 18))
    img = make_image([a], bitdepth=12)
    out, _ = roundtrip(img, tree=make_fixed_tree(P_WEIGHTED))
    np.testing.assert_array_equal(out.channel[0].data, a)


def test_modular_tree_with_properties_roundtrip():
    # split on property 7 (left): contexts differ by sign of left neighbor
    tree = [
        TreeNode(7, 0, 1, 2),
        TreeNode(-1, 0, 0, 0, P_GRADIENT, 0, 1),
        TreeNode(-1, 0, 1, 0, P_SELECT, 0, 1),
    ]
    a = RNG.integers(-100, 100, (20, 20))
    img = make_image([a], bitdepth=16)
    out, _ = roundtrip(img, tree=tree)
    np.testing.assert_array_equal(out.channel[0].data, a)


def test_rct_ycocg_roundtrip():
    chans = [RNG.integers(0, 256, (8, 8)) for _ in range(3)]
    img = make_image(chans)
    fwd_rct(img, 0, 6)
    inv_rct(img, 0, 6)
    for c, a in zip(img.channel, chans):
        np.testing.assert_array_equal(c.data, a)


@pytest.mark.parametrize("rct_type", list(range(0, 42, 5)) + [41])
def test_rct_all_types_roundtrip(rct_type):
    chans = [RNG.integers(-1000, 1000, (5, 7)) for _ in range(3)]
    img = make_image(chans, bitdepth=16)
    fwd_rct(img, 0, rct_type)
    inv_rct(img, 0, rct_type)
    for c, a in zip(img.channel, chans):
        np.testing.assert_array_equal(c.data, a)


def test_squeeze_roundtrip():
    a = RNG.integers(0, 256, (30, 47))
    img = make_image([a])
    params = default_squeeze_parameters(img)
    fwd_squeeze(img, params)
    # after squeeze: first channel is small; verify sizes match meta_squeeze
    img2 = make_image([a])
    t = Transform()
    t.id = T_SQUEEZE
    t.squeezes = params
    meta_squeeze(img2, t)
    assert len(img.channel) == len(img2.channel)
    for c1, c2 in zip(img.channel, img2.channel):
        assert (c1.w, c1.h) == (c2.w, c2.h)
    inv_squeeze(img, params)
    assert len(img.channel) == 1
    np.testing.assert_array_equal(img.channel[0].data, a)


def test_modular_rct_transform_end_to_end():
    chans = [RNG.integers(0, 256, (12, 12)) for _ in range(3)]
    img = make_image(chans)
    t = Transform()
    t.id = T_RCT
    t.begin_c = 0
    t.rct_type = 6
    fwd_rct(img, 0, 6)
    img.transform = [t]
    out, _ = roundtrip(img)
    for c, a in zip(out.channel, chans):
        np.testing.assert_array_equal(c.data, a)


def test_modular_squeeze_transform_end_to_end():
    a = (np.mgrid[0:33, 0:40][0] * 3 + RNG.integers(0, 8, (33, 40)))
    img = make_image([a], bitdepth=8)
    t = Transform()
    t.id = T_SQUEEZE
    t.squeezes = []
    params = default_squeeze_parameters(img)
    t.squeezes = params
    fwd_squeeze(img, params)
    img.transform = [t]
    out, _ = roundtrip(img, orig_channels=[(40, 33)])
    assert len(out.channel) == 1
    np.testing.assert_array_equal(out.channel[0].data, a)
