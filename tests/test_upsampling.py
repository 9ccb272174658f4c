"""Signaled upsampling tests (stage_upsampling.cc analog)."""

import numpy as np
import pytest

from libjxl_tpu.api.codestream import decode, encode_lossy
from libjxl_tpu.render.upsample import downsample_box, upsample
from tests.test_vardct_frame import make_photoish, psnr


def test_upsample_preserves_mean():
    rng = np.random.default_rng(8)
    x = rng.uniform(0, 1, (16, 16))
    for n in (2, 4, 8):
        up = upsample(x, n)
        assert up.shape == (16 * n, 16 * n)
        assert abs(up.mean() - x.mean()) < 0.02


def test_upsample_flat_is_flat():
    x = np.full((8, 8), 0.7)
    for n in (2, 4, 8):
        up = upsample(x, n)
        np.testing.assert_allclose(up, 0.7, atol=1e-3)


@pytest.mark.parametrize("rs", [2, 4, 8])
def test_resampling_roundtrip(rs):
    img = make_photoish(96, 96, seed=7)
    data = encode_lossy(img, distance=1.0, resampling=rs)
    out, _ = decode(data)
    assert out.shape == img.shape
    assert psnr(img, out) > 25
    full = encode_lossy(img, distance=1.0)
    assert len(data) < len(full)


def test_custom_signaled_upsampling_weights_interop():
    """Splice non-default CustomTransformData 2x weights into a real
    stream: our decoder must apply them (differ from default decode) and
    agree with the reference decoder (stage_upsampling.cc:32)."""
    import pytest

    from libjxl_tpu.api import codestream
    from libjxl_tpu.extras import oracle
    from libjxl_tpu.io import upsample_defaults as upd
    from libjxl_tpu.io.bits import BitReader, BitWriter

    rng = np.random.default_rng(5)
    img = np.clip(rng.normal(128, 40, (64, 64, 3)), 0, 255).astype(np.uint8)
    stream = codestream.encode_lossy(img, distance=1.0, effort=3,
                                     resampling=2)

    # re-serialize the header with custom up2 weights, splice the rest
    r = BitReader(stream)
    meta = codestream.parse_codestream_header(r)
    consumed = r.total_bits_consumed()
    meta.transform_data.all_default = False
    meta.transform_data.custom_weights_mask = 1
    w2 = list(upd.UPSAMPLE2_WEIGHTS)
    w2[0] += 0.25  # visibly different kernel
    meta.transform_data.upsampling2_weights = w2
    w = BitWriter()
    codestream.write_codestream_header(w, meta)
    rr = BitReader(stream)
    rr.skip_bits(consumed)
    total_bits = len(stream) * 8
    while rr.total_bits_consumed() + 32 <= total_bits:
        w.write(32, rr.read_bits(32))
    while rr.total_bits_consumed() + 1 <= total_bits:
        w.write(1, rr.read_bits(1))
    spliced = w.get_bytes()

    base, _ = codestream.decode(stream)
    ours, _ = codestream.decode(spliced)
    assert np.abs(base.astype(int) - ours.astype(int)).max() > 0, \
        "custom weights were ignored"
    if not oracle.available():
        pytest.skip("no system libjxl")
    theirs, _ = oracle.decode(spliced)
    d = np.abs(theirs[:, :, :3].astype(np.int64) - ours.astype(np.int64))
    assert float(np.sqrt((d.astype(float) ** 2).mean())) < 0.7, d.max()
