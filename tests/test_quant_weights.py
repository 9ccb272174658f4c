"""Signaled (custom) dequantization matrices
(quant_weights.cc:382-505, enc_quant_weights.cc:39-135)."""

import numpy as np
import pytest

from libjxl_tpu.api.codestream import decode, encode_lossy
from libjxl_tpu.io.bits import BitReader, BitWriter
from libjxl_tpu.vardct.quant_weights import DequantMatrices
from libjxl_tpu.vardct.quant_weights_defaults import LIBRARY_DEFAULTS


def _matrices_roundtrip(m: DequantMatrices) -> DequantMatrices:
    w = BitWriter()
    m.encode(w, num_dc_groups=1)
    m2 = DequantMatrices()
    m2.decode(BitReader(w.get_bytes()), num_dc_groups=1)
    return m2


@pytest.mark.parametrize("entry", [
    ("dct", [[row[0] * 0.5] + list(row[1:])
             for row in LIBRARY_DEFAULTS[0][1]]),
    ("raw", 1.0 / 64, np.clip(np.arange(1, 193).reshape(3, 8, 8), 1, 255)),
])
def test_custom_table_bitstream_roundtrip(entry):
    m = DequantMatrices()
    m.set_custom(0, entry)
    m2 = _matrices_roundtrip(m)
    for c in range(3):
        np.testing.assert_allclose(m2.dequant_matrix(0, c),
                                   m.dequant_matrix(0, c), rtol=1e-6)
        np.testing.assert_allclose(m2.inv_matrix(0, c),
                                   m.inv_matrix(0, c), rtol=1e-6)


def test_custom_id_dct2_modes():
    m = DequantMatrices()
    m.set_custom(1, ("id", [[300.0, 3000.0, 3000.0],
                            [80.0, 900.0, 900.0],
                            [20.0, 210.0, 210.0]]))
    m.set_custom(2, ("dct2", [[4000.0, 2500.0, 1200.0, 600.0, 500.0, 300.0],
                              [900.0, 600.0, 300.0, 190.0, 130.0, 110.0],
                              [600.0, 300.0, 130.0, 60.0, 30.0, 15.0]]))
    m2 = _matrices_roundtrip(m)
    for kind in (1, 2):
        np.testing.assert_allclose(m2.dequant_matrix(kind, 0),
                                   m.dequant_matrix(kind, 0), rtol=1e-6)


def test_all_default_stays_one_bit():
    m = DequantMatrices()
    w = BitWriter()
    m.encode(w, num_dc_groups=1)
    assert len(w.get_bytes()) == 1


def test_custom_quant_end_to_end():
    rng = np.random.default_rng(0)
    img = np.clip(rng.normal(128, 30, (128, 128, 3)), 0, 255).astype(np.uint8)
    bands = [[row[0] * 0.125] + list(row[1:])
             for row in LIBRARY_DEFAULTS[0][1]]
    d_coarse = encode_lossy(img, distance=1.0,
                            custom_quant={0: ("dct", bands)})
    d_default = encode_lossy(img, distance=1.0)
    o_coarse, _ = decode(d_coarse)
    o_default, _ = decode(d_default)
    # coarser table -> smaller stream, worse fidelity (the margin is
    # modest on pure-noise content where the adaptive raw field carries
    # most of the scale)
    assert len(d_coarse) < 0.97 * len(d_default)
    err_c = np.abs(o_coarse.astype(int) - img.astype(int)).mean()
    err_d = np.abs(o_default.astype(int) - img.astype(int)).mean()
    assert err_c > err_d
