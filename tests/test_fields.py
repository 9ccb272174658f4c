"""Bitstream primitive tests (reference analog: fields_test.cc)."""

import math

import pytest

from libjxl_tpu.base.status import JXLError
from libjxl_tpu.io.bits import BitReader, BitWriter
from libjxl_tpu.io.fields import (
    Bits,
    BitsOffset,
    Bundle,
    U32Enc,
    Val,
    f16_read,
    f16_write,
    u32_read,
    u32_write,
    u64_read,
    u64_write,
)


def roundtrip_bits(write_fn):
    w = BitWriter()
    write_fn(w)
    return BitReader(w.get_bytes())


def test_bit_reader_writer_lsb_first():
    w = BitWriter()
    w.write(3, 0b101)
    w.write(5, 0b11010)
    w.write(16, 0xBEEF)
    data = w.get_bytes()
    # first byte: low 3 bits 101, then 11010 above them
    assert data[0] == (0b101 | (0b11010 << 3))
    r = BitReader(data)
    assert r.read_bits(3) == 0b101
    assert r.read_bits(5) == 0b11010
    assert r.read_bits(16) == 0xBEEF
    assert r.all_reads_within_bounds()


def test_bit_reader_out_of_bounds():
    r = BitReader(b"\xff")
    assert r.read_bits(8) == 0xFF
    assert r.read_bits(8) == 0  # virtual zero padding
    assert not r.all_reads_within_bounds()


@pytest.mark.parametrize("value", [0, 1, 16, 17, 272, 273, 4095, 4096, 2**32 - 1, 2**55 + 12345, 2**64 - 1])
def test_u64_roundtrip(value):
    r = roundtrip_bits(lambda w: u64_write(value, w))
    assert u64_read(r) == value
    assert r.all_reads_within_bounds()


def test_u32_direct_and_offset():
    enc = U32Enc(Val(0), BitsOffset(1, 1), BitsOffset(2, 3), BitsOffset(8, 8))
    # spec example from fields.h:55-60 (whose "3..7" comment is off by one:
    # BitsOffset(2, 3) covers 3..6)
    for value in [0, 1, 2, 3, 6, 8, 263]:
        r = roundtrip_bits(lambda w: u32_write(enc, value, w))
        assert u32_read(enc, r) == value
    with pytest.raises(JXLError):
        u32_write(enc, 264, BitWriter())


def test_u32_selector_bit_count():
    enc = U32Enc(Val(8), Val(16), Val(32), Bits(6))
    w = BitWriter()
    u32_write(enc, 32, w)
    assert w.bits_written() == 2  # "value 32 => 10b" (fields.h:53)


@pytest.mark.parametrize("value", [0.0, 1.0, -1.0, 0.5, 65504.0, 2**-24, -2**-14])
def test_f16_roundtrip(value):
    r = roundtrip_bits(lambda w: f16_write(value, w))
    assert f16_read(r) == value


def test_f16_rejects_inf_nan():
    with pytest.raises(JXLError):
        f16_write(math.inf, BitWriter())
    with pytest.raises(JXLError):
        f16_write(math.nan, BitWriter())


class _Toy(Bundle):
    def visit_fields(self, v):
        if v.all_default(self):
            return
        v.u32(self, U32Enc(Val(0), Val(1), Bits(4), BitsOffset(8, 16)), 0, "a")
        v.bool_(self, False, "flag")
        if v.conditional(self.flag):
            v.u64(self, 0, "big")
        v.bits(self, 7, 3, "raw")


def test_bundle_all_default_roundtrip():
    t = _Toy()
    w = BitWriter()
    t.write(w)
    assert w.bits_written() == 1
    t2 = _Toy().read(BitReader(w.get_bytes()))
    assert t2.a == 0 and t2.flag is False and t2.raw == 3


def test_bundle_roundtrip_nondefault():
    t = _Toy(a=20, flag=True, big=123456789, raw=99)
    w = BitWriter()
    t.write(w)
    t2 = _Toy().read(BitReader(w.get_bytes()))
    assert (t2.a, t2.flag, t2.big, t2.raw) == (20, True, 123456789, 99)
