"""Baseline JPEG parser: markers, tables, entropy-coded coefficients.

Structured model of a JPEG file in the spirit of jpeg::JPEGData
(lib/jxl/jpeg/jpeg_data.h:167): everything needed to re-serialize the
file bit-exactly (enc_jpeg_data_reader.cc analog). Baseline sequential
(SOF0/SOF1) with Huffman coding; restart markers supported.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from ..base.status import JXLError

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)


@dataclass
class HuffmanTable:
    table_class: int  # 0 = DC, 1 = AC
    table_id: int
    counts: list      # 16 entries
    values: list

    def build_decoder(self):
        """-> dict (length, code) -> value (MSB-first canonical)."""
        table = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(self.counts[length - 1]):
                table[(length, code)] = self.values[k]
                code += 1
                k += 1
            code <<= 1
        return table

    def build_encoder(self):
        """-> dict value -> (length, code)."""
        out = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(self.counts[length - 1]):
                out[self.values[k]] = (length, code)
                code += 1
                k += 1
            code <<= 1
        return out


@dataclass
class Component:
    comp_id: int
    h_samp: int
    v_samp: int
    quant_idx: int
    dc_table: int = 0
    ac_table: int = 0
    width_in_blocks: int = 0
    height_in_blocks: int = 0
    coeffs: np.ndarray = None  # (hb, wb, 64) int16, natural (zigzag) order


@dataclass
class JPEGData:
    width: int = 0
    height: int = 0
    precision: int = 8
    components: list = field(default_factory=list)
    quant: dict = field(default_factory=dict)      # id -> 64 ints (zigzag)
    quant_order: list = field(default_factory=list)
    huffman: list = field(default_factory=list)
    markers: list = field(default_factory=list)    # (marker, payload) pre-SOS
    restart_interval: int = 0
    scan_components: list = field(default_factory=list)
    eob_padding_bits: str = ""
    rst_padding: list = field(default_factory=list)  # bits before each RSTn
    trailing: bytes = b""


class _BitReaderJPEG:
    """MSB-first entropy-coded segment reader with 0xFF00 unstuffing."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker = None

    def _next_byte(self) -> int:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
                return 0xFF
            self.marker = nxt
            return None
        self.pos += 1
        return b

    def read_bit(self) -> int:
        if self.nbits == 0:
            b = self._next_byte()
            if b is None:
                return 0  # past-marker padding bits read as... spec: error
            self.bitbuf = b
            self.nbits = 8
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_check_rst(self):
        # record the discarded padding bits (jbrd needs them verbatim)
        pad = ""
        if self.nbits:
            pad = format(self.bitbuf & ((1 << self.nbits) - 1),
                         f"0{self.nbits}b")
        self.nbits = 0
        if (self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            self.pos += 2
        return pad


def _decode_huff(br: _BitReaderJPEG, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise JXLError("invalid JPEG huffman code")


def _extend(v: int, n: int) -> int:
    """JPEG signed magnitude extension."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def parse_jpeg(data: bytes) -> JPEGData:
    if data[:2] != b"\xff\xd8":
        raise JXLError("not a JPEG (no SOI)")
    jd = JPEGData()
    pos = 2
    sof_seen = False
    while pos < len(data):
        if data[pos] != 0xFF:
            raise JXLError("JPEG marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            jd.trailing = data[pos:]
            return jd
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        length = struct.unpack(">H", data[pos:pos + 2])[0]
        payload = data[pos + 2:pos + length]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq = payload[p] >> 4
                tq = payload[p] & 15
                p += 1
                if pq:
                    vals = list(struct.unpack(f">64H", payload[p:p + 128]))
                    p += 128
                else:
                    vals = list(payload[p:p + 64])
                    p += 64
                jd.quant[tq] = vals
                jd.quant_order.append((tq, pq))
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            jd.precision = payload[0]
            jd.height, jd.width = struct.unpack(">HH", payload[1:5])
            ncomp = payload[5]
            for i in range(ncomp):
                cid, hv, tq = payload[6 + 3 * i:9 + 3 * i]
                jd.components.append(
                    Component(cid, hv >> 4, hv & 15, tq))
            sof_seen = True
        elif marker in (0xC2,):  # progressive
            raise JXLError("progressive JPEG not yet supported")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc = payload[p] >> 4
                th = payload[p] & 15
                counts = list(payload[p + 1:p + 17])
                n = sum(counts)
                values = list(payload[p + 17:p + 17 + n])
                jd.huffman.append(HuffmanTable(tc, th, counts, values))
                p += 17 + n
        elif marker == 0xDD:  # DRI
            jd.restart_interval = struct.unpack(">H", payload[:2])[0]
        elif marker == 0xDA:  # SOS
            if not sof_seen:
                raise JXLError("SOS before SOF")
            ns = payload[0]
            jd.scan_components = []
            for i in range(ns):
                cs, tables = payload[1 + 2 * i:3 + 2 * i]
                for comp in jd.components:
                    if comp.comp_id == cs:
                        comp.dc_table = tables >> 4
                        comp.ac_table = tables & 15
                        jd.scan_components.append(comp)
                        break
                else:
                    raise JXLError("SOS references unknown component")
            pos += length
            pos = _decode_scan(jd, data, pos)
            continue
        else:
            jd.markers.append((marker, payload))
        pos += length
    raise JXLError("JPEG truncated (no EOI)")


def _decode_scan(jd: JPEGData, data: bytes, pos: int) -> int:
    hmax = max(c.h_samp for c in jd.components)
    vmax = max(c.v_samp for c in jd.components)
    mcux = -(-jd.width // (8 * hmax))
    mcuy = -(-jd.height // (8 * vmax))
    for c in jd.components:
        c.width_in_blocks = mcux * c.h_samp
        c.height_in_blocks = mcuy * c.v_samp
        c.coeffs = np.zeros((c.height_in_blocks, c.width_in_blocks, 64),
                            dtype=np.int16)
    dec_tables = {}
    for t in jd.huffman:
        dec_tables[(t.table_class, t.table_id)] = t.build_decoder()
    br = _BitReaderJPEG(data, pos)
    preds = {id(c): 0 for c in jd.components}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (jd.restart_interval and mcu_count
                    and mcu_count % jd.restart_interval == 0):
                jd.rst_padding.append(br.align_and_check_rst())
                for c in jd.components:
                    preds[id(c)] = 0
            for c in jd.scan_components:
                dc_tab = dec_tables[(0, c.dc_table)]
                ac_tab = dec_tables[(1, c.ac_table)]
                for by in range(c.v_samp):
                    for bx in range(c.h_samp):
                        block = c.coeffs[my * c.v_samp + by,
                                         mx * c.h_samp + bx]
                        s = _decode_huff(br, dc_tab)
                        diff = _extend(br.read_bits(s), s)
                        preds[id(c)] += diff
                        block[0] = preds[id(c)]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, ac_tab)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise JXLError("JPEG AC index overflow")
                            block[k] = _extend(br.read_bits(s), s)
                            k += 1
            mcu_count += 1
    # record padding bits of the final partial byte for bit-exact rewrite
    jd.eob_padding_bits = ""
    if br.nbits:
        jd.eob_padding_bits = format(br.bitbuf & ((1 << br.nbits) - 1),
                                     f"0{br.nbits}b")
        br.nbits = 0
    # skip to EOI
    p = br.pos
    while p + 1 < len(data) and not (data[p] == 0xFF and data[p + 1] != 0x00
                                     and not 0xD0 <= data[p + 1] <= 0xD7):
        p += 1
    return p
