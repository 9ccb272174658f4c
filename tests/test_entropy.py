"""Entropy core roundtrip tests (reference analog: ans_test.cc,
ans_common_test.cc, lehmer_code_test.cc)."""

import random

import numpy as np
import pytest

from libjxl_tpu.io.bits import BitReader, BitWriter
from libjxl_tpu.entropy.alias import init_alias_table, build_reverse_map
from libjxl_tpu.entropy.decode import ANSSymbolReader, decode_histograms
from libjxl_tpu.entropy.encode import (
    Token,
    build_and_encode_histograms,
    write_tokens,
)
from libjxl_tpu.entropy.histogram import (
    create_flat_histogram,
    encode_counts,
    normalize_counts,
    read_histogram,
)
from libjxl_tpu.entropy.hybrid_uint import DEFAULT_UINT_CONFIG, HybridUintConfig
from libjxl_tpu.entropy.params import ANS_LOG_TAB_SIZE, ANS_TAB_SIZE
from libjxl_tpu.entropy.permutation import decode_permutation, encode_permutation


def test_hybrid_uint_spec_examples():
    # dec_ans.h:48-67 examples with split=4, msb=2, lsb=0
    cfg = HybridUintConfig(4, 2, 0)
    assert cfg.encode(15) == (15, 0, 0)
    assert cfg.encode(16) == (16, 2, 0b00)
    assert cfg.encode(17) == (16, 2, 0b01)
    assert cfg.encode(20) == (17, 2, 0b00)
    assert cfg.encode(24) == (18, 2, 0b00)
    assert cfg.encode(28) == (19, 2, 0b00)
    assert cfg.encode(32) == (20, 3, 0b000)
    assert cfg.encode(65535) == (63, 13, 0b1111111111111)


@pytest.mark.parametrize("cfg", [HybridUintConfig(4, 2, 0),
                                 HybridUintConfig(0, 0, 0),
                                 HybridUintConfig(4, 1, 1),
                                 HybridUintConfig(7, 0, 0)])
def test_hybrid_uint_roundtrip(cfg):
    rng = random.Random(0)
    values = [0, 1, 2, 15, 16, 255, 4096, 2**20, 2**31 - 1]
    values += [rng.randrange(1 << 24) for _ in range(200)]
    for v in values:
        token, nbits, bits = cfg.encode(v)
        got = cfg.decode(token, lambda n, b=bits: b)
        assert got == v, (v, token, nbits, bits)


def test_hybrid_uint_encode_array_matches_scalar():
    cfg = DEFAULT_UINT_CONFIG
    rng = np.random.default_rng(1)
    vals = np.concatenate([np.arange(64), rng.integers(0, 1 << 30, 500)])
    t, n, b = cfg.encode_array(vals.astype(np.uint32))
    for i, v in enumerate(vals):
        tt, nn, bb = cfg.encode(int(v))
        assert (t[i], n[i], b[i]) == (tt, nn, bb)


def _roundtrip_histogram(counts):
    w = BitWriter()
    counts = list(counts)
    omit_pos, num_symbols, symbols = normalize_counts(
        counts, ANS_LOG_TAB_SIZE, shift=ANS_LOG_TAB_SIZE)
    encode_counts(counts, len(counts), omit_pos, num_symbols,
                  ANS_LOG_TAB_SIZE, symbols, w)
    decoded = read_histogram(BitReader(w.get_bytes()))
    # decoded may be shorter (trailing zeros trimmed on decode path lengths)
    assert sum(decoded) == ANS_TAB_SIZE
    n = max(len(decoded), len(counts))
    a = decoded + [0] * (n - len(decoded))
    b = counts + [0] * (n - len(counts))
    assert a == b


def test_histogram_roundtrips():
    rng = random.Random(7)
    _roundtrip_histogram([1, 2, 3, 1000, 4, 5])
    _roundtrip_histogram([100] * 37)
    _roundtrip_histogram([1] + [0] * 100 + [500])
    for _ in range(20):
        n = rng.randrange(3, 60)
        _roundtrip_histogram([rng.randrange(0, 1000) + (1 if i < 3 else 0)
                              for i, _ in enumerate(range(n))])


def test_flat_histogram_properties():
    h = create_flat_histogram(7, ANS_TAB_SIZE)
    assert sum(h) == ANS_TAB_SIZE
    assert max(h) - min(h) <= 1


def test_alias_table_covers_distribution():
    dist = [100, 2000, 0, 1996]
    table = init_alias_table(dist, log_alpha_size=5)
    rev, freqs = build_reverse_map(table, len(dist))
    assert list(freqs) == dist
    # every residue maps to exactly one (symbol, offset) and back
    residues = np.arange(ANS_TAB_SIZE)
    sym, off, freq = table.lookup_array(residues)
    for s, d in enumerate(dist):
        assert int((sym == s).sum()) == d


def _ans_roundtrip(token_values_per_ctx, num_contexts, seed=0):
    rng = random.Random(seed)
    tokens = []
    for _ in range(2000):
        ctx = rng.randrange(num_contexts)
        tokens.append(Token(ctx, rng.choice(token_values_per_ctx[ctx])))
    w = BitWriter()
    codes, context_map = build_and_encode_histograms([tokens], num_contexts, w)
    write_tokens(tokens, codes, context_map, w)
    data = w.get_bytes()
    r = BitReader(data)
    code, dec_map = decode_histograms(r, num_contexts)
    assert dec_map == context_map
    reader = ANSSymbolReader(code, r)
    for t in tokens:
        v = reader.read_hybrid_uint(t.context, r, dec_map)
        assert v == t.value
    assert reader.check_final_state()
    r.close()
    return len(data)


def test_ans_stream_roundtrip_single_context():
    _ans_roundtrip([[0, 1, 2, 3, 17, 400]], 1)


def test_ans_stream_roundtrip_multi_context():
    values = [[0, 1, 2], [5, 600, 70000], list(range(32)), [0], [1, 2**20]]
    _ans_roundtrip(values, 5)


def test_ans_compresses_skewed_stream():
    # heavily skewed distribution should compress well below 1 byte/token
    tokens = [Token(0, 0)] * 5000 + [Token(0, 9)] * 50
    random.Random(3).shuffle(tokens)
    w = BitWriter()
    codes, cmap = build_and_encode_histograms([tokens], 1, w)
    write_tokens(tokens, codes, cmap, w)
    assert len(w.get_bytes()) < 700

    r = BitReader(w.get_bytes())
    code, dec_map = decode_histograms(r, 1)
    reader = ANSSymbolReader(code, r)
    got = [reader.read_hybrid_uint(0, r, dec_map) for _ in tokens]
    assert got == [t.value for t in tokens]
    assert reader.check_final_state()


@pytest.mark.parametrize("n", [1, 2, 10, 64, 300])
def test_permutation_roundtrip(n):
    rng = random.Random(n)
    perm = list(range(n))
    rng.shuffle(perm)
    w = BitWriter()
    encode_permutation(perm, 0, n, w)
    got = decode_permutation(0, n, BitReader(w.get_bytes()))
    assert got == perm
