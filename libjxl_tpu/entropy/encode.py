"""Entropy encoding: histogram building/serialization + rANS token writing.

Mirrors BuildAndEncodeHistograms / WriteTokens / EncodeContextMap
(enc_ans.cc, enc_context_map.cc). Tokens are (context, value) pairs; per
stream the writer emits symbols in *reverse* order through the rANS coder
(enc_ans.h:49-71), then reverses the produced bit groups.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..base.status import JXLError
from ..io.bits import BitWriter
from .alias import build_reverse_map, init_alias_table
from .cluster import cluster_histograms
from .decode import LZ77Params
from .histogram import (
    compute_best_method,
    create_flat_histogram,
    encode_counts,
    encode_flat_histogram,
    normalize_counts,
    store_varlen_uint16,
)
from .hybrid_uint import DEFAULT_UINT_CONFIG, HybridUintConfig
from .params import ANS_LOG_TAB_SIZE, ANS_SIGNATURE, ANS_TAB_SIZE, CLUSTERS_LIMIT


@dataclass(frozen=True)
class Token:
    context: int
    value: int
    is_lz77_length: bool = False


class EntropyEncodingData:
    """Per-cluster encoding info (enc_ans.h:75-96 analog)."""

    def __init__(self):
        self.use_prefix_code = False
        self.log_alpha_size = 7
        self.uint_config: list = []
        self.lz77 = LZ77Params()
        # transformed token lists when LZ77 was applied (same order as the
        # tokens_list passed to build_and_encode_histograms), else None
        self.lz77_tokens = None
        # per cluster: (freqs int32[alpha], reverse_map int32[alpha, maxfreq])
        self.encoding_info: list = []


class _MtfEncoder:
    def __init__(self):
        self.mtf = list(range(256))

    def encode(self, value: int) -> int:
        idx = self.mtf.index(value)
        del self.mtf[idx]
        self.mtf.insert(0, value)
        return idx


def _estimate_token_cost(tokens_list, num_contexts, uint_config, lz77=None):
    histograms = [[0] for _ in range(num_contexts)]
    for tokens in tokens_list:
        for t in tokens:
            if lz77 is not None and t.is_lz77_length:
                tok, _, _ = lz77.length_uint_config.encode(t.value)
                tok += lz77.min_symbol
            else:
                tok, _, _ = uint_config.encode(t.value)
            h = histograms[t.context]
            if tok >= len(h):
                h.extend([0] * (tok + 1 - len(h)))
            h[tok] += 1
    return histograms


def _apply_lz77_rle(tokens_list, num_contexts, lz77, uint_config,
                    distance_symbol=0):
    """ApplyLZ77_RLE (enc_ans.cc:931-1001): replace runs of repeated token
    values with (length, distance=1) pairs. Returns (new_lists, accepted).
    The distance token goes to the appended context `num_contexts`.
    distance_symbol: 0 when the decoding reader has no distance
    multiplier; 1 (kSpecialDistances[1] = {1,0}) when it does, as in
    modular streams (enc_ans.cc:958-963)."""
    import math

    # symbol cost estimator: -log2(p) from the original token histograms
    histograms = _estimate_token_cost(tokens_list, num_contexts, uint_config)
    cost_tables = []
    for h in histograms:
        total = sum(h)
        if total == 0:
            cost_tables.append(None)
            continue
        log_total = math.log2(total)
        cost_tables.append([
            (log_total - math.log2(c)) if c else 14.0 for c in h])

    def sym_bits(ctx, tok):
        ct = cost_tables[ctx]
        if ct is None or tok >= len(ct):
            return 14.0
        return ct[tok]

    bit_decrease = 0.0
    total_symbols = 0
    out_lists = []
    min_length = lz77.min_length
    for tokens in tokens_list:
        n = len(tokens)
        total_symbols += n
        # cumulative bit cost
        cum = [0.0] * (n + 1)
        for i, t in enumerate(tokens):
            tok, nbits, _ = uint_config.encode(t.value)
            cum[i + 1] = cum[i] + sym_bits(t.context, tok) + nbits
        out = []
        i = 0
        while i < n:
            num_to_copy = 0
            if i > 0:
                while i + num_to_copy < n and \
                        tokens[i + num_to_copy].value == tokens[i - 1].value:
                    num_to_copy += 1
            if num_to_copy == 0:
                out.append(tokens[i])
                i += 1
                continue
            cost = cum[i + num_to_copy] - cum[i]
            lz77_len = num_to_copy - min_length
            lz77_cost = (max(1, (lz77_len + 1).bit_length()) + 1) \
                if num_to_copy >= min_length else 0.0
            if num_to_copy < min_length or cost <= lz77_cost:
                out.extend(tokens[i:i + num_to_copy])
                i += num_to_copy
                continue
            out.append(Token(tokens[i].context, lz77_len,
                             is_lz77_length=True))
            out.append(Token(num_contexts, distance_symbol))  # -> dist 1
            bit_decrease += cost - lz77_cost
            i += num_to_copy
        out_lists.append(out)
    accepted = bit_decrease > total_symbols * 0.2 + 16
    return out_lists, accepted


def encode_context_map(context_map, num_histograms, writer: BitWriter) -> None:
    """enc_context_map.cc:63-150 (simplified: chooses simple vs MTF-ANS)."""
    if num_histograms == 1:
        writer.write(1, 1)
        writer.write(2, 0)
        return
    entry_bits = max(1, (num_histograms - 1).bit_length())
    if entry_bits < 4 and entry_bits * len(context_map) < 512:
        writer.write(1, 1)
        writer.write(2, entry_bits)
        for entry in context_map:
            writer.write(entry_bits, entry)
        return
    # MTF + single ANS stream
    mtf = _MtfEncoder()
    transformed = [mtf.encode(v) for v in context_map]
    tokens = [Token(0, v) for v in transformed]
    writer.write(1, 0)  # not simple
    writer.write(1, 1)  # use mtf
    codes, _ = build_and_encode_histograms(
        [tokens], 1, writer, uint_config=HybridUintConfig(2, 0, 1),
        allow_clustering=False)
    write_tokens(tokens, codes, [0], writer)


def build_and_encode_histograms(tokens_list, num_contexts, writer: BitWriter,
                                uint_config: HybridUintConfig = DEFAULT_UINT_CONFIG,
                                allow_clustering: bool = True,
                                strategy: str = "fast",
                                lz77_method: str = "none",
                                lz77_dist_symbol: int = 0):
    """BuildAndEncodeHistograms (enc_ans.cc:1521-1608 via HistogramBuilder).

    Encodes LZ77 params, context map, uint configs and histograms into
    `writer`; returns (EntropyEncodingData, context_map).
    lz77_method: "none" or "rle" (ApplyLZ77_RLE; enabled only when the
    estimated saving clears the reference's acceptance threshold).
    """
    codes = EntropyEncodingData()
    if lz77_method == "rle" and num_contexts + 1 <= 256:
        lz77 = LZ77Params()
        lz77.set_default()
        new_lists, accepted = _apply_lz77_rle(tokens_list, num_contexts,
                                              lz77, uint_config,
                                              lz77_dist_symbol)
        if accepted:
            lz77.enabled = True
            tokens_list = new_lists
            codes.lz77 = lz77
            codes.lz77_tokens = new_lists
    if codes.lz77.enabled:
        codes.lz77.write(writer)
        _encode_uint_config(codes.lz77.length_uint_config, writer, 8)
        num_contexts += 1
    else:
        # LZ77 disabled
        writer.write(1, 0)
    # histograms per context
    histograms = _estimate_token_cost(tokens_list, num_contexts, uint_config,
                                      codes.lz77 if codes.lz77.enabled
                                      else None)
    if num_contexts > 1:
        if allow_clustering:
            clustered, context_map = cluster_histograms(histograms,
                                                        CLUSTERS_LIMIT)
        else:
            clustered, context_map = [histograms[0]], [0] * num_contexts
        encode_context_map(context_map, len(clustered), writer)
    else:
        clustered, context_map = [histograms[0]], [0]
    num_histograms = len(clustered)
    # log_alpha_size: max token must fit in 1 << log_alpha for ANS
    max_token = 0
    for h in clustered:
        nz = [i for i, c in enumerate(h) if c > 0]
        if nz:
            max_token = max(max_token, nz[-1])
    log_alpha_size = max(5, max_token.bit_length())
    if log_alpha_size > 8:
        raise JXLError("token too large for ANS alphabet; "
                       "increase split_exponent")
    codes.log_alpha_size = log_alpha_size
    codes.uint_config = [uint_config] * num_histograms
    writer.write(1, 0)  # use_prefix_code = 0
    writer.write(2, log_alpha_size - 5)
    for _ in range(num_histograms):
        _encode_uint_config(uint_config, writer, log_alpha_size)
    for h in clustered:
        alphabet_size = max(1, len(h) - _trailing_zeros(h))
        hist = h[:alphabet_size]
        counts = list(hist)
        if sum(counts) == 0:
            counts[0] = ANS_TAB_SIZE
            method = 1
            omit_pos, num_symbols, symbols = 0, 1, [0]
            encode_counts(counts, alphabet_size, omit_pos, num_symbols, 0,
                          symbols, writer)
        else:
            method, _ = compute_best_method(hist, alphabet_size, strategy)
            if method == 0:
                counts = create_flat_histogram(alphabet_size, ANS_TAB_SIZE)
                encode_flat_histogram(alphabet_size, writer)
            else:
                shift = method - 1
                omit_pos, num_symbols, symbols = normalize_counts(
                    counts, ANS_LOG_TAB_SIZE, shift)
                encode_counts(counts, alphabet_size, omit_pos, num_symbols,
                              shift, symbols, writer)
        table = init_alias_table(counts, log_alpha_size)
        rev, freqs = build_reverse_map(table, alphabet_size)
        codes.encoding_info.append((freqs, rev))
    return codes, context_map


def _trailing_zeros(h) -> int:
    n = 0
    for c in reversed(h):
        if c != 0:
            break
        n += 1
    return min(n, len(h) - 1)


def _encode_uint_config(cfg: HybridUintConfig, writer, log_alpha_size: int):
    """enc_ans.cc:543-556."""
    nbits = _ceil_log2(log_alpha_size + 1)
    writer.write(nbits, cfg.split_exponent)
    if cfg.split_exponent == log_alpha_size:
        return
    nbits = _ceil_log2(cfg.split_exponent + 1)
    writer.write(nbits, cfg.msb_in_token)
    nbits = _ceil_log2(cfg.split_exponent - cfg.msb_in_token + 1)
    writer.write(nbits, cfg.lsb_in_token)


def _ceil_log2(x: int) -> int:
    return (x - 1).bit_length() if x > 1 else 0


def write_tokens(tokens, codes: EntropyEncodingData, context_map,
                 writer: BitWriter, context_offset: int = 0) -> int:
    """WriteTokens ANS path (enc_ans.cc:1728-1813). Returns extra bits."""
    out = []  # list of (nbits, bits), to be written reversed
    num_extra_bits = 0
    state = ANS_SIGNATURE << 16
    for token in reversed(tokens):
        histo = context_map[context_offset + token.context]
        cfg = codes.lz77.length_uint_config if token.is_lz77_length \
            else codes.uint_config[histo]
        tok, nbits, bits = cfg.encode(token.value)
        if token.is_lz77_length:
            tok += codes.lz77.min_symbol
        freqs, rev = codes.encoding_info[histo]
        freq = int(freqs[tok])
        if freq <= 0:
            raise JXLError("token with zero frequency")
        if nbits:
            out.append((nbits, bits))
            num_extra_bits += nbits
        # PutSymbol (enc_ans.h:53-66)
        if (state >> (32 - ANS_LOG_TAB_SIZE)) >= freq:
            out.append((16, state & 0xFFFF))
            state >>= 16
        state = ((state // freq) << ANS_LOG_TAB_SIZE) + int(rev[tok, state % freq])
    writer.write(32, state & 0xFFFFFFFF)
    for nbits, bits in reversed(out):
        writer.write(nbits, bits)
    return num_extra_bits
