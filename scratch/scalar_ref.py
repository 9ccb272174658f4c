"""Scalar reference AC decoder (direct port of native/vardct_decode.c)
producing the same step tape as the simulator — for divergence diffs."""
import numpy as np

ANS_LOG = 12
MARKER = 1 << 30

K_FREQ = [0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14,
          15, 15, 16, 16, 17, 17, 18, 18, 19, 19, 20, 20, 21, 21, 22, 22,
          23, 23, 23, 23, 24, 24, 24, 24, 25, 25, 25, 25, 26, 26, 26, 26,
          27, 27, 27, 27, 28, 28, 28, 28, 29, 29, 29, 29, 30, 30, 30, 30]
K_NONZ = [0, 0, 31, 62, 62, 93, 93, 93, 93, 123, 123, 123, 123,
          152, 152, 152, 152, 152, 152, 152, 152, 180, 180, 180, 180, 180,
          180, 180, 180, 180, 180, 180, 180, 206, 206, 206, 206, 206, 206,
          206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206,
          206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206]


class BR:
    def __init__(self, data):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.bits = 0

    def read(self, n):
        while self.bits < n:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.buf |= b << self.bits
            self.pos += 1
            self.bits += 8
        v = self.buf & ((1 << n) - 1)
        self.buf >>= n
        self.bits -= n
        return v


def decode_group_tape(state, sec_bytes, gx, gy):
    """Returns (tape list of ints, ok, trace list of dicts)."""
    from libjxl_tpu.vardct import ac_strategy as acs

    code = state.ac_code[0]
    cmap = np.asarray(state.ac_context_map[0])
    bcm = state.block_ctx_map
    num_ctxs = bcm.num_ctxs
    las = code.log_alpha_size
    les = ANS_LOG - las
    tables = code.alias_tables
    fd = state.fd
    gdim = fd.group_dim // 8
    by0, bx0 = gy * gdim, gx * gdim
    bh = min(fd.ysize_blocks - by0, gdim)
    bw = min(fd.xsize_blocks - bx0, gdim)

    br = BR(sec_bytes)
    st = br.read(32)
    tape = []
    trace = []

    def read_sym(cluster):
        nonlocal st
        res = st & 0xFFF
        i = res >> les
        pos = res & ((1 << les) - 1)
        t = tables[cluster]
        if pos >= t.cutoff[i]:
            sym = int(t.right_value[i])
            off = int(t.offsets1[i]) + pos
            freq = int(t.freq1[i])
        else:
            sym = i
            off = pos
            freq = int(t.freq0[i])
        st = (freq * (st >> ANS_LOG) + off) & 0xFFFFFFFF
        if st < (1 << 16):
            st = ((st << 16) | br.read(16)) & 0xFFFFFFFF
        return sym

    def read_uint(ctx):
        cluster = int(cmap[ctx])
        tok = read_sym(cluster)
        cfg = code.uint_config[cluster]
        split = 1 << cfg.split_exponent
        if tok < split:
            return tok
        ml = cfg.msb_in_token + cfg.lsb_in_token
        nbits = cfg.split_exponent - ml + ((tok - split) >> ml)
        low = tok & ((1 << cfg.lsb_in_token) - 1)
        tok >>= cfg.lsb_in_token
        bits = br.read(nbits)
        return ((((1 << cfg.msb_in_token)
                  | (tok & ((1 << cfg.msb_in_token) - 1)))
                 << nbits) | bits) << cfg.lsb_in_token | low

    bctx_lut = None
    from libjxl_tpu.ops.ans_tpu import _bctx_lut_np
    bctx_lut, qf_thr = _bctx_lut_np(state)
    nqf = len(qf_thr)
    nzm = {c: np.zeros((bh, bw), np.int64) for c in range(3)}
    ok = True
    for by in range(bh):
        for bx in range(bw):
            aby, abx = by0 + by, bx0 + bx
            if not state.is_origin[aby, abx]:
                continue
            s = int(state.strategy[aby, abx])
            bcx, bcy = acs.COVERED_X[s], acs.COVERED_Y[s]
            l2 = acs.LOG2_COVERED[s]
            cb = bcx * bcy
            size = cb * 64
            ordc = acs.STRATEGY_ORDER[s]
            q = int(state.raw_quant_field[aby, abx])
            qfi = 0
            while qfi < nqf and q > qf_thr[qfi]:
                qfi += 1
            for ci in (1, 0, 2):
                cidx = ci ^ 1 if ci < 2 else 2
                bc = int(bctx_lut[cidx, ordc, qfi])
                if bx == 0:
                    pred = nzm[ci][by - 1, bx] if by > 0 else 32
                elif by == 0:
                    pred = nzm[ci][by, bx - 1]
                else:
                    pred = (nzm[ci][by - 1, bx]
                            + nzm[ci][by, bx - 1] + 1) // 2
                pred = min(pred, 64)
                nzb = pred if pred < 8 else 4 + pred // 2
                nz_ctx = nzb * num_ctxs + bc
                nz = read_uint(nz_ctx)
                tape.append(MARKER | nz)
                trace.append(dict(t=len(tape) - 1, kind="nz",
                                  ctx=int(nz_ctx), u=int(nz),
                                  st=st, pred=int(pred), bc=bc))
                if nz > size - cb:
                    return tape, False, trace
                npb = (nz + cb - 1) >> l2
                nzm[ci][by:by + bcy, bx:bx + bcx] = npb
                histo = num_ctxs * 37 + 458 * bc
                prev = 0 if nz > (size >> 4) else 1
                k = cb
                rem = nz
                while k < size and rem:
                    nzl = (rem + cb - 1) >> l2
                    zctx = (K_NONZ[nzl] + K_FREQ[k >> l2]) * 2 + prev
                    u = read_uint(histo + zctx)
                    tape.append(u)
                    trace.append(dict(t=len(tape) - 1, kind="c",
                                      ctx=int(histo + zctx), u=int(u),
                                      st=st, k=k))
                    prev = 1 if u else 0
                    rem -= prev
                    k += 1
                if rem:
                    return tape, False, trace
    ok = st == (0x13 << 16)
    return tape, ok, trace
