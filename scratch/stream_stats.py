"""Stats of a bench-style stream: table sizes + exact per-lane step counts."""
import sys
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import _make_image
from libjxl_tpu.api import codestream
from libjxl_tpu.api.codestream import parse_codestream_header
from libjxl_tpu.io.bits import BitReader
from libjxl_tpu.io.frame_header import FrameHeader
from libjxl_tpu.vardct import frame as vf
from libjxl_tpu.vardct import ac_strategy as acs

effort = int(sys.argv[1]) if len(sys.argv) > 1 else 3
img = _make_image(2048, seed=100)
data = codestream.encode_lossy(img, distance=1.0, effort=effort)
print(f"e{effort} stream: {len(data)} bytes,"
      f" {len(data)*8/ (2048*2048):.3f} bpp")

r = BitReader(data)
meta = parse_codestream_header(r)
fh = FrameHeader(meta)
fh.read(r)
cap = {}


def capture(state):
    cap["state"] = state
    state.restoration_done = True
    state.device_output_done = True


vf.decode_vardct_frame(r, fh, render_fn=capture, want_qimg=True)
st = cap["state"]
code = st.ac_code[0]
print("num clusters:", len(code.alias_tables))
print("log_alpha_size:", code.log_alpha_size)
print("context_map size:", len(st.ac_context_map[0]),
      "max cluster:", int(np.max(st.ac_context_map[0])))
print("num_histograms:", st.num_histograms)
print("lz77:", code.lz77.enabled, "prefix:", code.use_prefix_code)
bcm = st.block_ctx_map
print("num_ctxs(block):", bcm.num_ctxs, "num_ac_contexts:",
      bcm.num_ac_contexts(), "nqf:", len(bcm.qf_thresholds),
      "num_dc_ctxs:", bcm.num_dc_ctxs)
# max alphabet actually used: scan alias tables for max symbol
mx = 0
for t in code.alias_tables:
    nz = np.nonzero(np.asarray(t.freq0) | np.asarray(t.freq1))[0]
    # right_value symbols
    m1 = int(np.max(t.right_value)) if len(t.right_value) else 0
    mx = max(mx, m1)
print("max right_value symbol (alphabet bound):", mx)

# strategies used
uniq, cnt = np.unique(st.strategy[st.is_origin], return_counts=True)
print("strategies:", {acs.STRATEGY_NAMES[int(s)] if hasattr(acs, 'STRATEGY_NAMES') else int(s): int(c) for s, c in zip(uniq, cnt)})

# exact step counts per group from qimg + orders
fd = st.fd
nby, nbx = fd.ysize_blocks, fd.xsize_blocks
gdim = fd.group_dim // 8
qimg = st.qimg
w = nbx * 8
pass_orders = st.orders[0] if st.orders else {}

steps_per_group = np.zeros(fd.num_groups, dtype=np.int64)
orig = np.argwhere(st.is_origin)
for by, bx in orig:
    s = int(st.strategy[by, bx])
    cx, cy = acs.COVERED_X[s], acs.COVERED_Y[s]
    cb = cx * cy
    size = cb * 64
    cols = cx * 8
    g = (by // gdim) * fd.xsize_groups + (bx // gdim)
    tot = 0
    for c in range(3):
        order = pass_orders.get((acs.STRATEGY_ORDER[s], c))
        if order is None:
            order = acs.natural_coeff_order(s)
        order = np.asarray(order, dtype=np.int64)
        oimg = ((order // cols) * w + order % cols)
        base = by * 8 * w + bx * 8
        vals = qimg[c].reshape(-1)[base + oimg]
        nzpos = np.nonzero(vals[cb:])[0]
        scanned = (nzpos[-1] + 1) if len(nzpos) else 0
        tot += 1 + scanned
    steps_per_group[g] += tot
print("groups:", fd.num_groups, " steps/group: min %d med %d mean %d max %d"
      % (steps_per_group.min(), int(np.median(steps_per_group)),
         steps_per_group.mean(), steps_per_group.max()))
print("total steps:", steps_per_group.sum(),
      "steps/MP:", steps_per_group.sum() / 4.194)
