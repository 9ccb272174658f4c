"""Host-side cost of everything EXCEPT AC entropy decode, per stream:
header parse + DC global + DC groups (modular) + AC global + plan build."""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import _make_image
from libjxl_tpu.api import codestream
from libjxl_tpu.api.codestream import parse_codestream_header
from libjxl_tpu.io.bits import BitReader
from libjxl_tpu.io.frame_header import FrameHeader
from libjxl_tpu.vardct import frame as vf
from libjxl_tpu.ops import ans_tpu

img = _make_image(2048, seed=100)
data = codestream.encode_lossy(img, distance=1.0, effort=3)
mp = 2048 * 2048 / 1e6
print(f"stream: {len(data)} bytes = {len(data)/1e6:.2f} MB, "
      f"{len(data)*8/(2048*2048):.3f} bpp")


def parse_no_ac():
    r = BitReader(data)
    meta = parse_codestream_header(r)
    fh = FrameHeader(meta)
    fh.read(r)
    cap = {}

    def capture(state):
        cap["state"] = state
        state.restoration_done = True
        state.device_output_done = True

    vf.decode_vardct_frame(r, fh, render_fn=capture, want_qimg=True,
                           ac_raw=True)
    return cap["state"], fh


st, fh = parse_no_ac()  # warm
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    st, fh = parse_no_ac()
    ts.append(time.perf_counter() - t0)
t_parse = min(ts)
print(f"host parse (no AC): {t_parse*1e3:.1f} ms/stream "
      f"-> {mp/t_parse:.0f} MP/s single-stream")

# plan build cost (on 1 stream; scales linearly)
raw = st.ac_raw  # type: ignore[attr-defined]
t0 = time.perf_counter()
frame_data, per_pass = raw
plan = ans_tpu.build_plan([st], [frame_data], [per_pass[0]])
t_plan = time.perf_counter() - t0
print(f"plan build: {t_plan*1e3:.1f} ms/stream")
print(f"lanes: {plan.n_lanes}, max_hw: {plan.streams_hw.shape}, "
      f"max_chains: {plan.max_chains}, F: {plan.F}, "
      f"max_steps: {plan.max_steps}")
print(f"las={plan.las} alias_rows={plan.alias_rows} cm_rows={plan.cm_rows} "
      f"num_ctxs={plan.num_ctxs} max_bits={plan.max_bits_per_sym}")
# strategy check: all DCT8?
print("strategies:", np.unique(st.strategy), "nqf:",
      len(st.block_ctx_map.qf_thresholds))
