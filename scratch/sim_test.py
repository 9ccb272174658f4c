"""Validate the lockstep NumPy ANS simulator against the C decoder."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from libjxl_tpu.api import codestream
from libjxl_tpu.api.codestream import parse_codestream_header
from libjxl_tpu.io.bits import BitReader
from libjxl_tpu.io.frame_header import FrameHeader
from libjxl_tpu.vardct import frame as vf
from libjxl_tpu.ops import ans_tpu


def decode_state(data, ac_raw):
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
                           ac_raw=ac_raw)
    return cap["state"]


def make_image(n, seed):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:n, 0:n]
    img = (120 + 60 * np.sin(xx * 0.01) + 50 * np.cos(yy * 0.007 + 1)
           + rng.normal(0, 12, (n, n)))
    rgb = np.stack([img, img * 0.9 + 10, img * 1.1 - 12], axis=-1)
    return np.clip(rgb, 0, 255).astype(np.uint8)


def run_case(n, seed, distance, effort):
    img = make_image(n, seed)
    data = codestream.encode_lossy(img, distance=distance, effort=effort)
    print(f"case n={n} d={distance} e{effort}: {len(data)}B", flush=True)
    st_ref = decode_state(data, ac_raw=False)
    st_raw = decode_state(data, ac_raw=True)
    raw = getattr(st_raw, "ac_raw", None)
    assert raw is not None, "no raw capture (single group?)"
    frame_data, per_pass = raw
    plan = ans_tpu.build_plan([st_raw], [frame_data], [per_pass[0]])
    print(f"  lanes={plan.n_lanes} F={plan.F} "
          f"max_bits={plan.max_bits_per_sym} "
          f"ss_hint={plan.n_supersteps_hint}", flush=True)
    t0 = time.time()
    tape, steps, ok = ans_tpu.simulate(plan)
    print(f"  sim: {steps} steps in {time.time()-t0:.1f}s "
          f"ok={ok[:plan.n_lanes].all()}", flush=True)
    assert ok[:plan.n_lanes].all(), np.nonzero(~ok[:plan.n_lanes])
    qimgs = ans_tpu.place_numpy(plan, tape)
    ref = st_ref.qimg
    got = qimgs[0]
    if not np.array_equal(ref, got):
        bad = np.nonzero(ref != got)
        print("  MISMATCH at", [b[:5] for b in bad])
        print("  ref", ref[bad][:10], "got", got[bad][:10])
        raise SystemExit(1)
    print("  EXACT MATCH", flush=True)


if __name__ == "__main__":
    run_case(384, 1, 4.0, 1)
    run_case(384, 2, 1.0, 3)
    run_case(512, 3, 1.0, 5)
