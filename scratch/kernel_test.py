"""Oracle: Pallas kernel (interpret on CPU) vs lockstep simulator vs
host C decoder, on real e3 streams."""
import os, sys, time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np

sys.path.insert(0, "/root/repo")
from libjxl_tpu.api import codestream
from libjxl_tpu.api.codestream import parse_codestream_header
from libjxl_tpu.io.bits import BitReader
from libjxl_tpu.io.frame_header import FrameHeader
from libjxl_tpu.vardct import frame as vf
from libjxl_tpu.ops import ans_tpu, ans_kernel


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


def run_case(n, seeds, distance, effort):
    datas, states, raws = [], [], []
    for seed in seeds:
        img = make_image(n, seed)
        data = codestream.encode_lossy(img, distance=distance,
                                       effort=effort)
        st = decode_state(data, ac_raw=True)
        frame_data, per_pass = st.ac_raw
        datas.append(frame_data)
        states.append(st)
        raws.append(per_pass[0])
    plan = ans_tpu.build_plan(states, datas, raws, shared_tables=False)
    print(f"case n={n} x{len(seeds)} d={distance} e{effort}: "
          f"lanes={plan.n_lanes} max_steps={plan.max_steps}", flush=True)
    sp = ans_kernel.build_serve_plan(plan)

    t0 = time.time()
    tape_s, steps_s, ok_s = ans_tpu.simulate(plan)
    print(f"  sim: {steps_s} steps {time.time()-t0:.1f}s "
          f"ok={ok_s[:plan.n_lanes].all()}", flush=True)

    t0 = time.time()
    tape_dev, regs, ok_k, iters = ans_kernel.decode_device(
        sp, interpret=True, max_steps_hint=steps_s + ans_kernel.F_TOT)
    tape_k = np.asarray(tape_dev).reshape(-1, 1024)[:, :plan.n_lanes]
    ok_k = np.asarray(ok_k).reshape(-1)[:plan.n_lanes]
    print(f"  kernel: {int(iters)} iters ({int(iters)*ans_kernel.F_TOT} "
          f"steps) {time.time()-t0:.1f}s ok={ok_k.all()}", flush=True)

    assert ok_k.all(), np.nonzero(~ok_k)
    T = min(steps_s, tape_k.shape[0])
    if not np.array_equal(tape_s[:T], tape_k[:T]):
        bad = np.nonzero(tape_s[:T] != tape_k[:T])
        t0b, l0 = bad[0][0], bad[1][0]
        print(f"  TAPE MISMATCH first at t={t0b} lane={l0}: "
              f"sim={tape_s[t0b, l0]:08x} k={tape_k[t0b, l0]:08x}")
        raise SystemExit(1)
    assert (tape_k[steps_s:] == 0).all(), "kernel tape not clean after"
    print("  TAPE EXACT", flush=True)

    # phase 2 vs host qimg
    qb = np.asarray(ans_kernel.place_device(sp, tape_dev))
    for si, seed in enumerate(seeds):
        img = make_image(n, seed)
        data = codestream.encode_lossy(img, distance=distance,
                                       effort=effort)
        st_ref = decode_state(data, ac_raw=False)
        if not np.array_equal(st_ref.qimg, qb[si]):
            bad = np.nonzero(st_ref.qimg != qb[si])
            print(f"  QIMG MISMATCH img {si} at",
                  [b[:5] for b in bad])
            print("  ref", st_ref.qimg[bad][:8], "got", qb[si][bad][:8])
            raise SystemExit(1)
    print("  QIMG EXACT", flush=True)


if __name__ == "__main__":
    run_case(512, (3,), 1.0, 3)
    run_case(512, (4, 5), 1.0, 3)
