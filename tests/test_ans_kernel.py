"""TPU rANS AC-decode kernel (ops/ans_kernel): exactness oracles.

The Pallas kernel runs in interpret mode on the CPU test mesh; its step
tape must match the lockstep NumPy simulator (ops/ans_tpu.simulate),
which in turn matches native/vardct_decode.c bit-exactly — chaining the
kernel to the C decoder. Phase-2 placement must reproduce the host
qimg exactly, and the fused batch path must reproduce host pixels.

Reference parity: dec_group.cc:453-530 DecodeACVarBlock semantics.
"""

import numpy as np
import pytest

from libjxl_tpu.api import codestream
from libjxl_tpu.api.codestream import parse_codestream_header
from libjxl_tpu.io.bits import BitReader
from libjxl_tpu.io.frame_header import FrameHeader
from libjxl_tpu.ops import ans_kernel, ans_tpu
from libjxl_tpu.vardct import frame as vf


def _decode_state(data, ac_raw):
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


def _image(n, seed, noise=3.0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:n, 0:n]
    img = (128 + 50 * np.sin(xx * 0.013) + 40 * np.cos(yy * 0.009)
           + rng.normal(0, noise, (n, n)))
    rgb = np.stack([img, img * 0.92 + 8, img * 1.05 - 9], axis=-1)
    return np.clip(rgb, 0, 255).astype(np.uint8)


def _plan_for(datas):
    states, frames, raws = [], [], []
    for data in datas:
        st = _decode_state(data, ac_raw=True)
        frame_data, per_pass = st.ac_raw
        states.append(st)
        frames.append(frame_data)
        raws.append(per_pass[0])
    return ans_tpu.build_plan(states, frames, raws, shared_tables=False)


@pytest.fixture(scope="module")
def two_stream_case():
    # d=4 keeps symbol counts small enough for interpret mode
    datas = [codestream.encode_lossy(_image(512, s), distance=4.0,
                                     effort=3) for s in (7, 8)]
    return datas, _plan_for(datas)


def test_kernel_tape_matches_simulator(two_stream_case):
    datas, plan = two_stream_case
    sp = ans_kernel.build_serve_plan(plan)
    tape_s, steps_s, ok_s = ans_tpu.simulate(plan)
    assert ok_s[:plan.n_lanes].all()

    tape_dev, regs, ok, iters = ans_kernel.decode_device(
        sp, interpret=True, max_steps_hint=steps_s + ans_kernel.F_TOT)
    tape_k = np.asarray(tape_dev).reshape(-1, 1024)[:, :plan.n_lanes]
    okv = np.asarray(ok).reshape(-1)[:plan.n_lanes]
    assert okv.all(), np.nonzero(~okv)
    T = min(steps_s, tape_k.shape[0])
    assert np.array_equal(tape_s[:T], tape_k[:T])
    assert (tape_k[steps_s:] == 0).all()


def test_placement_matches_host_qimg(two_stream_case):
    datas, plan = two_stream_case
    sp = ans_kernel.build_serve_plan(plan)
    tape_s, steps_s, _ = ans_tpu.simulate(plan)
    tape_dev, regs, ok, iters = ans_kernel.decode_device(
        sp, interpret=True, max_steps_hint=steps_s + ans_kernel.F_TOT)
    qb = np.asarray(ans_kernel.place_device(sp, tape_dev))
    for si, data in enumerate(datas):
        ref = _decode_state(data, ac_raw=False).qimg
        assert np.array_equal(ref, qb[si]), f"qimg mismatch image {si}"


def test_fused_batch_path_matches_host_pixels(two_stream_case):
    datas, _ = two_stream_case
    from libjxl_tpu.api import tpu_codec

    imgs, info = tpu_codec.decode_tpu_batch_entropy(datas)
    assert info["path"] == "device_entropy", info
    ref = tpu_codec.decode_tpu_batch(datas)
    for a, b in zip(imgs, ref):
        # entropy decode is bit-exact (qimg oracle above); the render
        # runs in a differently-fused XLA program, so f32 rounding
        # boundaries may flip a handful of u8 values by 1
        d = np.abs(a.astype(np.int32) - b.astype(np.int32))
        assert d.max() <= 1
        assert np.count_nonzero(d) <= a.size // 100000 + 4


def test_serve_plan_rejects_out_of_scope():
    # non-multiple-of-256 dims -> host fallback path
    data = codestream.encode_lossy(_image(384, 3), distance=4.0,
                                   effort=3)
    plan = _plan_for([data])
    with pytest.raises(ans_tpu.AnsTpuUnsupported):
        ans_kernel.build_serve_plan(plan)


def test_decode_batch_entropy_falls_back():
    from libjxl_tpu.api import tpu_codec

    data = codestream.encode_lossy(_image(384, 3), distance=4.0,
                                   effort=3)
    imgs, info = tpu_codec.decode_tpu_batch_entropy([data])
    assert info["path"] == "host_entropy"
    assert "fallback" in info
    ref = tpu_codec.decode_tpu_batch([data])
    assert np.array_equal(imgs[0], ref[0])
