"""Benchmark: end-to-end VarDCT decode throughput on one TPU chip.

Round-5 methodology — the HEADLINE (`value`) is end-to-end: batched
decode of N distinct real bitstreams with EVERYTHING on the clock
(host rANS entropy decode + argument staging + device dispatch + full
u8 pixel readback), through the public serving pipeline
`api/tpu_codec.decode_tpu_pipelined` (host entropy of batch k+1
overlapped with device render + readback of batch k). This matches
what the reference clocks for its ~400 MP/s design target — one path,
nothing excluded (dec_frame.cc:568,716; doc/xl_overview.md:7-9).

Setup: synthesize N distinct 2048x2048 photo-like images (independent
noise fields), encode each at d1/e3 with this package's encoder (real
VarDCT streams: adaptive quant field, CfL, gaborish+EPF signaled).
All N streams are distinct so no execution cache can fire.

Secondary fields (each a measured wall clock on this machine):
- render_mp_s: device render only, one vmapped dispatch over 16
  distinct streams, device-side checksum readback (the round-3/4
  headline, kept for cross-round comparability).
- entropy_mp_s: host C entropy decode of one stream (pthread pool;
  this rig exposes ONE core, so this is also the pipeline's ceiling).
- device_entropy_mp_s: the Pallas lockstep rANS kernel's fused
  entropy+render path (ops/ans_kernel.py) measured end-to-end on a
  4-stream batch. Reported so the artifact of record carries the
  kernel's real rate (see README "device entropy" for its status).
- e2e_single_mp_s: unpipelined single-stream decode (entropy +
  staging + render + readback of one image; dominated by per-dispatch
  latency through the dev-rig tunnel).
- encode_mp_s: e3 device-encoder rate on the same content.
- encode_e7_mp_s: full-heuristics e7 encode rate (device AQ field +
  device Butteraugli-feedback refinement + ACS search + host entropy).

vs_baseline = value / 400 (the reference's multithreaded-CPU decode
design target). Path to 400: the pipeline ceiling is the host entropy
stage, which scales with cores (per-AC-group pthread pool); this rig
has 1 core at ~39 MP/s, so ~10 cores of entropy — or a device entropy
kernel at >=400 MP/s — saturate the 366+ MP/s device render stage.
"""

import json
import os
import statistics
import sys
import time

import numpy as np


def _make_image(n=2048, seed=42):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:n, 0:n]
    img = (120 + 60 * np.sin(xx * 0.003) + 50 * np.cos(yy * 0.002 + 1)
           + 20 * np.sin((xx + yy) * 0.01) + rng.normal(0, 5, (n, n)))
    rgb = np.stack([img, img * 0.9 + 10, img * 1.1 - 12], axis=-1)
    return np.clip(rgb, 0, 255).astype(np.uint8)


def _probe_backend(timeout_s=240):
    """Initialize the JAX backend in a SUBPROCESS first: an unreachable
    accelerator tunnel blocks backend init forever (uninterruptible C
    call), and a bench that hangs reports nothing. Returns the backend
    name or None."""
    import subprocess

    probe_src = (
        "import os, jax\n"
        "if os.environ.get('JAX_PLATFORMS', '').strip().lower() == 'cpu':\n"
        "    jax.config.update('jax_platforms', 'cpu')\n"
        "print(jax.default_backend())\n")
    try:
        out = subprocess.run(
            [sys.executable, "-c", probe_src],
            capture_output=True, timeout=timeout_s, text=True)
        if out.returncode == 0:
            return out.stdout.strip().splitlines()[-1]
    except subprocess.TimeoutExpired:
        pass
    return None


def _error_json(msg):
    print(json.dumps({
        "metric": "vardct_e2e_decode_pipelined", "value": 0,
        "unit": "MP/s", "vs_baseline": 0.0, "error": msg}), flush=True)


def main():
    if os.environ.get("BENCH_CHILD") != "1":
        # parent: probe the backend, then run the measurement in a
        # watchdogged child — the dev-rig tunnel can wedge MID-RUN
        # (uninterruptible C call), and a bench that hangs reports
        # nothing. The child prints the JSON line; the parent relays
        # it, or prints an error JSON if the child hung or died.
        import subprocess

        backend = _probe_backend()
        if backend is None:
            print("bench: accelerator backend unreachable (init timed "
                  "out)", file=sys.stderr, flush=True)
            _error_json("accelerator backend init timed out; "
                        "no measurement possible on this run")
            return
        print(f"bench: backend {backend}", file=sys.stderr, flush=True)
        env = dict(os.environ, BENCH_CHILD="1")
        wall = int(os.environ.get("BENCH_WALL_S", "2700"))
        try:
            res = subprocess.run([sys.executable, os.path.abspath(
                __file__)], env=env, timeout=wall, capture_output=True,
                text=True)
        except subprocess.TimeoutExpired as e:
            sys.stderr.write((e.stderr or b"").decode("utf-8", "replace")
                             if isinstance(e.stderr, bytes)
                             else (e.stderr or ""))
            _error_json(f"measurement hung for {wall}s (accelerator "
                        "tunnel wedged mid-run); killed by watchdog")
            return
        sys.stderr.write(res.stderr or "")
        line = next((ln for ln in (res.stdout or "").splitlines()
                     if ln.startswith("{") and '"metric"' in ln), None)
        if line is None:
            _error_json(f"measurement child exited rc={res.returncode} "
                        "without a result line")
        else:
            print(line, flush=True)
        return
    backend = "child"

    import jax
    import jax.numpy as jnp

    from libjxl_tpu.api import codestream
    from libjxl_tpu.api.codestream import parse_codestream_header
    from libjxl_tpu.api.tpu_codec import (decode_tpu_batch,
                                          decode_tpu_pipelined,
                                          prepare_tpu_batch)
    from libjxl_tpu.io.bits import BitReader
    from libjxl_tpu.io.frame_header import FrameHeader
    from libjxl_tpu.vardct import frame as vf

    n = 2048
    mp = n * n / 1e6
    batch = 16
    n_streams = int(os.environ.get("BENCH_STREAMS", "48"))
    n_streams = max(batch, (n_streams // batch) * batch)
    print(f"bench: encoding {n_streams} distinct streams...",
          file=sys.stderr, flush=True)
    codestream.encode_lossy(_make_image(n, seed=999), distance=1.0,
                            effort=3)  # warm (jit)
    streams = []
    t_enc = None
    for i in range(n_streams):
        img = _make_image(n, seed=100 + i)
        t0 = time.time()
        streams.append(codestream.encode_lossy(img, distance=1.0,
                                               effort=3))
        if t_enc is None:
            t_enc = time.time() - t0
            print(f"bench: first encode {t_enc:.1f}s", file=sys.stderr,
                  flush=True)
    assert len(set(streams)) == n_streams, "streams must be distinct"

    # --- host entropy decode (C hot loop) of one real bitstream
    n_threads = os.cpu_count() or 1

    def entropy_decode(threads=n_threads):
        r = BitReader(streams[0])
        meta = parse_codestream_header(r)
        fh = FrameHeader(meta)
        fh.read(r)
        cap = {}

        def capture(state):
            cap["state"] = state
            state.restoration_done = True
            state.device_output_done = True

        vf.decode_vardct_frame(r, fh, render_fn=capture, want_qimg=True,
                               num_threads=threads)
        return cap["state"], fh

    entropy_decode()  # warm (builds native tables)
    times = []
    for _ in range(3):
        t0 = time.time()
        entropy_decode()
        times.append(time.time() - t0)
    t_entropy = statistics.median(times)

    # --- device render only (round-3/4 headline, now secondary):
    # one vmapped dispatch over 16 DISTINCT streams, checksum readback
    B = batch
    chks = None
    while B >= 1:
        try:
            print(f"bench: preparing+compiling batch (B={B})...",
                  file=sys.stderr, flush=True)
            prog, args = prepare_tpu_batch(streams[:B])
            args = jax.device_put(args)

            @jax.jit
            def chk_prog(*a):
                # per-image checksum on device: tiny readback, times
                # ONLY the render stage (readback excluded by design —
                # the e2e headline above includes it)
                return prog(*a).astype(jnp.int32).sum(axis=(1, 2, 3))

            t0 = time.time()
            chks = np.asarray(chk_prog(*args))
            print(f"bench: compiled+ran in {time.time()-t0:.0f}s",
                  file=sys.stderr, flush=True)
            break
        except Exception as e:  # HBM/compile-budget: halve the batch
            print(f"bench: B={B} failed ({type(e).__name__}); halving",
                  file=sys.stderr, flush=True)
            B //= 2
    assert chks is not None and len(set(int(c) for c in chks)) == B, \
        "batch lanes must produce distinct images"
    times = []
    for _ in range(4):
        t0 = time.time()
        # host readback of the B checksums is the only true barrier on
        # the dev rig (block_until_ready does not sync axon arrays)
        np.asarray(chk_prog(*args))
        times.append(time.time() - t0)
    t_render = statistics.median(times)
    render_mp_s = mp * B / t_render

    # --- HEADLINE: pipelined end-to-end over all N distinct streams.
    # Everything on the clock: entropy + staging + dispatch + full u8
    # pixel readback. The B=16 render program is compiled by the
    # render-only stage above; the first pipelined run below is
    # steady-state work, not compilation.
    print(f"bench: pipelined e2e over {n_streams} streams...",
          file=sys.stderr, flush=True)
    e2e_times = []
    for _ in range(2):
        t0 = time.time()
        outs = decode_tpu_pipelined(streams, batch_size=batch)
        e2e_times.append(time.time() - t0)
        print(f"bench: pipelined pass {e2e_times[-1]:.2f}s",
              file=sys.stderr, flush=True)
    t_e2e_pipe = min(e2e_times)
    # correctness guard: full pixels came back, all distinct
    sums = {int(o.astype(np.int64).sum()) for o in outs}
    assert len(sums) == n_streams, "pipelined outputs must be distinct"
    assert outs[0].shape == (n, n, 3) and outs[0].dtype == np.uint8
    e2e_pipe_mp_s = mp * n_streams / t_e2e_pipe

    # --- unpipelined single-stream end-to-end (public API)
    decode_tpu_batch([streams[0]])  # warm the B=1 program
    t0 = time.time()
    decode_tpu_batch([streams[1 % n_streams]])
    t_e2e1 = time.time() - t0

    # --- e7 encode (full heuristics: device AQ field + device
    # Butteraugli-feedback refinement + ACS search + host entropy).
    # Measured at 512^2: the rig's remote-compile service rejects the
    # device Butteraugli program above ~512^2 (HTTP 500) and takes
    # minutes to compile it once; the steady-state rate after the warm
    # compile is the honest number (shape reported alongside).
    e7_mp_s = None
    e7_n = 512
    try:
        img7 = _make_image(e7_n, seed=777)
        codestream.encode_lossy(img7, distance=1.0, effort=7)  # compile
        times7 = []
        for _ in range(2):
            t0 = time.time()
            codestream.encode_lossy(img7, distance=1.0, effort=7)
            times7.append(time.time() - t0)
        e7_mp_s = round((e7_n * e7_n / 1e6) / statistics.median(times7),
                        3)
        print(f"bench: e7 encode {statistics.median(times7):.1f}s at "
              f"{e7_n}^2", file=sys.stderr, flush=True)
    except Exception as e:
        print(f"bench: e7 encode skipped ({type(e).__name__}: {e})",
              file=sys.stderr, flush=True)

    # --- device-entropy (Pallas lockstep rANS) fused path, measured
    # end-to-end on a 4-stream batch; best-effort (scope-gated)
    dev_entropy_mp_s = None
    try:
        from libjxl_tpu.api.tpu_codec import decode_tpu_batch_entropy

        sub = streams[:4]
        decode_tpu_batch_entropy(sub)  # warm/compile
        t0 = time.time()
        _, info = decode_tpu_batch_entropy(sub)
        t_dev_ent = time.time() - t0
        if info.get("path") == "device_entropy":
            dev_entropy_mp_s = round(mp * len(sub) / t_dev_ent, 2)
        print(f"bench: device-entropy path {info.get('path')} "
              f"{t_dev_ent:.2f}s", file=sys.stderr, flush=True)
    except Exception as e:
        print(f"bench: device-entropy measurement skipped "
              f"({type(e).__name__}: {e})", file=sys.stderr, flush=True)

    value = round(e2e_pipe_mp_s, 2)
    print(json.dumps({
        "metric": "vardct_e2e_decode_pipelined",
        "value": value,
        "unit": "MP/s",
        "vs_baseline": round(value / 400.0, 3),
        "streams": n_streams,
        "batch": batch,
        "pipelined_wall_s": round(t_e2e_pipe, 3),
        "render_mp_s": round(render_mp_s, 2),
        "render_dispatch_s": round(t_render, 4),
        "entropy_mp_s": round(mp / t_entropy, 2),
        "entropy_threads": n_threads,
        "device_entropy_mp_s": dev_entropy_mp_s,
        "e2e_single_mp_s": round(mp / t_e2e1, 2),
        "encode_mp_s": round(mp / t_enc, 3),
        "encode_e7_mp_s": e7_mp_s,
        "encode_e7_shape": e7_n,
        "checksum": int(chks[0]),
    }))


if __name__ == "__main__":
    main()
