"""Run the Pallas rANS kernel on the REAL TPU: correctness + timing.

Phase A: correctness on 2 small streams (qimg vs host).
Phase B: timing on a 16-stream 2048^2 batch (the bench shape):
  - entropy kernel alone (tape + ok readback... tape stays on device;
    digest readback only)
  - fused entropy+placement+render program (the bench program)
"""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from libjxl_tpu.api import codestream, tpu_codec
from libjxl_tpu.ops import ans_kernel, ans_tpu

sys.path.insert(0, "/root/repo/tests")
from test_ans_kernel import _image, _plan_for, _decode_state

print("backend:", jax.default_backend(), flush=True)

# ---------- Phase A: small-stream correctness on the chip
datas = [codestream.encode_lossy(_image(512, s), distance=4.0, effort=3)
         for s in (7, 8)]
plan = _plan_for(datas)
sp = ans_kernel.build_serve_plan(plan)
t0 = time.time()
tape_dev, regs, ok, iters = ans_kernel.decode_device(sp, interpret=False)
okv = np.asarray(ok).reshape(-1)[:plan.n_lanes]
print(f"A: kernel ran {float(np.asarray(iters)):.0f} iters in "
      f"{time.time()-t0:.1f}s (incl compile), ok={okv.all()}", flush=True)
assert okv.all(), np.nonzero(~okv)
qb = np.asarray(ans_kernel.place_device(sp, tape_dev))
for si, data in enumerate(datas):
    ref = _decode_state(data, ac_raw=False).qimg
    assert np.array_equal(ref, qb[si]), f"qimg mismatch {si}"
print("A: qimg EXACT on real TPU", flush=True)

# ---------- Phase B: bench-shape timing
def make_image(n=2048, seed=42):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:n, 0:n]
    img = (120 + 60 * np.sin(xx * 0.003) + 50 * np.cos(yy * 0.002 + 1)
           + 20 * np.sin((xx + yy) * 0.01) + rng.normal(0, 5, (n, n)))
    rgb = np.stack([img, img * 0.9 + 10, img * 1.1 - 12], axis=-1)
    return np.clip(rgb, 0, 255).astype(np.uint8)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
print(f"B: encoding {B} streams...", flush=True)
streams = [codestream.encode_lossy(make_image(seed=100 + i),
                                   distance=1.0, effort=3)
           for i in range(B)]
total_bytes = sum(len(s) for s in streams)
print(f"B: {total_bytes/1e6:.1f} MB compressed "
      f"({total_bytes*8/(B*2048*2048):.2f} bpp)", flush=True)

t0 = time.time()
prog, args, sp = tpu_codec.prepare_tpu_batch_entropy(streams)
t_parse = time.time() - t0
print(f"B: host parse+plan: {t_parse:.2f}s "
      f"({B*4.194/t_parse:.0f} MP/s)", flush=True)

arg_mb = sum(np.asarray(a).nbytes for a in args) / 1e6
t0 = time.time()
dargs = jax.device_put(args)
_ = float(jnp.asarray(dargs[0][0]).astype(jnp.int32))  # force
t_up = time.time() - t0
print(f"B: upload {arg_mb:.1f} MB in {t_up:.2f}s "
      f"({arg_mb/t_up:.0f} MB/s)", flush=True)

@jax.jit
def digest(*a):
    px, ok = prog(*a)
    return px.astype(jnp.int32).sum(axis=(1, 2, 3)), ok

t0 = time.time()
chks, ok = digest(*dargs)
chks = np.asarray(chks)
print(f"B: first fused dispatch (incl compile): {time.time()-t0:.1f}s",
      flush=True)
okv = np.asarray(ok).reshape(-1)[:sp.n_lanes]
print("B: ok:", okv.all(), " distinct:",
      len(set(int(c) for c in chks)) == B, flush=True)
assert okv.all()

times = []
for _ in range(5):
    t0 = time.time()
    c, o = digest(*dargs)
    np.asarray(c)
    times.append(time.time() - t0)
t = sorted(times)[len(times)//2]
mp = B * 2048 * 2048 / 1e6
print(f"B: fused decode compute: {t*1e3:.0f} ms -> {mp/t:.0f} MP/s "
      f"(times: {[f'{x:.3f}' for x in times]})", flush=True)

# entropy-only timing (tape digest)
drive = ans_kernel._driver_fn(sp.alias_rows, sp.zd_rows, sp.las,
                              sp.n_per_sub, sp.max_iters, sp.t_alloc,
                              False)

@jax.jit
def entropy_only(flat_hw, lane_off, regs0, rows0, cfg, kz, nzclu,
                 zdclu, a1, a2):
    tape, regs, ok, it = drive(flat_hw, lane_off, regs0, rows0, cfg,
                               kz, nzclu, zdclu, a1, a2)
    return tape.astype(jnp.int64).sum(), ok, it

e_args = dargs[:10]
s_, ok2, it2 = entropy_only(*e_args)
_ = float(np.asarray(s_))
times = []
for _ in range(5):
    t0 = time.time()
    s_, ok2, it2 = entropy_only(*e_args)
    float(np.asarray(s_))
    times.append(time.time() - t0)
t_e = sorted(times)[len(times)//2]
print(f"B: entropy-only: {t_e*1e3:.0f} ms -> {mp/t_e:.0f} MP/s; "
      f"iters={float(np.asarray(it2)):.0f}", flush=True)
