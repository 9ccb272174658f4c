"""Measure the fused device-entropy batch decode end-to-end on the TPU:
host parse (no AC) + plan build + dispatch + checksum readback, per phase."""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import _make_image
from libjxl_tpu.api import codestream
from libjxl_tpu.api import tpu_codec

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
mp = SIZE * SIZE / 1e6

print(f"encoding {N} streams of {SIZE}x{SIZE}...", flush=True)
streams = []
for i in range(N):
    img = _make_image(SIZE, seed=100 + i)
    streams.append(codestream.encode_lossy(img, distance=1.0, effort=3))
print("encoded", flush=True)

import jax
import jax.numpy as jnp

# phase 1: host prepare
t0 = time.perf_counter()
prog, args, sp = tpu_codec.prepare_tpu_batch_entropy(streams)
t_prep = time.perf_counter() - t0
print(f"host prepare (parse+plan) for {N} streams: {t_prep*1e3:.0f} ms "
      f"({N*mp/t_prep:.1f} MP/s)", flush=True)

# phase 2: dispatch (compile first)
t0 = time.perf_counter()
px, ok = prog(*args)
np.asarray(ok)
print(f"first dispatch (compile): {time.perf_counter()-t0:.1f}s", flush=True)
okh = np.asarray(ok).reshape(-1)[:sp.n_lanes]
print(f"ok lanes: {int(okh.sum())}/{sp.n_lanes}", flush=True)

# timed dispatch w/ checksum readback
@jax.jit
def chk(*a):
    px, ok = prog(*a)
    return px.astype(jnp.int32).sum(axis=(1, 2, 3)), ok

c, ok = chk(*args)
np.asarray(c)
ts = []
for _ in range(4):
    t0 = time.perf_counter()
    np.asarray(chk(*args)[0])
    ts.append(time.perf_counter() - t0)
t_disp = min(ts)
print(f"dispatch+chk readback: {t_disp*1e3:.0f} ms ({N*mp/t_disp:.1f} MP/s)",
      flush=True)

# combined honest e2e (prep fresh + dispatch + checksum readback)
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    prog2, args2, sp2 = tpu_codec.prepare_tpu_batch_entropy(streams)
    c2, ok2 = chk(*args2)
    np.asarray(c2)
    ts.append(time.perf_counter() - t0)
t_e2e = min(ts)
print(f"e2e (prep+dispatch+chk): {t_e2e*1e3:.0f} ms ({N*mp/t_e2e:.1f} MP/s)",
      flush=True)

# verify pixels against host path
imgs_host = tpu_codec.decode_tpu_batch(streams[:1])
pxh = np.asarray(px)[0]
diff = np.abs(pxh.astype(int) - np.asarray(imgs_host[0]).astype(int))
print(f"max diff vs host-entropy path: {diff.max()}", flush=True)
