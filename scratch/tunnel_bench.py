"""Measure axon-tunnel characteristics: dispatch overhead, upload and
readback bandwidth, async overlap between host compute and device."""
import time
import numpy as np
import jax
import jax.numpy as jnp

dev = jax.devices()[0]
print("device:", dev)


def t(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), ts


# 1. dispatch overhead: trivial jitted fn, readback 4 bytes
@jax.jit
def tiny(x):
    return x + 1

x1 = jax.device_put(np.zeros((1,), np.int32))
np.asarray(tiny(x1))
m, _ = t(lambda: np.asarray(tiny(x1)))
print(f"dispatch+4B readback: {m*1e3:.1f} ms")

# 2. readback bandwidth: u8 arrays of increasing size
for mb in (1, 16, 64, 200):
    n = mb * 1024 * 1024
    a = jax.device_put(np.zeros((n,), np.uint8))
    np.asarray(a[:4])
    m, _ = t(lambda a=a: np.asarray(a), n=3)
    print(f"readback {mb:4d} MB: {m*1e3:8.1f} ms -> {mb/m:8.0f} MB/s")

# 3. upload bandwidth
for mb in (1, 16, 64):
    n = mb * 1024 * 1024
    h = np.zeros((n,), np.uint8)

    def up(h=h):
        a = jax.device_put(h)
        np.asarray(a[:4])  # force
    up()
    m, _ = t(up, n=3)
    print(f"upload   {mb:4d} MB: {m*1e3:8.1f} ms -> {mb/m:8.0f} MB/s")

# 4. async overlap: dispatch a ~100ms device program, then do host work,
# then read back. If async works, total ~= max(host, device).
N = 8192
a = jax.device_put(np.ones((N, N), np.float32))

@jax.jit
def heavy(a):
    def body(i, x):
        return x @ a * 1e-5 + x
    return jax.lax.fori_loop(0, 60, body, a)[:8, :8]

np.asarray(heavy(a))
m_dev, _ = t(lambda: np.asarray(heavy(a)), n=3)
print(f"heavy device program: {m_dev*1e3:.1f} ms")

host_work = np.random.default_rng(0).random((3000, 3000))

def host_job():
    return host_work @ host_work[:, :100]

t0 = time.perf_counter()
host_job()
m_host = time.perf_counter() - t0
print(f"host job: {m_host*1e3:.1f} ms")

def overlapped():
    r = heavy(a)       # async dispatch?
    host_job()
    np.asarray(r)

m_ov, _ = t(overlapped, n=3)
print(f"overlapped: {m_ov*1e3:.1f} ms  (serial would be "
      f"{(m_dev+m_host)*1e3:.1f} ms; perfect overlap "
      f"{max(m_dev, m_host)*1e3:.1f} ms)")

# 5. readback overlap with device compute: start heavy, then asarray a
# large resident buffer while it runs
big = jax.device_put(np.zeros((64 * 1024 * 1024,), np.uint8))
np.asarray(big[:4])

def rb():
    np.asarray(big)

m_rb, _ = t(rb, n=3)
print(f"readback 64MB alone: {m_rb*1e3:.1f} ms")

def rb_overlap():
    r = heavy(a)
    np.asarray(big)
    np.asarray(r)

m_rbo, _ = t(rb_overlap, n=3)
print(f"readback+compute overlapped: {m_rbo*1e3:.1f} ms "
      f"(serial {(m_rb+m_dev)*1e3:.1f}, perfect {max(m_rb, m_dev)*1e3:.1f})")
