"""Readback of COMPUTED device arrays (no host cache) + upload forms."""
import time
import numpy as np
import jax
import jax.numpy as jnp


def t(fn, n=4):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


key = jax.device_put(np.arange(16, dtype=np.uint32))

for mb in (1, 16, 64, 200):
    n = mb * 1024 * 1024

    @jax.jit
    def gen(k, n=n):
        # computed on device each call -> real transfer on asarray
        return (jnp.arange(n, dtype=jnp.uint32) * (k[0] + 1)).astype(jnp.uint8)

    r = gen(key)
    np.asarray(r)
    m = t(lambda: np.asarray(gen(key)))
    print(f"computed readback {mb:4d} MB: {m*1e3:8.1f} ms -> {mb/m:7.0f} MB/s")

# does donate/commit change upload? plain device_put timing isolated:
for mb in (4, 16):
    h = np.random.randint(0, 255, mb * 1024 * 1024, dtype=np.uint8)
    jax.device_put(h)  # warm path

    def up(h=h):
        a = jax.device_put(h)
        a.block_until_ready()  # may be a no-op on axon but try
    m = t(up, n=3)
    print(f"device_put {mb:4d} MB (block_until_ready): {m*1e3:8.1f} ms")

# upload actually forced: use the uploaded array in a computation
for mb in (4, 16):
    h = np.random.randint(0, 255, mb * 1024 * 1024, dtype=np.uint8)

    @jax.jit
    def use(a):
        return a[::65536].astype(jnp.int32).sum()

    np.asarray(use(jax.device_put(h)))

    def upuse(h=h):
        np.asarray(use(jax.device_put(h)))
    m = t(upuse, n=3)
    print(f"upload+use {mb:4d} MB: {m*1e3:8.1f} ms -> {mb/m:7.0f} MB/s")

# async readback overlap: two computed arrays, interleaved
n = 64 * 1024 * 1024

@jax.jit
def gen2(k):
    return (jnp.arange(n, dtype=jnp.uint32) * (k[0] + 1)).astype(jnp.uint8)

r1 = gen2(key); np.asarray(r1)

def serial2():
    np.asarray(gen2(key)); np.asarray(gen2(key))

print(f"2x64MB computed readback serial: {t(serial2, n=3)*1e3:.1f} ms")
