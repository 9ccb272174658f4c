"""Probe wider Mosaic gather shapes for per-lane window access."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32


def timeit(fn, *args, n=5):
    r = np.asarray(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), r


def probe(label, tbl_shape, idx_shape, axis, idx_mod, iters=2000):
    out_shape = idx_shape

    def mk(it):
        def kernel(tbl_ref, st_ref, out_ref):
            tbl = tbl_ref[:]

            def body(i, s):
                idx = (s + i) % idx_mod
                g = jnp.take_along_axis(tbl, idx, axis=axis)
                return s + g

            out_ref[:] = jax.lax.fori_loop(0, it, body, st_ref[:])

        @jax.jit
        def run(tbl, st):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(out_shape, I32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(tbl, st)
        return run

    tbl = jnp.asarray((np.arange(np.prod(tbl_shape)) % 997)
                      .reshape(tbl_shape).astype(np.int32))
    st = jnp.asarray((np.arange(np.prod(idx_shape)) % idx_mod)
                     .reshape(idx_shape).astype(np.int32))
    try:
        r1 = mk(iters)
        t1, _ = timeit(r1, tbl, st)
        t2, _ = timeit(mk(iters * 5), tbl, st)
        per = (t2 - t1) / (iters * 4)
        n_el = np.prod(idx_shape)
        print(f"{label}: {per*1e9:.0f}ns/iter ({per*1e9/ (n_el/1024):.0f}"
              f"ns per 1024 lookups)", flush=True)
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__} {str(e)[:200]}",
              flush=True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    # per-lane window: (1024, W) rows, idx per row
    probe("rowgather (1024,256) idx(1024,256) ax1", (1024, 256),
          (1024, 256), 1, 256, iters=500)
    probe("rowgather (1024,8) idx(1024,8) ax1", (1024, 8),
          (1024, 8), 1, 8, iters=2000)
    probe("rowgather (128,256) idx(128,256) ax1", (128, 256),
          (128, 256), 1, 256, iters=1000)
    # wide lane gather: value range crosses 128-lane registers
    probe("widegather (8,1024) idx(8,1024) ax1", (8, 1024),
          (8, 1024), 1, 1024, iters=1000)
    probe("deep axis0 (16,128) idx(16,128)", (16, 128),
          (16, 128), 0, 16, iters=1000)
    probe("deep axis0 (32,128) idx(32,128)", (32, 128),
          (32, 128), 0, 32, iters=1000)
    probe("axis0 (8,256) idx(8,256)", (8, 256), (8, 256), 0, 8,
          iters=1000)
