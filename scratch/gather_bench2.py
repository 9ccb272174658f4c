"""Probe which Pallas/Mosaic gather forms compile on TPU v5e + their speed."""
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SHAPE = (8, 128)
I32 = jnp.int32


def timeit(fn, *args, n=5):
    r = np.asarray(fn(*args))  # axon tunnel: only readback truly syncs
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), r


def make_runner(kernel, n_args, iters):
    def mk(it):
        def kernel_it(*refs):
            kernel(it, *refs)

        @jax.jit
        def run(*args):
            return pl.pallas_call(
                kernel_it,
                out_shape=jax.ShapeDtypeStruct(SHAPE, I32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_args,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(*args)
        return run
    return mk


def run_kernel(kernel, tables, iters, label):
    # marginal cost: time at iters and at 5*iters, slope = per-iter
    state0 = jnp.arange(1024, dtype=I32).reshape(SHAPE)
    mk = make_runner(kernel, len(tables) + 1, iters)
    try:
        t1, _ = timeit(mk(iters), *tables, state0)
        t2, _ = timeit(mk(iters * 5), *tables, state0)
        per_iter = (t2 - t1) / (iters * 4)
        print(f"{label}: {per_iter*1e9:.0f}ns/iter marginal "
              f"(base {t1*1e3:.1f}ms) -> "
              f"{1024/max(per_iter,1e-12)/1e6:.0f}M lookups/s", flush=True)
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__} {str(e)[:300]}",
              flush=True)


def main():
    iters = 3000

    # A: take_along_axis axis=0 on (64,128) — sublane-dim gather
    def kA(it, tbl_ref, st_ref, out_ref):
        tbl = tbl_ref[:]

        def body(i, s):
            idx = (s + i) & 63                      # (8,128) values 0..63
            # want out[s,l] = tbl[idx[s,l], l] -> need idx shaped (64,128)?
            g = jnp.take_along_axis(tbl, jnp.tile(idx, (8, 1)), axis=0)
            return s + g[:8, :]

        out_ref[:] = jax.lax.fori_loop(0, it, body, st_ref[:])

    tblA = (np.arange(64 * 128, dtype=np.int32) % 1000).reshape(64, 128)
    run_kernel(kA, [jnp.asarray(tblA)], iters, "A take_along axis0 (64,128)")

    # A2: take_along_axis axis=0 with idx same shape as table slice (8,128)
    def kA2(it, tbl_ref, st_ref, out_ref):
        tbl = tbl_ref[:]

        def body(i, s):
            idx = (s + i) & 63
            g = jnp.take_along_axis(tbl, idx, axis=0)
            return s + g

        out_ref[:] = jax.lax.fori_loop(0, it, body, st_ref[:])

    run_kernel(kA2, [jnp.asarray(tblA)], iters,
               "A2 take_along axis0 idx(8,128) from (64,128)")

    # B: take_along_axis axis=1 on (8,128) — lane-dim gather (128-table)
    def kB(it, tbl_ref, st_ref, out_ref):
        tbl = tbl_ref[:]

        def body(i, s):
            idx = (s + i) & 127
            g = jnp.take_along_axis(tbl, idx, axis=1)
            return s + g

        out_ref[:] = jax.lax.fori_loop(0, it, body, st_ref[:])

    tblB = (np.arange(8 * 128, dtype=np.int32) % 1000).reshape(8, 128)
    run_kernel(kB, [jnp.asarray(tblB)], iters, "B take_along axis1 (8,128)")

    # C: dynamic_slice row + lane gather: 1024-entry shared table via
    # 8 rounds of (broadcast row, gather, select)
    def kC(it, tbl_ref, st_ref, out_ref):
        tbl = tbl_ref[:]  # (8,128) = 1024-entry table

        def body(i, s):
            idx = (s + i) & 1023
            r = idx >> 7
            c = idx & 127
            acc = jnp.zeros(SHAPE, I32)
            for k in range(8):
                rowk = jnp.broadcast_to(tbl[k:k+1, :], SHAPE)
                g = jnp.take_along_axis(rowk, c, axis=1)
                acc = jnp.where(r == k, g, acc)
            return s + acc

        out_ref[:] = jax.lax.fori_loop(0, it, body, st_ref[:])

    run_kernel(kC, [jnp.asarray(tblB)], iters,
               "C 1024-entry via 8x(bcast+gather+sel)")

    # D: pure ALU body ~64 int ops — calibrate op throughput
    def kD(it, st_ref, out_ref):
        def body(i, s):
            x = s
            for _ in range(16):
                x = (x * 5 + 7) ^ (x >> 3)
                x = x + (x << 2)
            return x

        out_ref[:] = jax.lax.fori_loop(0, it, body, st_ref[:])

    run_kernel(kD, [], iters, "D ~64 ALU ops")

    # E: axis0 gather on (8,128) from (8,128) -- 8-deep window select
    def kE(it, tbl_ref, st_ref, out_ref):
        tbl = tbl_ref[:]

        def body(i, s):
            idx = (s + i) & 7
            g = jnp.take_along_axis(tbl, idx, axis=0)
            return s + g

        out_ref[:] = jax.lax.fori_loop(0, it, body, st_ref[:])

    run_kernel(kE, [jnp.asarray(tblB)], iters,
               "E take_along axis0 8-deep (window)")

    # F: full mixed symbol-step estimate: 2x 1024-entry lookup +
    # 1x window + ~80 ALU ops
    def kF(it, tbl_ref, win_ref, st_ref, out_ref):
        tbl = tbl_ref[:]
        win = win_ref[:]

        def lookup1024(idx):
            r = idx >> 7
            c = idx & 127
            acc = jnp.zeros(SHAPE, I32)
            for k in range(8):
                rowk = jnp.broadcast_to(tbl[k:k+1, :], SHAPE)
                g = jnp.take_along_axis(rowk, c, axis=1)
                acc = jnp.where(r == k, g, acc)
            return acc

        def body(i, s):
            x = s
            v1 = lookup1024((x + i) & 1023)
            x = x + v1
            v2 = lookup1024((x * 3 + 1) & 1023)
            x = x ^ v2
            w = jnp.take_along_axis(win, x & 7, axis=0)
            x = x + w
            for _ in range(20):
                x = (x * 5 + 7) ^ (x >> 3)
            return x

        out_ref[:] = jax.lax.fori_loop(0, it, body, st_ref[:])

    run_kernel(kF, [jnp.asarray(tblB), jnp.asarray(tblB)], iters,
               "F sym-step mix (2x1024 lut + win + 80 alu)")


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
