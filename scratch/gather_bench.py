"""Microbenchmark: per-lane vector gather throughput on this TPU.

Decides the architecture of the TPU rANS decoder:
  A. plain-XLA while_loop body with lax.gather from small tables
  B. pallas kernel with in-kernel jnp.take (does Mosaic lower it? how fast?)
  C. pallas one-hot window select (guaranteed-supported fallback)
"""
import functools
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

L = 1024  # lanes
SHAPE = (8, 128)


def timeit(fn, *args, n=5):
    r = fn(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return min(ts), r


def bench_xla_while(table_size=8192, iters=2000, gathers=3):
    """Symbol-step-like body: dependent chained gathers + elementwise."""
    table = jnp.arange(table_size, dtype=jnp.uint32) * jnp.uint32(2654435761) % table_size

    def body(carry):
        i, state = carry
        s = state
        for _ in range(gathers):
            idx = (s >> 4) % table_size
            s = s + table[idx]
        s = (s * jnp.uint32(5) + jnp.uint32(7))
        return i + 1, s

    def cond(carry):
        return carry[0] < iters

    @jax.jit
    def run(state0):
        return jax.lax.while_loop(cond, body, (0, state0))[1]

    state0 = jnp.arange(L, dtype=jnp.uint32).reshape(SHAPE)
    t, _ = timeit(run, state0)
    per_iter = t / iters
    rate = L / per_iter
    print(f"XLA while tbl={table_size} g={gathers}: {per_iter*1e6:.2f}us/iter"
          f" -> {rate/1e6:.0f}M sym/s", flush=True)
    return rate


def bench_pallas_gather(table_size=8192, iters=2000, gathers=3):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(tbl_ref, st_ref, out_ref):
        tbl = tbl_ref[:]

        def body(i, s):
            for _ in range(gathers):
                idx = (s >> 4) % table_size
                s = s + jnp.take(tbl, idx.reshape(-1), axis=0).reshape(SHAPE)
            return (s * 5 + 7)

        out_ref[:] = jax.lax.fori_loop(0, iters, body, st_ref[:])

    @jax.jit
    def run(table, state0):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, state0)

    table = (jnp.arange(table_size, dtype=jnp.uint32) * jnp.uint32(2654435761)) % table_size
    state0 = jnp.arange(L, dtype=jnp.uint32).reshape(SHAPE)
    t, _ = timeit(run, table, state0)
    per_iter = t / iters
    rate = L / per_iter
    print(f"PALLAS take tbl={table_size} g={gathers}: {per_iter*1e6:.2f}us/iter"
          f" -> {rate/1e6:.0f}M sym/s", flush=True)
    return rate


def bench_pallas_2d_gather(table_size=8192, iters=2000):
    """2D-shaped table gather: table as (ts//128, 128), idx decomposed."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    rows = table_size // 128

    def kernel(tbl_ref, st_ref, out_ref):
        tbl = tbl_ref[:]

        def body(i, s):
            idx = (s >> 4) % table_size
            r = idx // 128
            c = idx % 128
            # gather [r, c] per lane
            v = tbl[r, c]
            return (s + v) * 5 + 7

        out_ref[:] = jax.lax.fori_loop(0, iters, body, st_ref[:])

    @jax.jit
    def run(table, state0):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, state0)

    table = ((jnp.arange(table_size, dtype=jnp.uint32) * 2654435761)
             % table_size).reshape(rows, 128)
    state0 = jnp.arange(L, dtype=jnp.uint32).reshape(SHAPE)
    t, _ = timeit(run, table, state0)
    per_iter = t / iters
    print(f"PALLAS 2d-idx tbl={table_size}: {per_iter*1e6:.2f}us/iter"
          f" -> {L/per_iter/1e6:.0f}M sym/s", flush=True)


def bench_pallas_onehot_window(win=64, iters=2000):
    """Per-lane select from a private 64-word window via compare+sum."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(win_ref, st_ref, out_ref):
        w = win_ref[:]  # (win, 8, 128) per-lane windows

        def body(i, s):
            idx = (s >> 4) % win
            ks = jax.lax.broadcasted_iota(jnp.uint32, (win, 8, 128), 0)
            sel = jnp.where(ks == idx[None], w, 0).sum(axis=0)
            return (s + sel) * 5 + 7

        out_ref[:] = jax.lax.fori_loop(0, iters, body, st_ref[:])

    @jax.jit
    def run(wbuf, state0):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(wbuf, state0)

    wbuf = (jnp.arange(win * L, dtype=jnp.uint32).reshape(win, 8, 128)
            * jnp.uint32(2654435761) % jnp.uint32(997))
    state0 = jnp.arange(L, dtype=jnp.uint32).reshape(SHAPE)
    t, _ = timeit(run, wbuf, state0)
    per_iter = t / iters
    print(f"PALLAS onehot win={win}: {per_iter*1e6:.2f}us/iter"
          f" -> {L/per_iter/1e6:.0f}M sym/s", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices(), flush=True)
    if which in ("all", "xla"):
        for ts in (512, 8192):
            bench_xla_while(table_size=ts, iters=2000, gathers=3)
    if which in ("all", "pallas"):
        try:
            bench_pallas_gather(table_size=512, iters=2000, gathers=1)
            bench_pallas_gather(table_size=8192, iters=2000, gathers=3)
        except Exception as e:
            print("PALLAS take failed:", type(e).__name__, str(e)[:500])
    if which in ("all", "pallas2d"):
        try:
            bench_pallas_2d_gather(table_size=8192, iters=2000)
        except Exception as e:
            print("PALLAS 2d failed:", type(e).__name__, str(e)[:500])
    if which in ("all", "onehot"):
        try:
            bench_pallas_onehot_window(win=64, iters=2000)
        except Exception as e:
            print("PALLAS onehot failed:", type(e).__name__, str(e)[:500])
