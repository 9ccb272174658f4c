"""Which XLA-level gather forms are fast on this TPU?"""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import libjxl_tpu  # enables compilation cache
import jax
import jax.numpy as jnp


def timed(fn, *a, n=4):
    r = float(np.asarray(fn(*a)))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(np.asarray(fn(*a)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


T = 67200
L = 1024
C = 3072
key = jnp.arange(8, dtype=jnp.int32)

# 1. element gather flat (the slow baseline): (L*C) elements
flat = jnp.arange(T * L, dtype=jnp.int32)
idx_lc = jnp.arange(L * C, dtype=jnp.int32).reshape(L, C) % (T * L)

@jax.jit
def g_elem(flat, idx):
    return jnp.take(flat, idx, axis=0).astype(jnp.int32).sum()

print(f"elem gather (L*C={L*C/1e6:.1f}M): {timed(g_elem, flat, idx_lc)*1e3:.0f} ms", flush=True)

# 2. slice-64 gather: same count of starts, each pulls 64 contiguous
starts = (jnp.arange(L * C, dtype=jnp.int32).reshape(L, C) * 7) % (T - 64)
lane_base = (jnp.arange(L, dtype=jnp.int32) * T)[:, None]

@jax.jit
def g_slice64(flat, starts):
    st = (starts + lane_base).reshape(-1, 1)
    out = jax.lax.gather(
        flat, st,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(),
            start_index_map=(0,)),
        slice_sizes=(64,), mode="clip")
    return out.astype(jnp.int32).sum()

print(f"slice64 gather ({L*C/1e6:.1f}M x 64): {timed(g_slice64, flat, starts)*1e3:.0f} ms", flush=True)

# 3. take_along_axis (L, T) x (L, C) — the search inner op
mat = jnp.arange(L * T, dtype=jnp.int32).reshape(L, T)
midx = (jnp.arange(L * C, dtype=jnp.int32).reshape(L, C) * 11) % T

@jax.jit
def g_taa(mat, midx):
    return jnp.take_along_axis(mat, midx, axis=1).astype(jnp.int32).sum()

print(f"take_along_axis (L,T)x(L,C): {timed(g_taa, mat, midx)*1e3:.0f} ms", flush=True)

# 4. the window gather form: (1024, 256) from flat u16 with affine idx
N = 8 * 1024 * 1024
flat16 = jnp.arange(N, dtype=jnp.uint16)
awp = (jnp.arange(1024, dtype=jnp.int32) * 997) % (N - 256)

@jax.jit
def g_win(flat16, awp):
    idx = awp[:, None] + jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
    win = jnp.take(flat16, idx, axis=0).astype(jnp.int32)
    return win.sum()

print(f"window gather (1024x256 u16): {timed(g_win, flat16, awp)*1e3:.2f} ms", flush=True)

# 5. window via dynamic_slice vmap (explicit slice form)
@jax.jit
def g_win_ds(flat16, awp):
    def one(s):
        return jax.lax.dynamic_slice(flat16, (s,), (256,))
    win = jax.vmap(one)(awp).astype(jnp.int32)
    return win.sum()

print(f"window ds-vmap (1024x256 u16): {timed(g_win_ds, flat16, awp)*1e3:.2f} ms", flush=True)

# 6. while-loop overhead with a trivial body at this carry size
tape0 = jnp.zeros((67200, 8, 128), jnp.int32)

@jax.jit
def wl(flat16, awp):
    def body(c):
        it, t = c
        t = jax.lax.dynamic_update_slice(
            t, jnp.full((120, 8, 128), it, jnp.int32), (it * 120, 0, 0))
        return (it + 1, t)

    it, t = jax.lax.while_loop(lambda c: c[0] < 560, body,
                               (jnp.int32(0), tape0))
    return t[::97].astype(jnp.int32).sum()

print(f"while-loop 560 iters (DUS only): {timed(wl, flat16, awp)*1e3:.0f} ms", flush=True)

# 7. pallas no-op call overhead in a while loop
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def nk(a_ref, o_ref):
    o_ref[0] = a_ref[0]

@jax.jit
def wl_pallas(flat16, awp):
    a = jnp.zeros((120, 8, 128), jnp.int32)

    def body(c):
        it, acc = c
        r = pl.pallas_call(
            nk, out_shape=jax.ShapeDtypeStruct((120, 8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(acc)
        return (it + 1, r)

    it, r = jax.lax.while_loop(lambda c: c[0] < 560, body,
                               (jnp.int32(0), a))
    return r.astype(jnp.int32).sum()

print(f"while-loop 560 pallas-noop: {timed(wl_pallas, flat16, awp)*1e3:.0f} ms", flush=True)

# 8. no-transpose window gather: idx (512, 8, 128) directly
awp8 = ((jnp.arange(1024, dtype=jnp.int32) * 997) % (N - 600)).reshape(8, 128)

@jax.jit
def g_win_direct(flat16, awp8):
    i = jax.lax.broadcasted_iota(jnp.int32, (512, 1, 1), 0)
    win = jnp.take(flat16, awp8[None] + i, axis=0).astype(jnp.int32)
    return win.sum()

print(f"window direct (512,8,128): {timed(g_win_direct, flat16, awp8)*1e3:.2f} ms", flush=True)

# 9. same inside a 560-iter while (amortized measurement)
@jax.jit
def g_win_loop(flat16, awp8):
    def body(c):
        it, acc, a = c
        i = jax.lax.broadcasted_iota(jnp.int32, (512, 1, 1), 0)
        win = jnp.take(flat16, a[None] + i, axis=0).astype(jnp.int32)
        return (it + 1, acc + win[0, 0, 0], (a + 3) % (N - 600))

    it, acc, a = jax.lax.while_loop(lambda c: c[0] < 560, body,
                                    (jnp.int32(0), jnp.int32(0), awp8))
    return acc

print(f"window direct x560 loop: {timed(g_win_loop, flat16, awp8)*1e3:.0f} ms", flush=True)

# 10. old form x560 (gather+pack+transpose) for comparison
@jax.jit
def g_win_old_loop(flat16, awp8):
    def body(c):
        it, acc, a = c
        idx = a.reshape(1024, 1) + jax.lax.broadcasted_iota(
            jnp.int32, (1, 256), 1)
        win = jnp.take(flat16, idx, axis=0).astype(jnp.int32)
        w32 = win[:, 0::2] | (win[:, 1::2] << 16)
        w32 = jnp.transpose(w32.reshape(8, 128, 128), (2, 0, 1))
        return (it + 1, acc + w32[0, 0, 0], (a + 3) % (N - 600))

    it, acc, a = jax.lax.while_loop(lambda c: c[0] < 560, body,
                                    (jnp.int32(0), jnp.int32(0),
                                     awp8.reshape(8, 128)))
    return acc

print(f"window old-form x560 loop: {timed(g_win_old_loop, flat16, awp8)*1e3:.0f} ms", flush=True)

# 11. big static transpose (padded phase-2 cost): (196608,8,128) relayout
big = jnp.zeros((196608, 8, 128), jnp.int32)

@jax.jit
def p2_pad2(t):
    x = jnp.transpose(t.reshape(1024, 3, 64, 8, 128), (3, 4, 0, 1, 2))
    u = x & 0x3FFFFFFF
    coeff = jnp.where((u & 1) == 1, -((u + 1) >> 1), u >> 1)
    return coeff.astype(jnp.int32).sum()

print(f"padded phase2 transpose+unpack: {timed(p2_pad2, big)*1e3:.0f} ms", flush=True)
