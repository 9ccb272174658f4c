"""Decompose device entropy-decode time: tape-copy vs kernel vs glue,
and phase-2 cost pieces."""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from libjxl_tpu.api import codestream
from libjxl_tpu.ops import ans_kernel, ans_tpu

sys.path.insert(0, "/root/repo/tests")
from test_ans_kernel import _plan_for


def make_image(n=2048, seed=42):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:n, 0:n]
    img = (120 + 60 * np.sin(xx * 0.003) + 50 * np.cos(yy * 0.002 + 1)
           + 20 * np.sin((xx + yy) * 0.01) + rng.normal(0, 5, (n, n)))
    rgb = np.stack([img, img * 0.9 + 10, img * 1.1 - 12], axis=-1)
    return np.clip(rgb, 0, 255).astype(np.uint8)


B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
streams = [codestream.encode_lossy(make_image(seed=100 + i),
                                   distance=1.0, effort=3)
           for i in range(B)]
plan = _plan_for(streams)
sp = ans_kernel.build_serve_plan(plan)
mp = B * 4.194
print(f"B={B} lanes={sp.n_lanes} max_iters={sp.max_iters}", flush=True)

args = (jnp.asarray(sp.flat_hw), jnp.asarray(sp.lane_off),
        jnp.asarray(sp.regs0), jnp.asarray(sp.rows0),
        jnp.asarray(sp.lane_cfg), jnp.asarray(sp.kz),
        jnp.asarray(sp.nzclu), jnp.asarray(sp.zdclu),
        jnp.asarray(sp.a1), jnp.asarray(sp.a2))


def timed(fn, *a, n=4, force=lambda r: float(np.asarray(r))):
    r = fn(*a)
    force(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        force(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def drv(max_iters, t_alloc):
    run = ans_kernel._driver_fn(sp.alias_rows, sp.zd_rows, sp.las,
                                sp.n_per_sub, max_iters, t_alloc, False)

    @jax.jit
    def f(*a):
        tape, regs, ok, it = run(*a)
        return tape[::97].astype(jnp.int32).sum() + it

    return f

# full bound vs tight tape: isolates the DUS/tape-size cost
for mi in (sp.max_iters, 560, 100):
    ta = mi * ans_kernel.F_TOT
    t = timed(drv(mi, ta), *args)
    print(f"iters_cap={mi:5d} tape={ta*4096/1e6:5.0f}MB: {t*1e3:7.0f} ms"
          f" ({t/min(mi,560)*1e3:.2f} ms/iter)", flush=True)

# glue-only: same while loop, kernel replaced by a no-op (measures
# window gather + packing + DUS + while overhead)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def noop_kernel(win, kz, nzc, zdc, a1, a2, cfg, regs_in, rows_in,
                tape, regs, rows, queue):
    regs[:] = regs_in[:]
    rows[:] = rows_in[:]
    regs[ans_kernel.R_WPOS] = jnp.full((8, 128), 2, jnp.int32)
    tape[0] = win[0]

F_TOT = ans_kernel.F_TOT
NREG = ans_kernel.NREG
WIN_HW, WIN_W = ans_kernel.WIN_HW, ans_kernel.WIN_W


def glue(max_iters, t_alloc):
    @jax.jit
    def f(flat_hw, lane_off, regs0, rows0, cfg, kz, nzclu, zdclu, a1, a2):
        total = flat_hw.shape[0]
        tape0 = jnp.zeros((t_alloc, 8, 128), jnp.int32)
        awp0 = lane_off.reshape(8, 128)

        def body(c):
            it, regs, rows, tape, awp = c
            idx = awp.reshape(1024, 1) + jax.lax.broadcasted_iota(
                jnp.int32, (1, WIN_HW), 1)
            idx = jnp.minimum(idx, total - 1)
            win = jnp.take(flat_hw, idx, axis=0).astype(jnp.int32)
            w32 = win[:, 0::2] | (win[:, 1::2] << 16)
            w32 = jnp.transpose(w32.reshape(8, 128, WIN_W), (2, 0, 1))
            chunk, regs, rows = pl.pallas_call(
                noop_kernel,
                out_shape=(jax.ShapeDtypeStruct((F_TOT, 8, 128), jnp.int32),
                           jax.ShapeDtypeStruct((NREG, 8, 128), jnp.int32),
                           jax.ShapeDtypeStruct((24, 8, 128), jnp.int32)),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
                out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
                scratch_shapes=[pltpu.VMEM((16, 8, 128), jnp.int32)],
                input_output_aliases={7: 1, 8: 2},
            )(w32, kz, nzclu, zdclu, a1, a2, cfg, regs, rows)
            tape = jax.lax.dynamic_update_slice(tape, chunk,
                                                (it * F_TOT, 0, 0))
            awp = awp + regs[ans_kernel.R_WPOS]
            return (it + 1, regs, rows, tape, awp)

        def cond(c):
            return c[0] < max_iters

        it, regs, rows, tape, awp = jax.lax.while_loop(
            cond, body, (jnp.int32(0), regs0, rows0, tape0, awp0))
        return tape[::97].astype(jnp.int32).sum() + it

    return f

for mi, ta in ((560, 560 * F_TOT), (560, sp.t_alloc)):
    t = timed(glue(mi, ta), *args)
    print(f"glue-only iters={mi} tape={ta*4096/1e6:5.0f}MB: {t*1e3:7.0f}"
          f" ms ({t/mi*1e3:.2f} ms/iter)", flush=True)

# phase-2 pieces on a fake tape
T = 560 * F_TOT
tape = jnp.zeros((T, 8, 128), jnp.int32)

@jax.jit
def p2_cumsum(tape):
    tl = tape.reshape(T, 1024)
    return jnp.cumsum((tl >> 30) & 1, axis=0)[-1].astype(jnp.int32).sum()

print(f"p2 cumsum: {timed(p2_cumsum, tape)*1e3:.0f} ms", flush=True)

C = 3072
L = sp.n_lanes if sp.n_lanes else 256

@jax.jit
def p2_search(tape):
    tl = tape.reshape(T, 1024)[:, :1024]
    cum = jnp.cumsum((tl >> 30) & 1, axis=0)
    cum_f = jnp.transpose(cum).reshape(-1)
    q = jax.lax.broadcasted_iota(jnp.int32, (1024, C), 1) + 1
    lo = jnp.zeros((1024, C), jnp.int32)
    hi = jnp.full((1024, C), T, jnp.int32)
    lane_base = jax.lax.broadcasted_iota(jnp.int32, (1024, C), 0) * T

    def bs(_, lh):
        lo, hi = lh
        mid = (lo + hi) >> 1
        v = jnp.take(cum_f, lane_base + mid, axis=0)
        less = v < q
        return jnp.where(less, mid + 1, lo), jnp.where(less, hi, mid)

    lo, hi = jax.lax.fori_loop(0, 18, bs, (lo, hi))
    return lo.astype(jnp.int32).sum()

print(f"p2 cumsum+search: {timed(p2_search, tape)*1e3:.0f} ms", flush=True)

@jax.jit
def p2_gather(tape, starts):
    tl_f = jnp.transpose(tape.reshape(T, 1024)).reshape(-1)
    k = jax.lax.broadcasted_iota(jnp.int32, (1024, C, 64), 2)
    lane_base = jax.lax.broadcasted_iota(jnp.int32, (1024, C, 64), 0) * T
    idx = lane_base + jnp.minimum(starts[:, :, None] + k, T - 1)
    return jnp.take(tl_f, idx, axis=0).astype(jnp.int32).sum()

starts = jnp.zeros((1024, C), jnp.int32)
print(f"p2 big gather: {timed(p2_gather, tape, starts)*1e3:.0f} ms",
      flush=True)
