"""Benchmark: VarDCT decode pixel-path throughput on one TPU chip.

Measures the full decode compute pipeline (dequant + CfL + IDCT8 +
XYB->RGB) in megapixels/second on a 2048x2048 image, the hot path that
dominates `djxl` decode time. Baseline: the reference's multithreaded CPU
decode design target of ~400 MP/s (doc/xl_overview.md:7-9, BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from libjxl_tpu.ops.pipeline import decode_pixels
    from libjxl_tpu.vardct.quant_weights import library_tables

    H = W = 2048
    nby, nbx = H // 8, W // 8
    rng = np.random.default_rng(0)
    qcoeffs = jnp.asarray(rng.integers(-15, 15, (3, nby, nbx, 8, 8)),
                          dtype=jnp.int32)
    qf = jnp.full((nby, nbx), 64, dtype=jnp.int32)
    dc = jnp.asarray(rng.normal(0, 0.2, (3, nby, nbx)), dtype=jnp.float32)
    tiles_y, tiles_x = -(-nby // 8), -(-nbx // 8)
    ytox = jnp.zeros((tiles_y, tiles_x), dtype=jnp.int32)
    ytob = jnp.zeros((tiles_y, tiles_x), dtype=jnp.int32)
    dm = jnp.asarray(library_tables()[0][0], dtype=jnp.float32)

    @jax.jit
    def step(qcoeffs, qf, dc, ytox, ytob, dm):
        return decode_pixels(qcoeffs, qf, dc, ytox, ytob, dm,
                             inv_global_scale=jnp.float32(1024.0),
                             x_dm_mult=1.0, b_dm_mult=1.0)

    # warmup / compile
    step(qcoeffs, qf, dc, ytox, ytob, dm).block_until_ready()
    reps = 30
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step(qcoeffs, qf, dc, ytox, ytob, dm)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    mps = (H * W) / dt / 1e6
    baseline = 400.0  # reference multithreaded CPU decode target, MP/s
    print(json.dumps({
        "metric": "vardct_decode_pixel_path_throughput",
        "value": round(mps, 2),
        "unit": "MP/s",
        "vs_baseline": round(mps / baseline, 3),
    }))


if __name__ == "__main__":
    main()
