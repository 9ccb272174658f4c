"""Benchmark: full VarDCT decode pipeline throughput on one TPU chip.

Measures the complete decode compute path — dequant + CfL + IDCT8 +
Gaborish + 2x edge-preserving filter + XYB->RGB — in megapixels/second
on 4096x4096 images. This is the whole djxl pixel path after entropy
decoding (dec_group.cc + render_pipeline/ stages). Baseline: the
reference's multithreaded CPU decode design target of ~400 MP/s
(doc/xl_overview.md:7-9, BASELINE.md).

Methodology: N unique pre-uploaded coefficient images (identical inputs
can be served from an execution cache by the runtime and must not be
timed), device-side reduction to force full computation with a tiny
readback, sustained wall-clock over the batch, median of 3 rounds.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import statistics
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from libjxl_tpu.io.frame_header import LoopFilter
    from libjxl_tpu.ops.pipeline import decode_render_image
    from libjxl_tpu.render.pipeline import (
        _sad_mul_map,
        compute_sigma,
        gaborish_kernel,
    )
    from libjxl_tpu.vardct.quant_weights import library_tables

    H = W = 4096
    nby, nbx = H // 8, W // 8
    rng = np.random.default_rng(0)
    qf_np = np.full((nby, nbx), 64, dtype=np.int32)
    qf = jnp.asarray(qf_np)
    dc = jnp.asarray(rng.normal(0, 0.2, (3, nby, nbx)), dtype=jnp.float32)
    tiles_y, tiles_x = -(-nby // 8), -(-nbx // 8)
    ytox = jnp.zeros((tiles_y, tiles_x), dtype=jnp.int32)
    ytob = jnp.zeros((tiles_y, tiles_x), dtype=jnp.int32)
    dm = jnp.asarray(library_tables()[0][0], dtype=jnp.float32)

    lf = LoopFilter()
    lf.set_default()
    gab_kernels = np.stack([
        gaborish_kernel(getattr(lf, f"gab_{ch}_weight1"),
                        getattr(lf, f"gab_{ch}_weight2"))
        for ch in "xyb"]).astype(np.float32)
    sharp = np.full((nby, nbx), 4, dtype=np.int32)
    inv_sigma_b = compute_sigma(lf, 64.0 / 65536.0, qf_np, sharp)
    inv_sigma_px = jnp.asarray(np.repeat(np.repeat(
        inv_sigma_b.astype(np.float32), 8, 0), 8, 1)[:H, :W])
    sad_mul = jnp.asarray(
        _sad_mul_map(H, W, lf.epf_border_sad_mul).astype(np.float32))
    channel_scale = tuple(np.float32(v) for v in lf.epf_channel_scale)

    @jax.jit
    def step(qimg, salt):
        out = decode_render_image(
            qimg, qf, dc + salt, ytox, ytob, dm,
            inv_global_scale=jnp.float32(1024.0),
            x_dm_mult=1.0, b_dm_mult=1.0, gab_kernels=gab_kernels,
            inv_sigma_px=inv_sigma_px, sad_mul=sad_mul,
            channel_scale=channel_scale, epf_iters=2)
        return out.sum()

    N = 6
    qis = [jax.device_put(jnp.asarray(
        rng.integers(-15, 15, (3, H, W)), dtype=jnp.int32))
        for _ in range(N)]
    for qi in qis:
        qi.sum().block_until_ready()
    salts = [jnp.float32(i * 1e-6) for i in range(3 * N)]
    float(step(qis[0], salts[-1]))  # warmup / compile

    rates = []
    for round_ in range(3):
        t0 = time.perf_counter()
        acc = 0.0
        for i in range(N):
            acc += float(step(qis[i], salts[round_ * N + i]))
        dt = time.perf_counter() - t0
        rates.append(N * H * W / dt / 1e6)
    mps = statistics.median(rates)
    baseline = 400.0  # reference multithreaded CPU decode target, MP/s
    print(json.dumps({
        "metric": "vardct_full_decode_pipeline_throughput",
        "value": round(mps, 2),
        "unit": "MP/s",
        "vs_baseline": round(mps / baseline, 3),
    }))


if __name__ == "__main__":
    main()
