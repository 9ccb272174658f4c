"""Benchmark: full VarDCT decode pipeline throughput on one TPU chip.

Measures the complete decode compute path — dequant + CfL + IDCT8 +
Gaborish + 2x edge-preserving filter + XYB->RGB — in megapixels/second
on 4096x4096 images. This is the whole djxl pixel path after entropy
decoding (dec_group.cc + render_pipeline/ stages). Baseline: the
reference's multithreaded CPU decode design target of ~400 MP/s
(doc/xl_overview.md:7-9, BASELINE.md).

Methodology: batched dispatch (vmap over B unique images per call) —
throughput serving amortizes the fixed per-dispatch cost (25-30 ms
through the axon tunnel; absent on directly-attached chips). Every
batch holds unique pre-uploaded coefficient images (identical inputs
can be served from an execution cache by the runtime and must not be
timed) plus a unique DC salt; a device-side reduction forces full
computation with a tiny readback. Median over 3 timed batches.

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
    B = 4  # images per dispatch (6 exceeds the 16 GB HBM)
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

    def one(qimg, salt):
        out = decode_render_image(
            qimg, qf, dc + salt, ytox, ytob, dm,
            inv_global_scale=jnp.float32(1024.0),
            x_dm_mult=1.0, b_dm_mult=1.0, gab_kernels=gab_kernels,
            inv_sigma_px=inv_sigma_px, sad_mul=sad_mul,
            channel_scale=channel_scale, epf_iters=2)
        return out.sum()

    step = jax.jit(lambda qb, salts: jax.vmap(one)(qb, salts).sum())

    NB = 3  # timed batches, all unique
    batches = []
    for _ in range(NB):
        qb = jax.device_put(jnp.asarray(
            rng.integers(-15, 15, (B, 3, H, W)), dtype=jnp.int32))
        qb.sum().block_until_ready()
        batches.append(qb)
    salts = [jnp.asarray(np.arange(B) * 1e-6 + j * 1e-5, jnp.float32)
             for j in range(NB + 1)]
    float(step(batches[0], salts[NB]))  # warmup / compile

    rates = []
    for j in range(NB):
        t0 = time.perf_counter()
        float(step(batches[j], salts[j]))
        dt = time.perf_counter() - t0
        rates.append(B * H * W / dt / 1e6)
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
