"""Sharded full-decode pipeline == single-device reference.

Validates build_sharded_decode_full (dequant + IDCT + Gaborish + EPF +
XYB->RGB with one 4-row ppermute halo exchange) against the unsharded
ops.pipeline chain on an 8-device CPU mesh. This is the multi-chip
analog of the reference's LowMemoryRenderPipeline border save/load
(lib/jxl/render_pipeline/low_memory_render_pipeline.h:52-53).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libjxl_tpu.io.frame_header import LoopFilter
from libjxl_tpu.ops import pipeline as pl
from libjxl_tpu.parallel.sharding import (
    GAB_DEFAULT,
    build_sharded_decode_full,
    make_mesh,
)
from libjxl_tpu.render.pipeline import (
    _sad_mul_map,
    compute_sigma,
    gaborish_kernel,
)
from libjxl_tpu.vardct.quant_weights import library_tables


def _inputs(B=2, H=128, W=128, seed=0):
    rng = np.random.default_rng(seed)
    nby, nbx = H // 8, W // 8
    # realistic coefficient magnitudes (quantized AC is mostly small)
    qimg = rng.integers(-3, 4, (B, 3, H, W)).astype(np.int32)
    qf = rng.integers(32, 96, (B, nby, nbx)).astype(np.int32)
    dc = rng.normal(0, 0.15, (B, 3, nby, nbx)).astype(np.float32)
    ytox = np.zeros((B, nby, nbx), np.int32)
    ytob = np.zeros((B, nby, nbx), np.int32)
    dm = np.asarray(library_tables()[0][0], np.float32)
    lf = LoopFilter()
    lf.set_default()
    ispx = np.empty((B, H, W), np.float32)
    for b in range(B):
        isb = compute_sigma(lf, 64 / 65536.0, qf[b],
                            np.full((nby, nbx), 4, np.int32))
        ispx[b] = np.repeat(np.repeat(isb.astype(np.float32), 8, 0), 8, 1)
    sad = _sad_mul_map(H, W, lf.epf_border_sad_mul).astype(np.float32)
    sad = np.broadcast_to(sad, (B, H, W)).copy()
    return qimg, qf, dc, ytox, ytob, dm, ispx, sad


def _reference(qimg, qf, dc, ytox, ytob, dm, ispx, sad, epf_iters):
    gabk = np.stack(
        [gaborish_kernel(*GAB_DEFAULT[c]) for c in range(3)]).astype(
            np.float32)
    outs = []
    for b in range(qimg.shape[0]):
        xyb = pl.decode_xyb_image(
            jnp.asarray(qimg[b]), jnp.asarray(qf[b]), jnp.asarray(dc[b]),
            jnp.asarray(ytox[b]), jnp.asarray(ytob[b]), jnp.asarray(dm),
            inv_global_scale=jnp.float32(1024.0), x_dm_mult=1.0,
            b_dm_mult=1.0)
        x = pl.gaborish_jax(xyb, gabk)
        if epf_iters > 0:
            x = pl.epf_jax(x, jnp.asarray(ispx[b]), jnp.asarray(sad[b]),
                           (40.0, 5.0, 3.5), epf_iters)
        outs.append(np.asarray(pl.xyb_to_rgb_jax(x)))
    return np.stack(outs)


@pytest.mark.parametrize("epf_iters", [0, 2, 3])
def test_sharded_full_matches_single_device(epf_iters):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(jax.devices()[:8], batch=2)
    args = _inputs()
    dec = build_sharded_decode_full(mesh, epf_iters=epf_iters)
    out = np.asarray(dec(*args))
    ref = _reference(*args, epf_iters)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_sharded_full_uneven_batch_mesh():
    """batch=1 mesh (all 8 devices on rows)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(jax.devices()[:8], batch=1)
    args = _inputs(B=1, H=256, W=64, seed=3)
    dec = build_sharded_decode_full(mesh, epf_iters=2)
    out = np.asarray(dec(*args))
    ref = _reference(*args, 2)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
