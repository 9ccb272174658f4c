"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on
real TPU by bench tooling)."""

import numpy as np
import jax.numpy as jnp

from libjxl_tpu.ops.pallas_kernels import decode_pixels_hybrid
from libjxl_tpu.ops.pipeline import decode_pixels

RNG = np.random.default_rng(3)


def test_pallas_dequant_matches_xla():
    nby = nbx = 16
    q = jnp.asarray(RNG.integers(-15, 15, (3, nby, nbx, 8, 8)),
                    dtype=jnp.int32)
    qf = jnp.full((nby, nbx), 48, dtype=jnp.int32)
    dc = jnp.asarray(RNG.normal(0, .2, (3, nby, nbx)), dtype=jnp.float32)
    t = -(-nby // 8)
    ytox = jnp.asarray(RNG.integers(-10, 10, (t, t)), dtype=jnp.int32)
    ytob = jnp.asarray(RNG.integers(-10, 10, (t, t)), dtype=jnp.int32)
    dm = jnp.asarray(RNG.uniform(0.5, 2.0, (3, 8, 8)), dtype=jnp.float32)
    hybrid = decode_pixels_hybrid(q, qf, dc, ytox, ytob, dm,
                                  jnp.float32(1024.0), interpret=True)
    ref = decode_pixels(q, qf, dc, ytox, ytob, dm, jnp.float32(1024.0),
                        1.0, 1.0)
    np.testing.assert_allclose(np.asarray(hybrid), np.asarray(ref),
                               rtol=5e-3, atol=1e-3)


def test_pallas_epf_matches_xla():
    from libjxl_tpu.ops.pallas_kernels import epf_pass_pallas
    from libjxl_tpu.ops.pipeline import _epf_pass_jax

    h = w = 128
    xyb = jnp.asarray(RNG.normal(0, 0.3, (3, h, w)), dtype=jnp.float32)
    inv = jnp.asarray(RNG.uniform(0.1, 3.0, (h, w)), dtype=jnp.float32)
    sad = jnp.asarray(RNG.uniform(0.8, 1.2, (h, w)), dtype=jnp.float32)
    cs = (40.0, 5.0, 3.5)
    # pass-1 geometry (stage_epf.cc): plus-shaped neighbors + SAD pattern
    neigh = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    sadp = [(0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)]
    got = epf_pass_pallas(xyb, inv, sad, cs, neigh, sadp, 0.9,
                          rows_per_program=32, interpret=True)
    # reference formulation multiplies sigma into inv before the kernel
    ref = _epf_pass_jax(xyb, inv, sad, cs, neigh, sadp, 0.9)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
    # pass-2 geometry: no SAD pattern
    got2 = epf_pass_pallas(xyb, inv, sad, cs, neigh, None, 6.5,
                           rows_per_program=64, interpret=True)
    ref2 = _epf_pass_jax(xyb, inv, sad, cs, neigh, None, 6.5)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=2e-4, atol=2e-5)
