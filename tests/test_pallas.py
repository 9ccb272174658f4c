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
