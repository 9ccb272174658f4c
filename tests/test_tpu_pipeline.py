"""JAX compute-path tests: batched kernels match the NumPy reference codec,
and the sharded multi-device pipeline compiles and matches single-device.

Runs on the 8-device virtual CPU mesh (conftest.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libjxl_tpu.ops.dct import dct2d, idct2d
from libjxl_tpu.ops.pipeline import (
    blocks_to_image,
    dct8_blocks,
    decode_pixels,
    idct8_blocks,
    image_to_blocks,
    rgb_to_xyb_jax,
    xyb_to_rgb_jax,
)
from libjxl_tpu.ops.xyb import linear_rgb_to_xyb, xyb_to_linear_rgb
from libjxl_tpu.parallel.sharding import (
    build_sharded_decode,
    build_sharded_encode,
    make_mesh,
)

RNG = np.random.default_rng(5)


def test_idct8_blocks_matches_numpy():
    blocks = RNG.normal(size=(3, 4, 5, 8, 8)).astype(np.float32)
    got = np.asarray(idct8_blocks(jnp.asarray(blocks)))
    want = idct2d(blocks.astype(np.float64), 8, 8)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_dct8_roundtrip():
    blocks = RNG.normal(size=(2, 3, 3, 8, 8)).astype(np.float32)
    got = np.asarray(idct8_blocks(dct8_blocks(jnp.asarray(blocks))))
    np.testing.assert_allclose(got, blocks, atol=1e-4)


def test_jax_xyb_matches_numpy():
    rgb = RNG.uniform(0, 1, (3, 16, 16)).astype(np.float32)
    got = np.asarray(rgb_to_xyb_jax(jnp.asarray(rgb)))
    want = linear_rgb_to_xyb(rgb.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=1e-5)
    back = np.asarray(xyb_to_rgb_jax(jnp.asarray(got)))
    np.testing.assert_allclose(back, rgb, atol=1e-4)


def test_blocks_image_roundtrip():
    img = RNG.normal(size=(3, 24, 32)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(blocks_to_image(image_to_blocks(jnp.asarray(img)))), img)


def test_sharded_decode_matches_local():
    mesh = make_mesh(batch=1)
    n_rows = mesh.shape["rows"]
    nby = n_rows * 2
    nbx = 8
    qcoeffs = RNG.integers(-20, 20, (1, 3, nby, nbx, 8, 8)).astype(np.int32)
    qcoeffs[:, :, :, :, 0, 0] = 0
    qf = np.full((1, nby, nbx), 64, dtype=np.int32)
    dc = RNG.normal(0, 0.2, (1, 3, nby, nbx)).astype(np.float32)
    tby, tbx = -(-nby // 8), -(-nbx // 8)
    ytox = np.zeros((1, nby, tbx), dtype=np.int32)  # sharded by rows
    ytob = np.zeros((1, nby, tbx), dtype=np.int32)
    dm = RNG.uniform(0.5, 2.0, (3, 8, 8)).astype(np.float32)

    fn = build_sharded_decode(mesh, apply_gab=False)
    out = np.asarray(fn(qcoeffs, qf, dc, ytox, ytob, dm))
    # single-device reference
    ref = np.asarray(decode_pixels(
        jnp.asarray(qcoeffs[0]), jnp.asarray(qf[0]), jnp.asarray(dc[0]),
        jnp.asarray(ytox[0]), jnp.asarray(ytob[0]), jnp.asarray(dm),
        inv_global_scale=jnp.float32(1024.0), x_dm_mult=1.0, b_dm_mult=1.0))
    np.testing.assert_allclose(out[0], ref, rtol=1e-5, atol=1e-3)


def test_sharded_encode_runs():
    mesh = make_mesh(batch=1)
    n_rows = mesh.shape["rows"]
    h = n_rows * 16
    w = 64
    rgb = RNG.uniform(0, 1, (1, 3, h, w)).astype(np.float32)
    qf = np.full((1, h // 8, w // 8), 64, dtype=np.int32)
    dm_inv = RNG.uniform(0.5, 2.0, (3, 8, 8)).astype(np.float32)
    dm_y = (1.0 / dm_inv[1]).astype(np.float32)
    inv_dc_mul = np.array([512.0, 64.0, 32.0], dtype=np.float32)
    fn = build_sharded_encode(mesh)
    q, qdc = fn(rgb, qf, dm_inv, dm_y, inv_dc_mul)
    assert q.shape == (1, 3, h // 8, w // 8, 8, 8)
    assert qdc.shape == (1, 3, h // 8, w // 8)


def test_sharded_decode_with_gaborish_halo():
    """Halo-exchanged gaborish must match the unsharded whole-image blur."""
    mesh = make_mesh(batch=1)
    n_rows = mesh.shape["rows"]
    nby, nbx = n_rows * 2, 6
    qcoeffs = RNG.integers(-10, 10, (1, 3, nby, nbx, 8, 8)).astype(np.int32)
    qf = np.full((1, nby, nbx), 32, dtype=np.int32)
    dc = RNG.normal(0, 0.1, (1, 3, nby, nbx)).astype(np.float32)
    ytox = np.zeros((1, nby, 1), dtype=np.int32)
    ytob = np.zeros((1, nby, 1), dtype=np.int32)
    dm = np.ones((3, 8, 8), dtype=np.float32)
    sharded = build_sharded_decode(mesh, apply_gab=True)
    out = np.asarray(sharded(qcoeffs, qf, dc, ytox, ytob, dm))[0]

    # reference: unsharded decode + full-image gaborish
    from libjxl_tpu.parallel.sharding import GAB_DEFAULT, _gaborish_local

    ref_rgb = decode_pixels(
        jnp.asarray(qcoeffs[0]), jnp.asarray(qf[0]), jnp.asarray(dc[0]),
        jnp.asarray(ytox[0]), jnp.asarray(ytob[0]), jnp.asarray(dm),
        inv_global_scale=jnp.float32(1024.0), x_dm_mult=1.0, b_dm_mult=1.0)
    padded = jnp.pad(ref_rgb, ((0, 0), (1, 1), (0, 0)), mode="edge")
    ref = np.asarray(_gaborish_local(padded, GAB_DEFAULT))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-3)
