"""Pallas TPU kernels for the VarDCT hot ops.

Design note (measured, not assumed): the batched 8x8 IDCT is best left to
XLA — Mosaic's vector layout requires >=128 lanes on the minor dimension,
so per-block (8, 8) matmul batches don't lower, while the XLA einsum path
picks MXU-friendly layouts automatically (~140k MP/s on one v5e chip, see
bench.py). Pallas is used where explicit tiling pays: the element-wise
dequant + quant-bias + chroma-from-luma stage below operates on
coefficient-IMAGE layout (3, H, W) tensors with W = nbx*8 lanes, and is
the template for the EPF gather stages.

Equivalent to the first half of DequantBlock (dec_group.cc:96-140); the
IDCT half stays in ops/pipeline.idct8_blocks.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..base.jaxenv import ensure_cpu_pin

ensure_cpu_pin()
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..io.headers import DEFAULT_QUANT_BIAS

ROWS_PER_PROGRAM = 64  # 8 block-rows of 8 px


def _adjust_bias(q, c):
    b = DEFAULT_QUANT_BIAS
    safe = jnp.where(q == 0, 1.0, q)
    general = q - np.float32(b[3]) / safe
    return jnp.where(q == 0, 0.0,
                     jnp.where(q == 1, np.float32(b[c]),
                               jnp.where(q == -1, np.float32(-b[c]),
                                         general)))


def _dequant_kernel(q_ref, scale_ref, dm_ref, xcc_ref, bcc_ref, out_ref):
    """All inputs in coefficient-image layout (rows = block rows * 8):
    q: i32[3, R, W]; scale: f32[R, W] (inv_gs/qf prebroadcast);
    dm: f32[3, R, W] (dequant matrix tiled); xcc/bcc: f32[R, W]."""
    qx = q_ref[0].astype(jnp.float32)
    qy = q_ref[1].astype(jnp.float32)
    qb = q_ref[2].astype(jnp.float32)
    scale = scale_ref[:]
    dq_y = _adjust_bias(qy, 1) * dm_ref[1] * scale
    dq_x = _adjust_bias(qx, 0) * dm_ref[0] * scale + xcc_ref[:] * dq_y
    dq_b = _adjust_bias(qb, 2) * dm_ref[2] * scale + bcc_ref[:] * dq_y
    out_ref[0] = dq_x
    out_ref[1] = dq_y
    out_ref[2] = dq_b


def dequant_cfl_pallas(q_img, scale_img, dm_img, xcc_img, bcc_img,
                       interpret: bool = False):
    """q_img: i32[3, H, W]; everything else f32[...] prebroadcast.
    Returns dequantized coefficient image f32[3, H, W]."""
    _, h, w = q_img.shape
    rows = min(ROWS_PER_PROGRAM, h)
    while h % rows:
        rows -= 1
    grid = (h // rows,)
    spec3 = pl.BlockSpec((3, rows, w), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    spec1 = pl.BlockSpec((rows, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _dequant_kernel,
        grid=grid,
        in_specs=[spec3, spec1, spec3, spec1, spec1],
        out_specs=spec3,
        out_shape=jax.ShapeDtypeStruct((3, h, w), jnp.float32),
        interpret=interpret,
    )(q_img, scale_img, dm_img, xcc_img, bcc_img)


def decode_pixels_hybrid(qcoeffs, qf, dc, ytox_map, ytob_map, dm,
                         inv_global_scale, x_dm_mult=1.0, b_dm_mult=1.0,
                         color_factor=84.0, base_x=0.0, base_b=1.0,
                         interpret: bool = False):
    """Full decode compute path: Pallas dequant+CfL stage, XLA IDCT + color.

    Same contract as ops.pipeline.decode_pixels."""
    from .pipeline import (
        _tile_to_blocks,
        blocks_to_image,
        idct8_blocks,
        image_to_blocks,
        xyb_to_rgb_jax,
    )

    _, nby, nbx, _, _ = qcoeffs.shape
    h, w = nby * 8, nbx * 8
    # coefficient-image layout
    q_img = qcoeffs.transpose(0, 1, 3, 2, 4).reshape(3, h, w)
    scale = inv_global_scale / qf.astype(jnp.float32)
    scale_img = jnp.repeat(jnp.repeat(scale, 8, 0), 8, 1)
    dm_scaled = dm * jnp.asarray([x_dm_mult, 1.0, b_dm_mult],
                                 dtype=jnp.float32)[:, None, None]
    dm_img = jnp.tile(dm_scaled, (1, nby, nbx))
    x_cc = base_x + _tile_to_blocks(ytox_map, nby, nbx).astype(jnp.float32) \
        / color_factor
    b_cc = base_b + _tile_to_blocks(ytob_map, nby, nbx).astype(jnp.float32) \
        / color_factor
    xcc_img = jnp.repeat(jnp.repeat(x_cc, 8, 0), 8, 1)
    bcc_img = jnp.repeat(jnp.repeat(b_cc, 8, 0), 8, 1)
    coeff_img = dequant_cfl_pallas(q_img, scale_img, dm_img, xcc_img,
                                   bcc_img, interpret=interpret)
    coeffs = image_to_blocks(coeff_img)
    coeffs = coeffs.at[:, :, :, 0, 0].set(dc)
    pixels = idct8_blocks(coeffs)
    return xyb_to_rgb_jax(blocks_to_image(pixels))


# ------------------------------------------------------------------ EPF
_EPF_MIN_SIGMA = -3.90524291751269967465540850526098  # kMinSigma (stage_epf.cc)


def _epf_kernel_body(strip_ref, inv_ref, sad_ref, out_ref, *, pad,
                     neighbors, sad_pattern, channel_scale, sigma_scale):
    """One EPF pass over a row strip (stage_epf.cc Weight math).

    strip_ref: f32[3, rows + 2*pad, w + 2*pad] (halo included);
    inv_ref/sad_ref: f32[rows, w]; out_ref: f32[3, rows, w].
    The neighbor/SAD offsets are Python constants, so the stencil fully
    unrolls into VPU element-wise chains — no gathers.
    """
    rows, w = out_ref.shape[-2:]
    cs = [np.float32(c) for c in channel_scale]

    def sh(dy, dx):
        return strip_ref[0, :, pad + dy:pad + dy + rows,
                         pad + dx:pad + dx + w]

    center = sh(0, 0)
    inv = inv_ref[0] * (sad_ref[0] * np.float32(sigma_scale * 1.65))
    num = center
    den = jnp.ones((rows, w), dtype=jnp.float32)
    for (dy, dx) in neighbors:
        if sad_pattern:
            sad = None
            for (py, px) in sad_pattern:
                a = sh(py, px)
                b = sh(dy + py, dx + px)
                d = (jnp.abs(a[0] - b[0]) * cs[0]
                     + jnp.abs(a[1] - b[1]) * cs[1]
                     + jnp.abs(a[2] - b[2]) * cs[2])
                sad = d if sad is None else sad + d
        else:
            b = sh(dy, dx)
            sad = (jnp.abs(center[0] - b[0]) * cs[0]
                   + jnp.abs(center[1] - b[1]) * cs[1]
                   + jnp.abs(center[2] - b[2]) * cs[2])
        weight = jnp.maximum(0.0, 1.0 + sad * inv)
        num = num + weight[None] * sh(dy, dx)
        den = den + weight
    out = num / den[None]
    skip = inv_ref[0] < np.float32(_EPF_MIN_SIGMA)
    out_ref[0] = jnp.where(skip[None], center, out)


def epf_pass_pallas(xyb, inv_sigma_px, sad_mul, channel_scale, neighbors,
                    sad_pattern, sigma_scale, rows_per_program: int = 64,
                    interpret: bool = False):
    """One EPF pass as a Pallas stencil kernel.

    Strategy: pre-extract overlapping row strips (halo = pad) with XLA,
    then each grid program filters one strip entirely in VMEM with the
    stencil unrolled (plus-shape neighbors/SAD offsets are static).
    Matches ops/pipeline._epf_pass_jax bit-for-bit in float32.
    """
    import functools

    pad = 4
    _, h, w = xyb.shape
    rows = min(rows_per_program, h)
    while h % rows:
        rows -= 1
    n_strips = h // rows
    p = jnp.pad(xyb, ((0, 0), (pad, pad), (pad, pad)), mode="symmetric")
    # (n, 3, rows + 2*pad, w + 2*pad) overlapping strips
    starts = np.arange(n_strips) * rows
    strips = jnp.stack([
        jax.lax.dynamic_slice(
            p, (0, int(s), 0), (3, rows + 2 * pad, w + 2 * pad))
        for s in starts])
    inv_r = inv_sigma_px.reshape(n_strips, rows, w)
    sad_r = sad_mul.reshape(n_strips, rows, w)
    kernel = functools.partial(
        _epf_kernel_body, pad=pad, neighbors=tuple(neighbors),
        sad_pattern=tuple(sad_pattern or ()),
        channel_scale=tuple(float(c) for c in channel_scale),
        sigma_scale=float(sigma_scale))
    out = pl.pallas_call(
        kernel,
        grid=(n_strips,),
        in_specs=[
            pl.BlockSpec((1, 3, rows + 2 * pad, w + 2 * pad),
                         lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, rows, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_strips, 3, rows, w),
                                       jnp.float32),
        interpret=interpret,
    )(strips, inv_r, sad_r)
    return out.transpose(1, 0, 2, 3).reshape(3, h, w)
