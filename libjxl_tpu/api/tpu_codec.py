"""TPU-accelerated encode/decode: device compute, host entropy coding.

The heavy per-pixel math — sRGB->linear->XYB, inverse Gaborish, adaptive
quant field, batched 8x8 DCT (MXU einsum), CfL tile fit, quantization,
and on decode dequant+CfL+IDCT — runs as ONE jitted XLA program
(ops/pipeline.encode_step / decode_xyb). Only the serial, byte-oriented
work (rANS token streams, section/TOC assembly) stays on host, mirroring
the natural split in the reference between enc_group.cc SIMD loops and
enc_ans.cc stream writing.

Produces/consumes exactly the same codestream format as the pure-host
api.codestream functions; streams from either are decodable by both.
On typical content the device encoder is byte-identical to the host
encoder (see tests/test_tpu_codec.py); on large noisy images a handful
of coefficients sitting exactly on a quantization rounding boundary may
flip (float32 device math vs float64 host math), changing bytes without
measurable quality impact.
"""

from __future__ import annotations

import functools

import numpy as np

from ..io.bits import BitReader, BitWriter
from ..io.headers import CodecMetadata, SizeHeader
from .codestream import (
    parse_codestream_header,
    write_codestream_header,
)

K_AC_QUANT = 0.79
K_DC_QUANT = 1.095924047623553


@functools.lru_cache(maxsize=1)
def _jitted():
    import jax

    from ..ops import pipeline as pl
    from ..vardct.heuristics import gaborish_inverse_kernel

    gab_kernel = gaborish_inverse_kernel(1.0).astype(np.float32)

    @functools.partial(jax.jit, static_argnames=("adaptive", "cfl", "gab"))
    def enc(rgb, dm_inv, dm, inv_global_scale, base_quant, x_dm_mult,
            b_dm_mult, qf_in=None, adaptive=True, cfl=True, gab=True):
        return pl.encode_step(rgb, dm_inv, dm,
                              gab_kernel if gab else None,
                              inv_global_scale, base_quant,
                              x_dm_mult, b_dm_mult,
                              adaptive=adaptive, cfl=cfl, qf_in=qf_in)

    @jax.jit
    def dec(qcoeffs, qf, dc, ytox_map, ytob_map, dm, inv_global_scale,
            x_dm_mult, b_dm_mult):
        return pl.decode_xyb(qcoeffs, qf, dc, ytox_map, ytob_map, dm,
                             inv_global_scale, x_dm_mult, b_dm_mult)

    @functools.partial(jax.jit, static_argnames=("epf_iters",))
    def dec_full(qcoeffs, qf, dc, ytox_map, ytob_map, dm, inv_global_scale,
                 x_dm_mult, b_dm_mult, gab_kernels, inv_sigma_px, sad_mul,
                 channel_scale, epf_iters, pass0_scale, pass2_scale):
        return pl.decode_render(qcoeffs, qf, dc, ytox_map, ytob_map, dm,
                                inv_global_scale, x_dm_mult, b_dm_mult,
                                gab_kernels, inv_sigma_px, sad_mul,
                                channel_scale, epf_iters, to_rgb=False,
                                pass0_sigma_scale=pass0_scale,
                                pass2_sigma_scale=pass2_scale)

    @jax.jit
    def srgb2lin(srgb):
        import jax.numpy as jnp

        low = srgb <= 0.04045
        return jnp.where(low, srgb / 12.92,
                         ((srgb + 0.055) / 1.055) ** 2.4)

    return enc, dec, dec_full, srgb2lin


def encode_lossy_tpu(image: np.ndarray, distance: float = 1.0,
                     adaptive_quant: bool = True, cfl: bool = True) -> bytes:
    """Encode an sRGB uint8 (H, W, 3) image lossily with the device
    compute path. Returns a bare JPEG XL codestream (DCT8 strategy)."""
    from ..io.frame_header import (
        CT_XYB,
        ENC_VARDCT,
        FLAG_SKIP_ADAPTIVE_DC_SMOOTHING,
        FT_REGULAR,
        FrameHeader,
    )
    from ..vardct.ctx import QUANT_MAX
    from ..vardct.frame import Quantizer, encode_vardct_frame
    from ..vardct.quant_weights import DequantMatrices

    if image.ndim == 2:
        image = np.repeat(image[:, :, None], 3, axis=2)
    h, w, _ = image.shape
    meta = CodecMetadata()
    meta.size = SizeHeader().set(w, h)
    writer = BitWriter()
    write_codestream_header(writer, meta)
    fh = FrameHeader(meta)
    fh.all_default = False
    fh.frame_type = FT_REGULAR
    fh.encoding = ENC_VARDCT
    fh.color_transform = CT_XYB
    fh.flags = FLAG_SKIP_ADAPTIVE_DC_SMOOTHING
    fh.loop_filter.all_default = False
    fh.loop_filter.gab = True
    fh.loop_filter.epf_iters = 2

    fd = fh.frame_dimensions()
    # pad to block multiple (device needs static 8-multiple shapes)
    srgb = image.astype(np.float32) / 255.0
    srgb = np.moveaxis(srgb, -1, 0)
    pad_y = fd.ysize_padded - h
    pad_x = fd.xsize_padded - w
    srgb = np.pad(srgb, ((0, 0), (0, pad_y), (0, pad_x)), mode="edge")

    # quantizer setup on host (must match encode_vardct_frame's):
    # the full adaptive field needs its median to fix the global scale,
    # so the cheap field math runs host-side in float64 exactly like the
    # host encoder; the heavy DCT/CfL/quantize work stays on device
    matrices = DequantMatrices()
    quantizer = Quantizer(matrices)
    quant_ac = K_AC_QUANT / distance
    quant_dc = K_DC_QUANT / distance
    qf_arr = None
    if adaptive_quant:
        from ..ops.xyb import linear_rgb_to_xyb, srgb_to_linear as s2l
        from ..vardct.heuristics import (
            apply_gaborish_inverse,
            initial_quant_field_full,
        )

        rgb64 = np.moveaxis(s2l(image.astype(np.float64) / 255.0), -1, 0)
        rgb64 = np.pad(rgb64, ((0, 0), (0, pad_y), (0, pad_x)),
                       mode="edge")
        xyb64 = apply_gaborish_inverse(linear_rgb_to_xyb(rgb64))
        nby, nbx = fd.ysize_blocks, fd.xsize_blocks
        qf_float = initial_quant_field_full(xyb64, nby, nbx, distance)
        med = float(np.median(qf_float))
        absd = float(np.median(np.abs(qf_float - med)))
        quant_median = max(med - absd, 1e-4)
        quantizer.compute_global_scale_and_quant(quant_dc, quant_median)
        qf_arr = np.clip(qf_float * quantizer.inv_global_scale + 0.5,
                         1, QUANT_MAX).astype(np.int32)
        base_quant = int(qf_arr.mean())
    else:
        quantizer.compute_global_scale_and_quant(quant_dc, quant_ac)
        base_quant = max(1, min(QUANT_MAX, int(
            quant_ac * quantizer.inv_global_scale + 0.5)))
    dm = np.stack([matrices.dequant_matrix(0, c)
                   for c in range(3)]).astype(np.float32)
    dm_inv = np.stack([matrices.inv_matrix(0, c)
                       for c in range(3)]).astype(np.float32)
    x_dm_mult = (1 / 1.25) ** (fh.x_qm_scale - 2.0)
    b_dm_mult = (1 / 1.25) ** (fh.b_qm_scale - 2.0)

    enc, _, _, srgb2lin = _jitted()
    rgb = srgb2lin(srgb)
    qall, dc, qf, ytox_map, ytob_map, sharp = enc(
        rgb, dm_inv, dm, np.float32(quantizer.inv_global_scale),
        np.float32(base_quant), np.float32(x_dm_mult),
        np.float32(b_dm_mult), qf_in=qf_arr,
        adaptive=adaptive_quant, cfl=cfl)
    precomputed = {
        "quant_median": (quant_median if adaptive_quant
                         else K_AC_QUANT / distance),
        "qall": np.asarray(qall),
        "dc": np.asarray(dc),
        "qf": np.asarray(qf),
        "ytox_map": np.asarray(ytox_map),
        "ytob_map": np.asarray(ytob_map),
        "sharp": np.asarray(sharp),
    }
    encode_vardct_frame(writer, None, fh, distance=distance,
                        precomputed=precomputed)
    return writer.get_bytes()


def decode_tpu(data: bytes):
    """Decode a bare codestream, running dequant+CfL+IDCT on device.

    Falls back to the host render for streams with non-DCT8 strategies.
    Returns (uint8 image (H, W, 3), CodecMetadata)."""
    from ..io.frame_header import FrameHeader
    from ..ops.xyb import linear_to_srgb
    from ..vardct import ac_strategy as acs
    from ..vardct.frame import decode_vardct_frame, render_groups

    r = BitReader(data)
    meta = parse_codestream_header(r)
    fh = FrameHeader(meta)
    fh.read(r)
    _, dec, dec_full, _ = _jitted()

    def render_device(state):
        fd = state.fd
        nby, nbx = fd.ysize_blocks, fd.xsize_blocks
        if any(int(state.strategy[by, bx]) != acs.DCT
               for (by, bx) in state.qblocks):
            render_groups(state)  # host fallback: non-DCT8 stream
            return
        q = np.zeros((3, nby, nbx, 8, 8), dtype=np.int32)
        for (by, bx), blk in state.qblocks.items():
            q[:, by, bx] = blk.reshape(3, 8, 8)
        dm = np.stack([state.matrices.dequant_matrix(0, c)
                       for c in range(3)]).astype(np.float32)
        lf = fh.loop_filter
        gab_kernels = None
        if lf.gab:
            from ..render.pipeline import gaborish_kernel

            gab_kernels = np.stack([
                gaborish_kernel(getattr(lf, f"gab_{ch}_weight1"),
                                getattr(lf, f"gab_{ch}_weight2"))
                for ch in "xyb"]).astype(np.float32)
        h, w = nby * 8, nbx * 8
        if lf.epf_iters > 0:
            from ..render.pipeline import _sad_mul_map, compute_sigma

            inv_sigma_b = compute_sigma(
                lf, state.quantizer.global_scale_float,
                state.raw_quant_field, state.epf_sharpness)
            inv_sigma_px = np.repeat(np.repeat(
                inv_sigma_b.astype(np.float32), 8, 0), 8, 1)[:h, :w]
            sad_mul = _sad_mul_map(h, w, lf.epf_border_sad_mul).astype(
                np.float32)
        else:
            inv_sigma_px = np.zeros((h, w), dtype=np.float32)
            sad_mul = np.ones((h, w), dtype=np.float32)
        xyb = dec_full(q, state.raw_quant_field.astype(np.int32),
                       state.dc.astype(np.float32),
                       state.ytox_map.astype(np.int32),
                       state.ytob_map.astype(np.int32), dm,
                       np.float32(state.quantizer.inv_global_scale),
                       np.float32(state.x_dm_mult),
                       np.float32(state.b_dm_mult), gab_kernels,
                       inv_sigma_px, sad_mul,
                       tuple(np.float32(v) for v in lf.epf_channel_scale),
                       int(lf.epf_iters),
                       np.float32(lf.epf_pass0_sigma_scale),
                       np.float32(lf.epf_pass2_sigma_scale))
        state.xyb = np.asarray(xyb, dtype=np.float64)
        state.restoration_done = True

    chans = decode_vardct_frame(r, fh, render_fn=render_device)
    srgb = linear_to_srgb(np.stack(chans, axis=-1))
    return (np.clip(np.round(srgb * 255.0), 0, 255).astype(np.uint8), meta)
