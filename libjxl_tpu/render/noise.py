"""Noise synthesis: xorshift128+ RNG, random planes, Laplacian convolution,
luma-modulated addition.

Mirrors lib/jxl/xorshift128plus-inl.h:31-95, dec_noise.cc (BitsToFloat,
RandomImage, Random3Planes, DecodeNoise) and
render_pipeline/stage_noise.cc (ConvolveNoiseStage, AddNoiseStage).
Fully vectorized NumPy (lane layout matches the reference exactly, so
noise fields are reproducible bit-for-bit given the same seeds).
"""

from __future__ import annotations

import numpy as np

NOISE_PRECISION = 1 << 10  # noise.h:22
NUM_NOISE_POINTS = 8
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(z: np.uint64) -> np.uint64:
    z = np.uint64(z)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


class Xorshift128Plus:
    """8-lane xorshift128+ (xorshift128plus-inl.h:31-95)."""

    N = 8

    def __init__(self, seed1, seed2, seed3, seed4):
        with np.errstate(over="ignore"):
            s0 = np.zeros(self.N, dtype=np.uint64)
            s1 = np.zeros(self.N, dtype=np.uint64)
            golden = np.uint64(0x9E3779B97F4A7C15)
            s0[0] = _splitmix64(
                ((np.uint64(seed1) << np.uint64(32)) + np.uint64(seed2))
                + golden)
            s1[0] = _splitmix64(
                ((np.uint64(seed3) << np.uint64(32)) + np.uint64(seed4))
                + golden)
            for i in range(1, self.N):
                s0[i] = _splitmix64(s0[i - 1])
                s1[i] = _splitmix64(s1[i - 1])
        self.s0 = s0
        self.s1 = s1

    def fill(self) -> np.ndarray:
        """Returns 8 uint64 random values; advances state."""
        with np.errstate(over="ignore"):
            s1 = self.s0.copy()
            s0 = self.s1.copy()
            bits = s1 + s0
            self.s0 = s0
            s1 = s1 ^ (s1 << np.uint64(23))
            s1 = s1 ^ s0 ^ (s1 >> np.uint64(18)) ^ (s0 >> np.uint64(5))
            self.s1 = s1
        return bits


def bits_to_floats(batch_u64: np.ndarray) -> np.ndarray:
    """u64 batch -> 16 floats in [1, 2) (dec_noise.cc:39-48)."""
    u32 = batch_u64.view(np.uint32)  # little-endian split
    rand12 = ((u32 >> np.uint32(9)) | np.uint32(0x3F800000)).view(np.float32)
    return rand12


def random_image(rng: Xorshift128Plus, xsize: int, ysize: int) -> np.ndarray:
    """RandomImage (dec_noise.cc:50-84): exact batch layout."""
    out = np.zeros((ysize, xsize), dtype=np.float32)
    kf = Xorshift128Plus.N * 2  # floats per batch
    for y in range(ysize):
        x = 0
        while x + kf < xsize:
            out[y, x:x + kf] = bits_to_floats(rng.fill())
            x += kf
        batch = bits_to_floats(rng.fill())
        # trailing pixels in vector-size (8) steps from one batch
        pos = 0
        while x < xsize:
            n = min(8, xsize - x)
            out[y, x:x + n] = batch[pos:pos + n]
            x += 8
            pos += 8
    return out


def random_3planes(visible_frame: int, nonvisible_frame: int, x0: int,
                   y0: int, xsize: int, ysize: int):
    rng = Xorshift128Plus(visible_frame, nonvisible_frame, x0, y0)
    return [random_image(rng, xsize, ysize) for _ in range(3)]


def convolve_noise(plane: np.ndarray) -> np.ndarray:
    """ConvolveNoiseStage: out = 0.16*sum(5x5 box minus center) - 3.84*center
    (stage_noise.cc:241-279)."""
    p = np.pad(plane, 2, mode="symmetric")
    h, w = plane.shape
    acc = np.zeros((h, w), dtype=np.float64)
    for dy in range(5):
        for dx in range(5):
            if dy == 2 and dx == 2:
                continue
            acc += p[dy:dy + h, dx:dx + w]
    return (acc * 0.16 - 3.84 * plane).astype(np.float32)


def noise_strength(lut, x: np.ndarray) -> np.ndarray:
    """StrengthEvalLut + clamp to [0, 1] (stage_noise.cc:41-123)."""
    lut = np.asarray(lut, dtype=np.float64)
    scale = NUM_NOISE_POINTS - 2
    sx = np.maximum(0.0, x * scale)
    fx = np.floor(sx)
    frac = sx - fx
    over = sx >= scale + 1
    fx = np.where(over, scale, fx)
    frac = np.where(over, 1.0, frac)
    fi = fx.astype(np.int64)
    val = lut[fi] * (1.0 - frac) + lut[fi + 1] * frac
    return np.clip(val, 0.0, 1.0)


def add_noise(xyb: np.ndarray, noise_planes, lut, ytox: float,
              ytob: float) -> np.ndarray:
    """AddNoiseStage (stage_noise.cc:127-225)."""
    norm_const = 0.22
    rnd_r, rnd_g, rnd_c = [convolve_noise(p) for p in noise_planes]
    vx, vy, vb = xyb[0], xyb[1], xyb[2]
    in_g = (vy - vx) * 0.5
    in_r = (vy + vx) * 0.5
    strength_g = noise_strength(lut, in_g)
    strength_r = noise_strength(lut, in_r)
    kc, kn = 0.9921875, 0.0078125
    red_noise = strength_r * (kn * rnd_r * norm_const
                              + kc * rnd_c * norm_const)
    green_noise = strength_g * (kn * rnd_g * norm_const
                                + kc * rnd_c * norm_const)
    rg = red_noise + green_noise
    out = xyb.copy()
    out[0] = vx + ytox * rg + (red_noise - green_noise)
    out[1] = vy + rg
    out[2] = vb + ytob * rg
    return out


def decode_noise(r) -> list:
    """DecodeNoise (dec_noise.cc:142-152): 8 x 10-bit LUT values."""
    return [r.read_bits(10) / NOISE_PRECISION for _ in range(NUM_NOISE_POINTS)]


def encode_noise(lut, w) -> None:
    for v in lut:
        q = int(round(v * NOISE_PRECISION))
        if not 0 <= q < (1 << 10):
            raise ValueError("noise LUT value out of range")
        w.write(10, q)


def photon_noise_lut(iso: float = 800.0) -> list:
    """Simple monotone photon-noise LUT (enc_photon_noise.cc spirit):
    noise strength grows with intensity, scaled by ISO."""
    s = min(1.0, iso / 6400.0)
    xs = np.linspace(0, 1, NUM_NOISE_POINTS)
    # typical reference LUTs are a few percent of full scale
    return list(np.clip(s * (0.01 + 0.07 * np.sqrt(xs)), 0, 1.0))
