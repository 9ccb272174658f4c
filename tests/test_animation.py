"""Multi-frame / animation roundtrips (reference analog: animation tests
in jxl_test.cc)."""

import numpy as np

from libjxl_tpu.api.codestream import decode_frames, encode_animation


def test_lossless_animation_roundtrip():
    rng = np.random.default_rng(4)
    frames = [rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
              for _ in range(4)]
    data = encode_animation(frames, fps_numerator=30)
    out = list(decode_frames(data))
    assert len(out) == 4
    for (dec, dur), orig in zip(out, frames):
        assert dur == 1
        np.testing.assert_array_equal(dec, orig)


def test_lossy_animation_roundtrip():
    yy, xx = np.mgrid[0:40, 0:48]
    frames = []
    for t in range(3):
        f = np.stack([(xx * 2 + t * 10) % 200 + 20,
                      (yy * 3) % 180 + 40,
                      ((xx + yy)) % 160 + 50], axis=-1).astype(np.uint8)
        frames.append(f)
    data = encode_animation(frames, lossless=False, distance=1.5)
    out = list(decode_frames(data))
    assert len(out) == 3
    for (dec, dur), orig in zip(out, frames):
        err = np.mean((dec.astype(float) - orig.astype(float)) ** 2)
        assert err < 100


def test_apng_cli_roundtrip(tmp_path):
    """APNG -> animated JXL (cjxl) -> APNG (djxl), lossless."""
    from PIL import Image

    from libjxl_tpu.tools.cjxl import main as cjxl
    from libjxl_tpu.tools.djxl import main as djxl

    rng = np.random.default_rng(2)
    frames = [Image.fromarray(np.clip(
        rng.integers(0, 256, (32, 40, 3)), 0, 255).astype(np.uint8))
        for _ in range(4)]
    src = tmp_path / "in.apng"
    frames[0].save(src, format="PNG", save_all=True,
                   append_images=frames[1:], duration=[50, 100, 150, 200])
    jxl = tmp_path / "a.jxl"
    out = tmp_path / "out.apng"
    assert cjxl([str(src), str(jxl), "-m", "1"]) == 0
    assert djxl([str(jxl), str(out)]) == 0
    a = Image.open(src)
    b = Image.open(out)
    assert b.n_frames == 4
    durs = []
    for i in range(4):
        a.seek(i)
        b.seek(i)
        assert np.array_equal(np.asarray(a.convert("RGB")),
                              np.asarray(b.convert("RGB")))
        durs.append(b.info.get("duration"))
    assert durs == [50, 100, 150, 200]


def test_lossy_animation_device_decode():
    """decode_frames renders VarDCT animation frames on the device path
    (same program as decode(); f32 vs f64 -> at most 1 u8 step)."""
    import numpy as np

    from libjxl_tpu.api import codestream

    rng = np.random.default_rng(2)
    frames = [np.clip(rng.normal(100 + 40 * i, 30, (256, 256, 3)), 0,
                      255).astype(np.uint8) for i in range(3)]
    stream = codestream.encode_animation(frames, lossless=False,
                                         distance=1.0)
    host = [f for f, _ in codestream.decode_frames(stream, device=False)]
    dev = [f for f, _ in codestream.decode_frames(stream, device=True)]
    assert len(host) == len(dev) == 3
    for a, c in zip(host, dev):
        assert np.abs(a.astype(int) - c.astype(int)).max() <= 1
