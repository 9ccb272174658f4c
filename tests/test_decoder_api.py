"""Suspendable decoder state machine (api.decoder vs decode.h protocol).

Mirrors the reference decode_test.cc style: feed input in chunks, check
the event order, flush partial images at truncation points and require
monotonic improvement, and match the one-shot decoder at the end.
"""

import numpy as np
import pytest

from libjxl_tpu.api import codestream, decoder
from libjxl_tpu.base.status import JXLError


def _image(h=160, w=200, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(xx * 255 // w), (yy * 255 // h),
                    ((xx + yy) * 255 // (h + w))], axis=-1).astype(np.int32)
    img += rng.integers(-12, 13, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def _rmse(a, b):
    return float(np.sqrt(((a.astype(np.float64)
                           - b.astype(np.float64)) ** 2).mean()))


def test_event_order_and_final_image():
    img = _image()
    stream = codestream.encode_lossy(img, distance=1.0, effort=3)
    oneshot, _ = codestream.decode(stream)

    dec = decoder.Decoder()
    dec.set_input(stream)
    dec.close_input()
    events = []
    for _ in range(10):
        ev = dec.process()
        events.append(ev)
        if ev == decoder.SUCCESS or ev == decoder.FULL_IMAGE:
            break
    assert events[:3] == [decoder.BASIC_INFO, decoder.COLOR_ENCODING,
                          decoder.FRAME]
    assert decoder.FULL_IMAGE in events
    info = dec.basic_info
    assert (info["xsize"], info["ysize"]) == (200, 160)
    assert np.array_equal(dec.image, oneshot[:, :, :3])
    assert dec.process() == decoder.SUCCESS


def test_incremental_feeding_need_more_input():
    img = _image(seed=5)
    stream = codestream.encode_lossy(img, distance=1.0, effort=3)
    dec = decoder.Decoder()
    pos = 0
    chunk = 97
    events = []
    while True:
        ev = dec.process()
        if ev == decoder.NEED_MORE_INPUT:
            if pos >= len(stream):
                dec.close_input()
                continue
            dec.set_input(stream[pos:pos + chunk])
            pos += chunk
            continue
        events.append(ev)
        if ev in (decoder.FULL_IMAGE, decoder.SUCCESS):
            break
    assert decoder.BASIC_INFO in events
    assert decoder.FULL_IMAGE in events
    oneshot, _ = codestream.decode(stream)
    assert np.array_equal(dec.image, oneshot[:, :, :3])


def test_flush_is_monotone_and_progressive():
    # big enough for several 256px AC groups
    img = _image(300, 560, seed=9)
    stream = codestream.encode_lossy(img, distance=1.0, effort=3)
    final, _ = codestream.decode(stream)
    final = final[:, :, :3].astype(np.float64)

    fractions = [0.35, 0.55, 0.75, 0.9, 1.0]
    last_err = None
    flushed_any = False
    for frac in fractions:
        dec = decoder.Decoder()
        dec.set_input(stream[:int(len(stream) * frac)])
        while dec.process() not in (decoder.NEED_MORE_INPUT,
                                    decoder.FULL_IMAGE, decoder.SUCCESS):
            pass
        partial = dec.flush_image()
        if partial is None:
            assert frac < 0.5, "flush should work once DC arrived"
            continue
        flushed_any = True
        err = _rmse(partial[:, :, :3], final)
        if last_err is not None:
            assert err <= last_err + 1e-6, (frac, err, last_err)
        last_err = err
    assert flushed_any
    assert last_err == 0.0  # full input flush == final image


def test_truncation_every_stride_never_crashes():
    img = _image(128, 128, seed=11)
    stream = codestream.encode_lossy(img, distance=1.0, effort=3)
    for cut in range(1, len(stream), 173):
        dec = decoder.Decoder()
        dec.set_input(stream[:cut])
        ev = None
        for _ in range(8):
            ev = dec.process()
            if ev in (decoder.NEED_MORE_INPUT, decoder.FULL_IMAGE,
                      decoder.SUCCESS):
                break
        dec.flush_image()  # must never raise
        if cut < len(stream) // 2:
            assert ev == decoder.NEED_MORE_INPUT
        # closing a truncated stream must raise a clean JXLError
        if cut < len(stream) - 1:
            dec.close_input()
            with pytest.raises(JXLError):
                while dec.process() not in (decoder.FULL_IMAGE,
                                            decoder.SUCCESS):
                    pass


def test_rewind_redelivers_events():
    img = _image(96, 96, seed=13)
    stream = codestream.encode_lossless(img)
    dec = decoder.Decoder()
    dec.set_input(stream)
    dec.close_input()
    assert dec.process() == decoder.BASIC_INFO
    dec.rewind()
    assert dec.process() == decoder.BASIC_INFO


def test_whole_stream_fallback_lossless():
    img = _image(80, 90, seed=17)
    stream = codestream.encode_lossless(img)
    dec = decoder.Decoder()
    dec.set_input(stream)
    dec.close_input()
    while True:
        ev = dec.process()
        if ev in (decoder.FULL_IMAGE, decoder.SUCCESS):
            break
    assert np.array_equal(dec.image[:, :, :3], img)


def test_animation_frames_decode_incrementally():
    """Each animation frame's FULL_IMAGE fires as soon as that frame's
    TOC-declared bytes arrive — before the rest of the stream exists
    (decode.h: JXL_DEC_FULL_IMAGE once per frame)."""
    frames = [_image(seed=s) for s in (1, 2, 3)]
    data = codestream.encode_animation(frames, lossless=True,
                                       durations=[2, 3, 4])
    want = [f for f, _d in codestream.decode_frames(data)]

    dec = decoder.Decoder(events=(decoder.FULL_IMAGE,))
    got, durs, cut_positions = [], [], []
    fed = 0
    step = max(1, len(data) // 97)
    while True:
        ev = dec.process()
        if ev == decoder.NEED_MORE_INPUT:
            assert fed < len(data), "decoder starved at EOF"
            dec.set_input(data[fed:fed + step])
            fed += step
            if fed >= len(data):
                dec.close_input()
            continue
        if ev == decoder.FULL_IMAGE:
            got.append(dec.image.copy())
            durs.append(dec.frame_duration)
            cut_positions.append(fed)
            continue
        if ev == decoder.SUCCESS:
            break
    assert len(got) == len(frames)
    for g, w in zip(got, want):
        assert np.array_equal(g[:, :, :3], w[:, :, :3])
    assert durs == [2, 3, 4]
    # the first frame must have been emitted before the whole stream fed
    assert cut_positions[0] < len(data)


def test_animation_skip_frames_incremental():
    frames = [_image(seed=s) for s in (5, 6, 7)]
    data = codestream.encode_animation(frames, lossless=True)
    want = [f for f, _d in codestream.decode_frames(data)]
    dec = decoder.Decoder(events=(decoder.FULL_IMAGE,))
    dec.set_input(data)
    dec.close_input()
    dec.skip_frames(2)
    evs = []
    while True:
        ev = dec.process()
        evs.append(ev)
        if ev in (decoder.SUCCESS,):
            break
    assert evs.count(decoder.FULL_IMAGE) == 1
    assert np.array_equal(dec.image[:, :, :3], want[2][:, :, :3])


def test_decode_dc_fast_preview():
    """decode_dc: 1:8 preview from the DC sections only (AC never
    entropy-decoded) — matches a box-downsample of the full decode."""
    import numpy as np

    from libjxl_tpu.api import codestream
    from libjxl_tpu.render.upsample import downsample_box

    rng = np.random.default_rng(9)
    base = 128 + 40 * np.sin(np.arange(600)[:, None] * 0.01) \
        + rng.normal(0, 5, (600, 512))
    img = np.clip(np.stack([base, base * 0.9 + 8, base * 1.1 - 9], -1),
                  0, 255).astype(np.uint8)
    s = codestream.encode_lossy(img, distance=1.0, effort=3,
                                device=False)
    dc, _ = codestream.decode_dc(s)
    assert dc.shape == (75, 64, 3) and dc.dtype == np.uint8
    full, _ = codestream.decode(s, device=False)
    ref = np.stack([downsample_box(full[:, :, c].astype(float), 8)
                    for c in range(3)], -1)
    assert np.abs(dc.astype(float) - ref).mean() < 2.0


def test_djxl_allow_partial_files(tmp_path):
    """djxl --allow_partial_files renders the best partial image from a
    truncated file via the event decoder's flush."""
    import numpy as np

    from libjxl_tpu.api import codestream
    from libjxl_tpu.extras.io import load_image
    from libjxl_tpu.tools import djxl

    rng = np.random.default_rng(5)
    base = 128 + 40 * np.sin(np.arange(600)[:, None] * 0.02) \
        + rng.normal(0, 5, (600, 520))
    img = np.clip(np.stack([base] * 3, -1), 0, 255).astype(np.uint8)
    s = codestream.encode_lossy(img, distance=1.0, effort=3,
                                device=False)
    trunc = tmp_path / "t.jxl"
    trunc.write_bytes(s[:int(len(s) * 0.7)])
    out = tmp_path / "p.png"
    assert djxl.main([str(trunc), str(out)]) == 1  # loud without flag
    assert djxl.main([str(trunc), str(out),
                      "--allow_partial_files"]) == 0
    partial = load_image(str(out))
    assert partial.shape[:2] == (600, 520)
    # decoded-so-far regions track the original
    err = np.abs(partial[:200, :, :3].astype(int)
                 - img[:200].astype(int)).mean()
    assert err < 12, err
