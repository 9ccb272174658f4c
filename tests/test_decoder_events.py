"""Round-3 decoder completeness: BOX events, FRAME_PROGRESSION,
PREVIEW_IMAGE, and per-group incremental modular frames
(decode.h:122-337)."""

import numpy as np

from libjxl_tpu.api import codestream, decoder
from libjxl_tpu.io.container import wrap_codestream


def _image(h=300, w=280, seed=9):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(xx * 255 // w), (yy * 255 // h),
                    ((xx + yy) * 255 // (h + w))], axis=-1).astype(np.int32)
    img += rng.integers(-9, 10, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def _drain(dec, stop_events, limit=64):
    events = []
    for _ in range(limit):
        ev = dec.process()
        events.append(ev)
        if ev in stop_events:
            break
    return events


def test_box_events_for_container():
    img = _image(64, 64)
    stream = codestream.encode_lossless(img)
    container = wrap_codestream(stream)
    dec = decoder.Decoder(events=(decoder.BOX, decoder.BASIC_INFO,
                                  decoder.FULL_IMAGE))
    dec.set_input(container)
    dec.close_input()
    seen = []
    for _ in range(32):
        ev = dec.process()
        if ev == decoder.BOX:
            seen.append(dec.box_type)
        if ev in (decoder.FULL_IMAGE, decoder.SUCCESS):
            break
    assert b"jxlc" in seen or b"jxlp" in seen, seen
    assert np.array_equal(dec.image, img)


def test_frame_progression_event():
    img = _image()  # 300x280: multiple groups
    stream = codestream.encode_lossy(img, distance=1.0, effort=3)
    dec = decoder.Decoder(events=(decoder.FRAME,
                                  decoder.FRAME_PROGRESSION,
                                  decoder.FULL_IMAGE))
    dec.set_input(stream)
    dec.close_input()
    events = _drain(dec, (decoder.FULL_IMAGE, decoder.SUCCESS))
    assert decoder.FRAME_PROGRESSION in events
    # progression (DC ready) arrives before the full image
    assert events.index(decoder.FRAME_PROGRESSION) \
        < events.index(decoder.FULL_IMAGE)


def test_preview_image_event():
    img = _image(256, 256, seed=4)
    stream = codestream.encode_lossy(img, distance=1.0, effort=3,
                                     preview=64)
    dec = decoder.Decoder(events=(decoder.PREVIEW_IMAGE,
                                  decoder.FULL_IMAGE))
    dec.set_input(stream)
    dec.close_input()
    events = _drain(dec, (decoder.FULL_IMAGE, decoder.SUCCESS))
    assert decoder.PREVIEW_IMAGE in events
    pv = dec.preview_image
    assert pv is not None and max(pv.shape[:2]) <= 64
    assert events.index(decoder.PREVIEW_IMAGE) \
        < events.index(decoder.FULL_IMAGE)


def test_modular_incremental_groups():
    img = _image(300, 280, seed=2)
    stream = codestream.encode_lossless(img)
    oneshot, _ = codestream.decode(stream)
    dec = decoder.Decoder()
    # feed in small chunks; the decoder must consume per-group sections
    # as they arrive and never require the whole stream at once
    pos, chunk = 0, 499
    saw_need_more = False
    for _ in range(10000):
        ev = dec.process()
        if ev == decoder.NEED_MORE_INPUT:
            saw_need_more = True
            if pos >= len(stream):
                dec.close_input()
                continue
            dec.set_input(stream[pos:pos + chunk])
            pos += chunk
        elif ev in (decoder.FULL_IMAGE, decoder.SUCCESS):
            break
    assert saw_need_more
    assert np.array_equal(dec.image, oneshot)
    # the incremental path really engaged (modular multi-group streams
    # populate _FrameState.decoded section by section)
    assert dec._frame is not None and len(dec._frame.decoded) > 2


def test_jpeg_reconstruction_event():
    """JXL_DEC_JPEG_RECONSTRUCTION analog: the jbrd box announces exact
    reconstruction; Decoder.reconstruct_jpeg returns the original."""
    import io as _io

    import pytest

    PIL = pytest.importorskip("PIL.Image")
    import numpy as np
    from PIL import Image

    from libjxl_tpu.api import decoder as dec
    from libjxl_tpu.jpeg.recompress import recompress_jpeg_vardct

    rng = np.random.default_rng(4)
    img = np.clip(rng.normal(120, 30, (64, 80, 3)), 0,
                  255).astype(np.uint8)
    buf = _io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=85)
    jpeg = buf.getvalue()
    container = recompress_jpeg_vardct(jpeg)
    d = dec.Decoder(events=(dec.JPEG_RECONSTRUCTION, dec.FULL_IMAGE))
    d.set_input(container)
    d.close_input()
    ev = d.process()
    assert ev == dec.JPEG_RECONSTRUCTION
    assert d.reconstruct_jpeg() == jpeg
