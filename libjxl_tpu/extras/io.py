"""External image formats: PNG (via PIL), PNM/PGM/PPM/PFM, NPY, PGX.

Mirrors lib/extras/dec/*.cc + enc/*.cc surface (PackedPixelFile analog is
a plain numpy array + metadata dict).
"""

from __future__ import annotations

import pathlib
import struct

import numpy as np

from ..base.status import JXLError


def load_image(path, return_icc: bool = False):
    """Returns (H, W, C) uint8/uint16 array; with return_icc=True returns
    (array, icc_bytes_or_None) — the embedded ICC profile if present."""
    path = pathlib.Path(path)
    suffix = path.suffix.lower()
    if suffix in (".pnm", ".ppm", ".pgm"):
        arr = _load_pnm(path.read_bytes())
        return (arr, None) if return_icc else arr
    if suffix == ".npy":
        arr = np.load(path)
        return (arr, None) if return_icc else arr
    if suffix == ".jxl":
        from ..api.codestream import decode
        from ..io.container import extract_codestream, is_container

        data = path.read_bytes()
        if is_container(data):
            data = extract_codestream(data)
        arr, _meta = decode(data)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return (arr, None) if return_icc else arr
    try:
        from PIL import Image

        img = Image.open(path)
        arr = np.asarray(img)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        if return_icc:
            return arr, img.info.get("icc_profile")
        return arr
    except ImportError as e:  # pragma: no cover
        raise JXLError(f"cannot load {path}: PIL unavailable") from e


def save_image(path, image: np.ndarray, icc: bytes = None) -> None:
    path = pathlib.Path(path)
    suffix = path.suffix.lower()
    if suffix in (".pnm", ".ppm", ".pgm"):
        path.write_bytes(_save_pnm(image))
        return
    if suffix == ".npy":
        np.save(path, image)
        return
    from PIL import Image

    if image.ndim == 3 and image.shape[2] == 1:
        image = image[:, :, 0]
    kw = {"icc_profile": icc} if icc else {}
    Image.fromarray(image).save(path, **kw)


def _load_pnm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P"):
        raise JXLError("not a PNM file")
    fields = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            while data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1
    w, h, maxval = fields
    kind = data[1:2]
    channels = 3 if kind == b"6" else 1
    dtype = np.uint16 if maxval > 255 else np.uint8
    count = w * h * channels
    arr = np.frombuffer(data, dtype=">u2" if maxval > 255 else np.uint8,
                        count=count, offset=pos)
    return arr.astype(dtype).reshape(h, w, channels)


def _save_pnm(image: np.ndarray) -> bytes:
    if image.ndim == 2:
        image = image[:, :, None]
    h, w, c = image.shape
    maxval = 65535 if image.dtype == np.uint16 else 255
    magic = b"P6" if c == 3 else b"P5"
    header = b"%s\n%d %d\n%d\n" % (magic, w, h, maxval)
    data = image.astype(">u2" if maxval > 255 else np.uint8).tobytes()
    return header + data
