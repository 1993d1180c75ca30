"""Minimal greyscale PNG encoder — WriteAsPng
(``Common/ByteRaster.cs:125-152``, the OPEN_CV-gated path) without
any image library: PNG is zlib + CRC-framed chunks, both in the
stdlib.

The reference writes the raster as an 8-bit greyscale image with rows
top-down (OpenCV's Mat layout); we mirror that row order (same as the
``WriteDemAsAscii`` top-down convention)."""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_grey_png(data: np.ndarray, top_down: bool = True) -> bytes:
    """uint8 (rows, cols) raster -> 8-bit greyscale PNG bytes.

    ``top_down=True`` writes row 0 of the image = the raster's LAST
    row (the raster is stored bottom-up, the image top-down — the
    reference's reversed row loop, ByteRaster.cs:137-146)."""
    if data.dtype != np.uint8 or data.ndim != 2:
        raise ValueError("expected uint8 (rows, cols)")
    h, w = data.shape
    rows = data[::-1] if top_down else data
    raw = b"".join(b"\x00" + rows[i].tobytes() for i in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # grey, no interlace
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_grey_png(data: bytes) -> np.ndarray:
    """Inverse (for round-trip tests): returns the raster bottom-up
    (undoing the top-down write)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    off = 8
    w = h = None
    idat = b""
    while off < len(data):
        (length,) = struct.unpack_from(">I", data, off)
        tag = data[off + 4 : off + 8]
        payload = data[off + 8 : off + 8 + length]
        if tag == b"IHDR":
            w, h, depth, color = struct.unpack_from(">IIBB", payload, 0)
            if depth != 8 or color != 0:
                raise NotImplementedError("only 8-bit greyscale supported")
        elif tag == b"IDAT":
            idat += payload
        off += 12 + length
    raw = zlib.decompress(idat)
    out = np.empty((h, w), dtype=np.uint8)
    stride = w + 1
    prev = np.zeros(w, dtype=np.uint8)
    for i in range(h):
        line = raw[i * stride : (i + 1) * stride]
        ftype = line[0]
        row = np.frombuffer(line, dtype=np.uint8, offset=1).copy()
        if ftype == 0:
            pass
        elif ftype == 2:  # Up filter (common from other encoders)
            row = (row.astype(np.int32) + prev).astype(np.uint8)
        else:
            raise NotImplementedError(f"PNG filter {ftype}")
        out[i] = row
        prev = out[i]
    return out[::-1]
