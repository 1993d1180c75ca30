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


def encode_grey16_png(data: np.ndarray, top_down: bool = True) -> bytes:
    """uint16 (rows, cols) raster -> 16-bit greyscale PNG (big-endian
    samples per the spec; filter 0 rows). The precision tier DEM
    exports need — 8 bits quantize a 1000 m height range to 4 m
    steps, 16 bits to 1.5 cm."""
    if data.dtype != np.uint16 or data.ndim != 2:
        raise ValueError("expected uint16 (rows, cols)")
    h, w = data.shape
    rows = data[::-1] if top_down else data
    be = rows.astype(">u2")
    raw = b"".join(b"\x00" + be[i].tobytes() for i in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


_COLOR_CHANNELS = {0: 1, 2: 3, 3: 1, 6: 4}  # grey, RGB, palette, RGBA (8-bit)


def _unfilter_sub(cur: np.ndarray, bpp: int) -> np.ndarray:
    # Sub is a per-channel prefix sum mod 256 — vectorized
    row = cur.copy()
    for k in range(bpp):
        row[k::bpp] = np.cumsum(cur[k::bpp], dtype=np.int64) & 0xFF
    return row


def decode_png(data: bytes) -> np.ndarray:
    """From-scratch PNG decoder (stdlib zlib + numpy): 8-bit
    greyscale/RGB/palette/RGBA, all five scanline filters, multi-IDAT,
    CRC-verified, Adam7 interlace. Returns (h, w, channels) uint8,
    top-down as stored (palette images come back expanded to RGB).
    Filters 0/1/2 are vectorized; Average/Paeth fall back to a
    per-byte loop (they only appear in streams from heuristic
    encoders). Sub-8-bit depths and 16-bit raise."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    off = 8
    w = h = c = None
    color = None
    plte = None
    trns = None
    idat = []
    while off + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, off)
        if off + 12 + length > len(data):
            raise ValueError("truncated PNG chunk")
        tag = data[off + 4 : off + 8]
        payload = data[off + 8 : off + 8 + length]
        (crc,) = struct.unpack_from(">I", data, off + 8 + length)
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack_from(
                ">IIBBBBB", payload, 0
            )
            ok = (depth == 8 and color in _COLOR_CHANNELS) or (
                depth in (1, 2, 4) and color in (0, 3)
            ) or (depth == 16 and color in (0, 2, 6))
            if not ok:
                raise NotImplementedError(
                    f"PNG depth {depth} / color type {color} not supported "
                    "(8-bit grey/RGB/palette/RGBA; 1/2/4-bit grey/palette)"
                )
            if comp != 0 or filt != 0 or interlace not in (0, 1):
                raise NotImplementedError("nonzero-method PNG")
            c = _COLOR_CHANNELS[color]
            adam7 = interlace == 1
        elif tag == b"PLTE":
            if len(payload) % 3 or len(payload) > 768:
                raise ValueError("bad PLTE length")
            plte = np.frombuffer(payload, np.uint8).reshape(-1, 3).copy()
        elif tag == b"tRNS" and color == 3:
            trns = np.frombuffer(payload, np.uint8).copy()
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        off += 12 + length
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:  # CRC-valid but corrupt deflate stream
        raise ValueError(f"PNG IDAT inflate failed: {exc}") from exc

    def row_bytes(px: int) -> int:
        return (px * depth * c + 7) // 8

    def pass_image(buf: bytes, ph: int, pw: int) -> np.ndarray:
        # unfilter at the byte level (bpp = ceil(depth*c/8)), then
        # expand sub-8-bit samples / combine 16-bit sample pairs
        rows = _unfilter_image(buf, ph, row_bytes(pw), max(1, depth * c // 8))
        if depth == 8:
            return rows.reshape(ph, pw, c)
        if depth == 16:
            # byte pairs are big-endian per sample, channels interleaved
            u16 = (rows[:, 0::2].astype(np.uint16) << 8) | rows[:, 1::2]
            return u16.reshape(ph, pw, c)
        return _expand_depth(rows, pw, depth, color).reshape(ph, pw, 1)

    if adam7:
        # Adam7: seven independently-filtered sub-images, scattered
        # onto the canvas by the standard (x0, y0, dx, dy) grids
        out7 = np.empty((h, w, c), dtype=np.uint16 if depth == 16 else np.uint8)
        off7 = 0
        for x0, y0, dx, dy in (
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ):
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            n = ph * (row_bytes(pw) + 1)
            out7[y0::dy, x0::dx] = pass_image(raw[off7 : off7 + n], ph, pw)
            off7 += n
        if off7 != len(raw):
            raise ValueError("PNG interlaced payload size mismatch")
        return _apply_palette(out7, color, plte, trns)
    return _apply_palette(pass_image(raw, h, w), color, plte, trns)


def _apply_palette(img: np.ndarray, color: int, plte, trns=None) -> np.ndarray:
    if color != 3:
        return img
    if plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    idx = img[..., 0]
    if idx.max(initial=0) >= len(plte):
        raise ValueError("palette index outside PLTE")
    rgb = plte[idx]  # (h, w, 3)
    if trns is None:
        return rgb
    # tRNS: per-palette-entry alpha (entries past the chunk are opaque)
    alpha_tab = np.full(len(plte), 255, np.uint8)
    alpha_tab[: min(len(trns), len(plte))] = trns[: len(plte)]
    return np.concatenate([rgb, alpha_tab[idx][..., None]], axis=2)


def _expand_depth(rows: np.ndarray, w: int, depth: int, color: int) -> np.ndarray:
    """(h, row_bytes) packed sub-8-bit scanlines -> (h, w) one byte
    per sample (MSB-first packing per the PNG spec). Grey samples are
    rescaled to full 8-bit range; palette samples stay raw indices."""
    bits = np.unpackbits(rows, axis=1)[:, : w * depth]
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    vals = (bits.reshape(rows.shape[0], w, depth) * weights).sum(axis=2)
    if color == 0:
        vals = vals * 255 // ((1 << depth) - 1)
    return vals.astype(np.uint8)


def _unfilter_image(raw: bytes, h: int, n_bytes: int, bpp: int) -> np.ndarray:
    stride = n_bytes + 1
    if len(raw) != h * stride:
        raise ValueError("PNG payload size mismatch")
    out = np.empty((h, n_bytes), dtype=np.uint8)
    prev = np.zeros(n_bytes, dtype=np.int32)
    for i in range(h):
        line = raw[i * stride : (i + 1) * stride]
        ftype = line[0]
        cur = np.frombuffer(line, dtype=np.uint8, offset=1).astype(np.int32)
        if ftype == 0:
            row = cur
        elif ftype == 1:
            row = _unfilter_sub(cur, bpp)
        elif ftype == 2:
            row = (cur + prev) & 0xFF
        elif ftype == 3:
            row = cur.copy()
            for j in range(len(row)):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (cur[j] + ((left + prev[j]) >> 1)) & 0xFF
        elif ftype == 4:
            row = cur.copy()
            for j in range(len(row)):
                a = int(row[j - bpp]) if j >= bpp else 0
                b = int(prev[j])
                cd = int(prev[j - bpp]) if j >= bpp else 0
                p = a + b - cd
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - cd)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else cd)
                row[j] = (cur[j] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter {ftype} invalid")
        out[i] = row.astype(np.uint8)
        prev = row.astype(np.int32)
    return out  # (h, w*c); callers reshape


def decode_grey_png(data: bytes) -> np.ndarray:
    """Inverse of :func:`encode_grey_png` (for round-trip tests):
    returns the raster bottom-up (undoing the top-down write)."""
    img = decode_png(data)
    if img.shape[2] != 1:
        raise NotImplementedError("raster round-trip expects greyscale")
    return img[::-1, :, 0]
