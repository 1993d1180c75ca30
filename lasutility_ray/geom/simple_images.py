"""From-scratch readers for the simple uncompressed raster formats
(BMP, PNM, Sun raster, XBM).

These exist for two reasons: (1) they are real formats a web-scale
image pipeline meets, and (2) because they are uncompressed (or
trivially run-length coded) they serve as FOREIGN GROUND TRUTH for
the repo's compressed-codec conformance tests — a BMP or PPM written
by an external encoder pins the exact pixels the PNG/GIF/JPEG/WebP
decoders must reproduce (``tests/test_foreign_conformance.py``).

Public-spec sources: Windows BITMAPINFOHEADER/V4/V5 layout (MSDN),
netpbm format docs (P1..P6), Sun rasterfile.h layout, X11 XBM text
format. No code copied from anywhere; reference parity target is the
reference repo's raster I/O surface (LasUtility/DEM read/write).
"""

from __future__ import annotations

import re
import struct

import numpy as np


class ImageDataError(ValueError):
    """Typed error for malformed image payloads (matches the repo's
    codec convention: malformed input raises a data error, never an
    arbitrary exception)."""


MAX_PIXELS = 1 << 26  # reject garbage headers before allocating


def _check_dims(w: int, h: int) -> None:
    if w <= 0 or h <= 0 or w * h > MAX_PIXELS:
        raise ImageDataError(f"implausible image dimensions {w}x{h}")


# ---------------------------------------------------------------- BMP


def _mask_shift(mask: int) -> tuple[int, int]:
    """(shift, width) of a contiguous channel bitmask."""
    if mask == 0:
        return 0, 0
    shift = (mask & -mask).bit_length() - 1
    width = (mask >> shift).bit_length()
    return shift, width


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a Windows BMP (BITMAPINFOHEADER / V4 / V5): 1/4/8-bit
    palette, 16/24/32-bit truecolor, BI_RGB and BI_BITFIELDS.
    Returns (h, w, 3) or (h, w, 4) uint8 (alpha kept when a 32-bit
    alpha mask / channel is present)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ImageDataError("not a BMP stream")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise ImageDataError(f"unsupported BMP header size {hdr_size}")
    if len(data) < 14 + hdr_size:
        raise ImageDataError("truncated BMP header")
    w, h, _planes, bpp, comp = struct.unpack_from("<iiHHI", data, 18)
    top_down = h < 0
    h = abs(h)
    _check_dims(w, h)
    if comp not in (0, 3):  # BI_RGB, BI_BITFIELDS
        raise ImageDataError(f"unsupported BMP compression {comp}")
    (n_colors,) = struct.unpack_from("<I", data, 46)

    if bpp in (1, 4, 8):
        pal_off = 14 + hdr_size
        if comp == 3:
            raise ImageDataError("BI_BITFIELDS is invalid for palette BMP")
        n_pal = n_colors or (1 << bpp)
        pal = np.frombuffer(data, np.uint8, n_pal * 4, pal_off).reshape(-1, 4)
        pal_rgb = pal[:, [2, 1, 0]].copy()  # stored BGRX
        row_bytes = (w * bpp + 31) // 32 * 4
        need = row_bytes * h
        if pix_off + need > len(data):
            raise ImageDataError("truncated BMP pixel data")
        raw = np.frombuffer(data, np.uint8, need, pix_off).reshape(h, row_bytes)
        if bpp == 8:
            idx = raw[:, :w]
        else:
            bits = np.unpackbits(raw, axis=1)
            if bpp == 1:
                idx = bits[:, :w]
            else:  # 4-bit: regroup nibbles
                idx = (bits.reshape(h, -1, 4) * [8, 4, 2, 1]).sum(2)[:, :w]
        idx = idx.astype(np.intp)
        if idx.max(initial=0) >= len(pal_rgb):
            raise ImageDataError("BMP palette index out of range")
        img = pal_rgb[idx]
    elif bpp in (16, 24, 32):
        if comp == 3:
            if len(data) < 70:
                raise ImageDataError("truncated BMP bitfield masks")
            masks = struct.unpack_from("<III", data, 54)
            amask = struct.unpack_from("<I", data, 66)[0] if hdr_size >= 56 else 0
        elif bpp == 16:
            masks, amask = (0x7C00, 0x03E0, 0x001F), 0
        else:
            masks, amask = (0xFF0000, 0x00FF00, 0x0000FF), 0xFF000000 * (bpp == 32)
        step = bpp // 8
        row_bytes = (w * bpp + 31) // 32 * 4
        need = row_bytes * h
        if pix_off + need > len(data):
            raise ImageDataError("truncated BMP pixel data")
        raw = np.frombuffer(data, np.uint8, need, pix_off).reshape(h, row_bytes)
        px = raw[:, : w * step].reshape(h, w, step).astype(np.uint32)
        val = np.zeros((h, w), np.uint32)
        for i in range(step):
            val |= px[:, :, i] << (8 * i)
        chans = []
        for mask in (*masks, amask):
            if mask == 0:
                chans.append(None)
                continue
            shift, width = _mask_shift(mask)
            c = (val >> shift) & ((1 << width) - 1)
            if width != 8:  # rescale to 8-bit
                c = (c * 255) // ((1 << width) - 1)
            chans.append(c.astype(np.uint8))
        rgb = [c if c is not None else np.zeros((h, w), np.uint8) for c in chans[:3]]
        img = np.stack(rgb + ([chans[3]] if chans[3] is not None else []), axis=-1)
    else:
        raise ImageDataError(f"unsupported BMP bit depth {bpp}")
    return img if top_down else img[::-1].copy()


# ---------------------------------------------------------------- PNM


_PNM_TOKEN = re.compile(rb"(?:\s|#[^\n]*\n)*(\S+)")


def _pnm_tokens(data: bytes, n: int, pos: int) -> tuple[list[int], int]:
    out = []
    for _ in range(n):
        m = _PNM_TOKEN.match(data, pos)
        if not m:
            raise ImageDataError("truncated PNM header")
        out.append(int(m.group(1)))
        pos = m.end()
    return out, pos


def decode_pnm(data: bytes) -> np.ndarray:
    """Decode netpbm P1..P6 (ASCII + binary PBM/PGM/PPM). Returns
    (h, w) uint8 for bitmap/greymap (bitmap: 1 -> 0 black per PBM
    convention, rescaled so 1 maps to 0 and 0 maps to 255) and
    (h, w, 3) uint8 for pixmaps. 16-bit maxval is rescaled to 8."""
    if len(data) < 2 or data[0:1] != b"P" or data[1:2] not in b"123456":
        raise ImageDataError("not a PNM stream")
    kind = int(data[1:2])
    (w, h), pos = _pnm_tokens(data, 2, 2)
    _check_dims(w, h)
    if kind in (1, 4):
        maxval = 1
    else:
        (maxval,), pos = _pnm_tokens(data, 1, pos)
        if not 0 < maxval < 65536:
            raise ImageDataError(f"bad PNM maxval {maxval}")
    n_ch = 3 if kind in (3, 6) else 1
    n_vals = w * h * n_ch

    if kind <= 3:  # ASCII
        vals = np.array(data[pos:].split()[:n_vals], dtype=np.uint32)
        if len(vals) < n_vals:
            raise ImageDataError("truncated PNM data")
    elif kind == 4:  # binary bitmap, rows padded to bytes
        pos += 1  # single whitespace after header
        row_bytes = (w + 7) // 8
        raw = np.frombuffer(data, np.uint8, row_bytes * h, pos)
        vals = np.unpackbits(raw.reshape(h, row_bytes), axis=1)[:, :w].ravel()
    else:  # P5/P6 binary
        pos += 1
        width = 2 if maxval > 255 else 1
        if pos + n_vals * width > len(data):
            raise ImageDataError("truncated PNM data")
        if maxval > 255:
            raw = np.frombuffer(data, ">u2", n_vals, pos)
        else:
            raw = np.frombuffer(data, np.uint8, n_vals, pos)
        vals = raw.astype(np.uint32)

    if kind in (1, 4):
        img = np.where(vals.astype(bool), 0, 255).astype(np.uint8)
    elif maxval == 255:
        img = vals.astype(np.uint8)
    else:
        img = ((vals * 255) // maxval).astype(np.uint8)
    img = img.reshape(h, w, n_ch)
    return img[:, :, 0] if n_ch == 1 else img


# ----------------------------------------------------------- Sun ras


def decode_ras(data: bytes) -> np.ndarray:
    """Decode a Sun rasterfile (magic 0x59a66a95): RT_STANDARD /
    RT_BYTE_ENCODED (RLE), 1/8/24/32-bit, optional RGB colormap.
    Returns (h, w[, 3|4]) uint8. Rows pad to 16 bits."""
    if len(data) < 32:
        raise ImageDataError("truncated Sun raster header")
    magic, w, h, depth, _length, rtype, maptype, maplen = struct.unpack_from(
        ">8I", data, 0
    )
    if magic != 0x59A66A95:
        raise ImageDataError("not a Sun raster stream")
    _check_dims(w, h)
    if rtype not in (0, 1, 2, 3) or depth not in (1, 8, 24, 32):
        raise ImageDataError(f"unsupported Sun raster type {rtype}/depth {depth}")
    pos = 32
    cmap = None
    if maplen:
        if maptype != 1 or maplen % 3:
            raise ImageDataError("unsupported Sun raster colormap")
        cm = np.frombuffer(data, np.uint8, maplen, pos)
        cmap = cm.reshape(3, maplen // 3).T.copy()  # planes: all R, all G, all B
        pos += maplen
    row_bytes = (w * depth + 15) // 16 * 2
    need = row_bytes * h
    if rtype == 2:  # RLE: 0x80 n byte -> byte repeated n+1; 0x80 0 -> literal 0x80
        raw = np.frombuffer(data, np.uint8, len(data) - pos, pos)
        out = np.empty(need, np.uint8)
        oi = i = 0
        while oi < need and i < len(raw):
            b = raw[i]
            if b == 0x80:
                if i + 1 >= len(raw):
                    raise ImageDataError("truncated Sun raster RLE")
                n = raw[i + 1]
                if n == 0:
                    out[oi] = 0x80
                    oi += 1
                    i += 2
                else:
                    if i + 2 >= len(raw):
                        raise ImageDataError("truncated Sun raster RLE")
                    out[oi : oi + n + 1] = raw[i + 2]
                    oi += n + 1
                    i += 3
            else:
                out[oi] = b
                oi += 1
                i += 1
        if oi < need:
            raise ImageDataError("truncated Sun raster RLE")
        flat = out
    else:
        if pos + need > len(data):
            raise ImageDataError("truncated Sun raster data")
        flat = np.frombuffer(data, np.uint8, need, pos)
    rows = flat.reshape(h, row_bytes)
    if depth == 1:
        bits = np.unpackbits(rows, axis=1)[:, :w]
        img = np.where(bits.astype(bool), 0, 255).astype(np.uint8)
    elif depth == 8:
        img = rows[:, :w]
    else:
        step = depth // 8
        px = rows[:, : w * step].reshape(h, w, step)
        if rtype == 3:  # RT_FORMAT_RGB: already RGB / xRGB order
            img = px.copy() if step == 3 else px[:, :, 1:4].copy()
        elif step == 3:  # standard order is BGR / xBGR
            img = px[:, :, ::-1].copy()
        else:
            img = px[:, :, [3, 2, 1]].copy()
    if cmap is not None and img.ndim == 2:
        idx = img.astype(np.intp)
        if idx.max(initial=0) >= len(cmap):
            raise ImageDataError("Sun raster colormap index out of range")
        img = cmap[idx]
    return img


# --------------------------------------------------------------- XBM


_XBM_DEF = re.compile(rb"#define\s+\w*?_?(width|height)\s+(\d+)")
_XBM_BYTE = re.compile(rb"0[xX][0-9a-fA-F]{1,2}")


def decode_xbm(data: bytes) -> np.ndarray:
    """Decode an X11 XBM (C-source bitmap): set bit = foreground
    (black, 0), clear = 255, LSB-first within each byte, rows padded
    to whole bytes. Returns (h, w) uint8."""
    dims = dict(_XBM_DEF.findall(data))
    if b"width" not in dims or b"height" not in dims:
        raise ImageDataError("not an XBM stream")
    w, h = int(dims[b"width"]), int(dims[b"height"])
    _check_dims(w, h)
    row_bytes = (w + 7) // 8
    body = data[data.find(b"{") :]
    vals = [int(m, 16) for m in _XBM_BYTE.findall(body)[: row_bytes * h]]
    if len(vals) < row_bytes * h:
        raise ImageDataError("truncated XBM data")
    raw = np.array(vals, np.uint8).reshape(h, row_bytes)
    bits = np.unpackbits(raw, axis=1, bitorder="little")[:, :w]
    return np.where(bits.astype(bool), 0, 255).astype(np.uint8)
