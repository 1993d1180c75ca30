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


# -------------------------------------------------------------- TIFF


def _tiff_lzw_decode(data: bytes, max_out: int) -> bytes:
    """TIFF-variant LZW: MSB-first codes, 9->12 bits with EarlyChange
    (width grows one code early), Clear=256, EOI=257."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:  # Clear
                table = table[:258]
                width = 9
                prev = None
                continue
            if code == 257:  # EOI
                return bytes(out)
            if prev is None:
                if code > 255:
                    raise ImageDataError("bad first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ImageDataError("LZW code out of range")
            out += entry
            if len(out) > max_out:
                raise ImageDataError("LZW output overruns strip")
            prev = entry
            if len(table) == (1 << width) - 1 and width < 12:  # EarlyChange
                width += 1
    return bytes(out)


def _packbits_decode(data: bytes, max_out: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < max_out:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if i >= len(data):
                raise ImageDataError("truncated PackBits run")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out)


def _tiff_read_values(data, fmt, typ, cnt, raw_off):
    """IFD entry values (SHORT/LONG arrays, inline or pointed-to)."""
    size = {1: 1, 3: 2, 4: 4}.get(typ)
    if size is None:
        raise ImageDataError(f"unsupported TIFF value type {typ}")
    total = size * cnt
    if total <= 4:
        body = data[raw_off : raw_off + total]
    else:
        (ptr,) = struct.unpack_from(fmt + "I", data, raw_off)
        body = data[ptr : ptr + total]
    if len(body) < total:
        raise ImageDataError("truncated TIFF value")
    code = {1: "B", 3: "H", 4: "I"}[typ]
    return list(struct.unpack(fmt + code * cnt, body))


def decode_tiff(data: bytes) -> np.ndarray:
    """Decode a baseline TIFF (first IFD): uncompressed, PackBits or
    LZW (with horizontal predictor), grey / RGB / RGBA / palette,
    8-bit chunky samples, strip-based, both byte orders. Returns
    (h, w[, c]) uint8."""
    if len(data) < 8 or data[:2] not in (b"II", b"MM"):
        raise ImageDataError("not a TIFF stream")
    fmt = "<" if data[:2] == b"II" else ">"
    (magic,) = struct.unpack_from(fmt + "H", data, 2)
    if magic != 42:
        raise ImageDataError("bad TIFF magic")
    (ifd,) = struct.unpack_from(fmt + "I", data, 4)
    if ifd + 2 > len(data):
        raise ImageDataError("truncated TIFF IFD")
    (n,) = struct.unpack_from(fmt + "H", data, ifd)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        base = ifd + 2 + i * 12
        if base + 12 > len(data):
            raise ImageDataError("truncated TIFF IFD entry")
        tag, typ, cnt = struct.unpack_from(fmt + "HHI", data, base)
        if typ in (1, 3, 4):
            tags[tag] = _tiff_read_values(data, fmt, typ, cnt, base + 8)
    try:
        w, h = tags[256][0], tags[257][0]
    except KeyError:
        raise ImageDataError("TIFF missing dimensions") from None
    _check_dims(w, h)
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [8])
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    predictor = tags.get(317, [1])[0]
    planar = tags.get(284, [1])[0]
    if planar != 1:
        raise ImageDataError("planar TIFF not supported")
    if any(b != 8 for b in bits) or spp not in (1, 3, 4):
        raise ImageDataError(f"unsupported TIFF layout bits={bits} spp={spp}")
    if comp not in (1, 5, 32773):
        raise ImageDataError(f"unsupported TIFF compression {comp}")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ImageDataError("TIFF missing strip tables")
    rows_per_strip = tags.get(278, [h])[0] or h
    row_bytes = w * spp
    rows = []
    for si, (off, cnt_b) in enumerate(zip(offsets, counts)):
        strip = data[off : off + cnt_b]
        if len(strip) < cnt_b:
            raise ImageDataError("truncated TIFF strip")
        n_rows = min(rows_per_strip, h - si * rows_per_strip)
        need = n_rows * row_bytes
        if comp == 5:
            strip = _tiff_lzw_decode(strip, need)
        elif comp == 32773:
            strip = _packbits_decode(strip, need)
        if len(strip) < need:
            raise ImageDataError("TIFF strip too short")
        rows.append(np.frombuffer(strip, np.uint8, need).reshape(n_rows, row_bytes))
    flat = np.concatenate(rows, axis=0)
    img = flat.reshape(h, w, spp)
    if predictor == 2:  # horizontal differencing per sample
        img = np.cumsum(img.astype(np.uint16), axis=1).astype(np.uint8)
    if photo == 0:  # white-is-zero
        img = 255 - img
    if photo == 3:  # palette
        if 320 not in tags:
            raise ImageDataError("palette TIFF missing colormap")
        cm = np.array(tags[320], np.uint32)
        if len(cm) < 3 * 256:
            raise ImageDataError("short TIFF colormap")
        pal = (cm.reshape(3, -1).T >> 8).astype(np.uint8)
        img = pal[img[:, :, 0].astype(np.intp)]
        return img
    return img[:, :, 0] if spp == 1 else img


# --------------------------------------------------------------- SGI


def decode_sgi(data: bytes) -> np.ndarray:
    """Decode an SGI RGB image (magic 0x01DA): verbatim or RLE,
    1 byte/channel, 1-4 channels (rows stored bottom-up, planar).
    Returns (h, w[, c]) uint8."""
    if len(data) < 512:
        raise ImageDataError("truncated SGI header")
    magic, storage, bpc, dim, w, h, c = struct.unpack_from(">HBBHHHH", data, 0)
    if magic != 0x01DA:
        raise ImageDataError("not an SGI stream")
    if bpc != 1 or storage not in (0, 1):
        raise ImageDataError(f"unsupported SGI bpc={bpc} storage={storage}")
    if dim == 1:
        h = c = 1
    elif dim == 2:
        c = 1
    _check_dims(w, h)
    if not 1 <= c <= 4:
        raise ImageDataError(f"unsupported SGI channel count {c}")
    img = np.zeros((h, w, c), np.uint8)
    if storage == 0:  # verbatim planar
        need = 512 + w * h * c
        if len(data) < need:
            raise ImageDataError("truncated SGI data")
        planes = np.frombuffer(data, np.uint8, w * h * c, 512).reshape(c, h, w)
        img = np.moveaxis(planes, 0, 2)
    else:  # RLE: per-(row, channel) offset/length tables
        n_tab = h * c
        if len(data) < 512 + 8 * n_tab:
            raise ImageDataError("truncated SGI RLE tables")
        starts = np.frombuffer(data, ">u4", n_tab, 512)
        lengths = np.frombuffer(data, ">u4", n_tab, 512 + 4 * n_tab)
        for ch in range(c):
            for y in range(h):
                off = int(starts[ch * h + y])
                end = off + int(lengths[ch * h + y])
                if end > len(data):
                    raise ImageDataError("SGI RLE run out of bounds")
                row = bytearray()
                i = off
                while i < end:
                    pixel = data[i]
                    i += 1
                    count = pixel & 0x7F
                    if count == 0:
                        break
                    if pixel & 0x80:  # copy literal bytes
                        row += data[i : i + count]
                        i += count
                    else:  # repeat next byte
                        if i >= end:
                            raise ImageDataError("truncated SGI RLE run")
                        row += bytes([data[i]]) * count
                        i += 1
                if len(row) < w:
                    raise ImageDataError("short SGI RLE row")
                img[y, :, ch] = np.frombuffer(bytes(row[:w]), np.uint8)
    img = img[::-1].copy()  # rows are bottom-up
    return img[:, :, 0] if c == 1 else img


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
