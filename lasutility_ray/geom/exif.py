"""Minimal EXIF (APP1/TIFF) writer + parser — geotag metadata for the
JPEG payloads in the multimodal pipeline (spec: CIPA DC-008 / TIFF
6.0; the IFD walk follows the same structure as
``geom/simple_images.decode_tiff``). Covers the fields a geospatial
corpus pipeline actually mines: Orientation, DateTime and the GPS IFD
(latitude/longitude as the spec's degree/minute/second RATIONAL
triplets, both hemisphere refs), little- or big-endian.

Exactness: the writer stores coordinates as
``(deg, 1), (0, 1), (frac * 3600, 1_000_000)`` so the micro-degree
value round-trips through the rational triplet with pure integer
arithmetic (``frac * 3600 * 10^6 // (3600 * 10^6) == frac``); the
parser's generic path handles foreign (deg, min, sec) encodings with
the same floor semantics.
"""

from __future__ import annotations

import struct

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


def _rat3(e6_abs: int) -> list[tuple[int, int]]:
    deg = e6_abs // 1_000_000
    frac = e6_abs % 1_000_000
    return [(deg, 1), (0, 1), (frac * 3600, 1_000_000)]


def build_exif(
    lat_e6: int,
    lon_e6: int,
    orientation: int = 1,
    datetime: str = "2024:01:01 00:00:00",
) -> bytes:
    """Signed micro-degree coordinates -> an APP1 Exif payload
    (little-endian TIFF)."""
    lat_ref = b"N\x00" if lat_e6 >= 0 else b"S\x00"
    lon_ref = b"E\x00" if lon_e6 >= 0 else b"W\x00"
    dt = datetime.encode("ascii") + b"\x00"
    assert len(dt) == 20

    # layout: TIFF header (8) | IFD0 (2 + 3*12 + 4) | dt (20) |
    #         GPS IFD (2 + 4*12 + 4) | lat rats (24) | lon rats (24)
    ifd0_off = 8
    dt_off = ifd0_off + 2 + 3 * 12 + 4
    gps_off = dt_off + 20
    lat_off = gps_off + 2 + 4 * 12 + 4
    lon_off = lat_off + 24

    def entry(tag, typ, count, value):
        return struct.pack("<HHI", tag, typ, count) + value

    tiff = bytearray(b"II*\x00" + struct.pack("<I", ifd0_off))
    tiff += struct.pack("<H", 3)
    tiff += entry(0x0112, 3, 1, struct.pack("<HH", orientation, 0))
    tiff += entry(0x0132, 2, 20, struct.pack("<I", dt_off))
    tiff += entry(0x8825, 4, 1, struct.pack("<I", gps_off))
    tiff += struct.pack("<I", 0)
    tiff += dt
    tiff += struct.pack("<H", 4)
    tiff += entry(0x0001, 2, 2, lat_ref + b"\x00\x00")
    tiff += entry(0x0002, 5, 3, struct.pack("<I", lat_off))
    tiff += entry(0x0003, 2, 2, lon_ref + b"\x00\x00")
    tiff += entry(0x0004, 5, 3, struct.pack("<I", lon_off))
    tiff += struct.pack("<I", 0)
    for num, den in _rat3(abs(lat_e6)) + _rat3(abs(lon_e6)):
        tiff += struct.pack("<II", num, den)
    return b"Exif\x00\x00" + bytes(tiff)


def insert_exif_app1(jpeg: bytes, exif_payload: bytes) -> bytes:
    """Splice an APP1 Exif segment right after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    seg = b"\xff\xe1" + struct.pack(">H", len(exif_payload) + 2) + exif_payload
    return jpeg[:2] + seg + jpeg[2:]


def _read_ifd(data: bytes, off: int, e: str) -> dict:
    (n,) = struct.unpack_from(e + "H", data, off)
    out = {}
    for i in range(n):
        tag, typ, count = struct.unpack_from(e + "HHI", data, off + 2 + i * 12)
        voff = off + 2 + i * 12 + 8
        size = _TYPE_SIZES.get(typ, 1) * count
        if size > 4:
            (voff,) = struct.unpack_from(e + "I", data, voff)
        out[tag] = (typ, count, voff)
    return out


def _value(data: bytes, typ: int, count: int, voff: int, e: str):
    if typ == 2:
        raw = data[voff : voff + count]
        return raw.split(b"\x00")[0].decode("ascii", "replace")
    if typ == 3:
        return list(struct.unpack_from(e + "H" * count, data, voff))
    if typ == 4:
        return list(struct.unpack_from(e + "I" * count, data, voff))
    if typ == 5:
        vals = struct.unpack_from(e + "II" * count, data, voff)
        return [(vals[2 * i], vals[2 * i + 1]) for i in range(count)]
    return None


def _dms_to_e6(rats: list[tuple[int, int]]) -> int:
    """(deg, min, sec) rational triplet -> floor micro-degrees, pure
    integer (exact for this module's own encoding)."""
    (dn, dd), (mn, md), (sn, sd) = rats
    dd, md, sd = max(dd, 1), max(md, 1), max(sd, 1)
    # e6 = dn/dd * 1e6 + mn/md * 1e6/60 + sn/sd * 1e6/3600, floored
    # over the common denominator
    num = dn * md * sd * 3600 + mn * dd * sd * 60 + sn * dd * md
    return num * 1_000_000 // (dd * md * sd * 3600)


def parse_exif(payload: bytes) -> dict:
    """APP1 Exif payload -> {orientation, datetime, lat_e6, lon_e6}
    (signed micro-degrees; missing fields -> None)."""
    if payload[:6] != b"Exif\x00\x00":
        raise ValueError("not an Exif payload")
    data = payload[6:]
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("bad TIFF byte order")
    (magic,) = struct.unpack_from(e + "H", data, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    (ifd0,) = struct.unpack_from(e + "I", data, 4)
    tags = _read_ifd(data, ifd0, e)
    out = {"orientation": None, "datetime": None, "lat_e6": None, "lon_e6": None}
    if 0x0112 in tags:
        out["orientation"] = _value(data, *tags[0x0112], e)[0]
    if 0x0132 in tags:
        out["datetime"] = _value(data, *tags[0x0132], e)
    if 0x8825 in tags:
        (gps_off,) = (_value(data, *tags[0x8825], e) or [None])
        g = _read_ifd(data, gps_off, e)
        for ref_tag, val_tag, key, neg in (
            (0x0001, 0x0002, "lat_e6", "S"),
            (0x0003, 0x0004, "lon_e6", "W"),
        ):
            if val_tag in g:
                e6 = _dms_to_e6(_value(data, *g[val_tag], e))
                ref = _value(data, *g[ref_tag], e) if ref_tag in g else ""
                out[key] = -e6 if ref == neg else e6
    return out


def extract_exif_from_jpeg(jpeg: bytes) -> dict | None:
    """Walk JPEG markers for the APP1 Exif segment; None if absent."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(jpeg) and jpeg[pos] == 0xFF:
        marker = jpeg[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:  # SOS: entropy data follows, no more APPn
            return None
        (seglen,) = struct.unpack_from(">H", jpeg, pos + 2)
        if marker == 0xE1 and jpeg[pos + 4 : pos + 10] == b"Exif\x00\x00":
            return parse_exif(jpeg[pos + 4 : pos + 2 + seglen])
        pos += 2 + seglen
    return None
