"""Minimal geometry model + WKB codec (no shapely in this container).

Covers exactly the geometry types the reference rasterises
(``RasteriserEvenOdd.cs:56-80``): Polygon, MultiPolygon, LineString,
MultiLineString (2D). WKB layout follows the OGC SFA spec
(little-endian only — we produce and consume our own polygon tables).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6


@dataclass
class LineString:
    coords: np.ndarray  # float64 (n, 2)

    @property
    def envelope(self):
        c = self.coords
        return (c[:, 0].min(), c[:, 1].min(), c[:, 0].max(), c[:, 1].max())


@dataclass
class Polygon:
    exterior: np.ndarray  # float64 (n, 2), closed ring
    interiors: list = field(default_factory=list)  # list of float64 (n, 2)

    @property
    def envelope(self):
        c = self.exterior
        return (c[:, 0].min(), c[:, 1].min(), c[:, 0].max(), c[:, 1].max())


@dataclass
class MultiLineString:
    parts: list  # list[LineString]

    @property
    def envelope(self):
        envs = [p.envelope for p in self.parts]
        return (
            min(e[0] for e in envs),
            min(e[1] for e in envs),
            max(e[2] for e in envs),
            max(e[3] for e in envs),
        )


@dataclass
class MultiPolygon:
    parts: list  # list[Polygon]

    @property
    def envelope(self):
        envs = [p.envelope for p in self.parts]
        return (
            min(e[0] for e in envs),
            min(e[1] for e in envs),
            max(e[2] for e in envs),
            max(e[3] for e in envs),
        )


# ---------------------------------------------------------------- WKB


def _ring_bytes(ring: np.ndarray) -> bytes:
    ring = np.ascontiguousarray(ring, dtype="<f8")
    return struct.pack("<I", len(ring)) + ring.tobytes()


def to_wkb(geom) -> bytes:
    if isinstance(geom, LineString):
        return b"\x01" + struct.pack("<I", WKB_LINESTRING) + _ring_bytes(geom.coords)
    if isinstance(geom, Polygon):
        rings = [geom.exterior] + list(geom.interiors)
        body = struct.pack("<I", len(rings)) + b"".join(_ring_bytes(r) for r in rings)
        return b"\x01" + struct.pack("<I", WKB_POLYGON) + body
    if isinstance(geom, MultiLineString):
        body = struct.pack("<I", len(geom.parts)) + b"".join(to_wkb(p) for p in geom.parts)
        return b"\x01" + struct.pack("<I", WKB_MULTILINESTRING) + body
    if isinstance(geom, MultiPolygon):
        body = struct.pack("<I", len(geom.parts)) + b"".join(to_wkb(p) for p in geom.parts)
        return b"\x01" + struct.pack("<I", WKB_MULTIPOLYGON) + body
    raise TypeError(f"unsupported geometry {type(geom)}")


def _read_ring(buf: memoryview, off: int):
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    coords = np.frombuffer(buf[off : off + 16 * n], dtype="<f8").reshape(n, 2).copy()
    return coords, off + 16 * n


def _from_wkb_at(buf: memoryview, off: int):
    byte_order = buf[off]
    if byte_order != 1:
        raise ValueError("only little-endian WKB supported")
    (gtype,) = struct.unpack_from("<I", buf, off + 1)
    off += 5
    gtype = gtype & 0xFF  # strip any SRID/dimension flags
    if gtype == WKB_LINESTRING:
        coords, off = _read_ring(buf, off)
        return LineString(coords), off
    if gtype == WKB_POLYGON:
        (nrings,) = struct.unpack_from("<I", buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            ring, off = _read_ring(buf, off)
            rings.append(ring)
        return Polygon(rings[0], rings[1:]), off
    if gtype in (WKB_MULTILINESTRING, WKB_MULTIPOLYGON):
        (nparts,) = struct.unpack_from("<I", buf, off)
        off += 4
        parts = []
        for _ in range(nparts):
            part, off = _from_wkb_at(buf, off)
            parts.append(part)
        cls = MultiLineString if gtype == WKB_MULTILINESTRING else MultiPolygon
        return cls(parts), off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def from_wkb(data: bytes):
    geom, _ = _from_wkb_at(memoryview(data), 0)
    return geom


def polygon_z_wkb(xs, ys, zs) -> bytes:
    """ISO WKB PolygonZ (type 1003) of one closed 3-vertex ring — the
    triangle feature payload of ExportToShp (DEM/Triangulation.cs:
    132-157: PolygonZ per triangle)."""
    import struct

    n = len(xs)
    parts = [struct.pack("<BII I", 1, 1003, 1, n + 1)]
    for i in list(range(n)) + [0]:
        parts.append(struct.pack("<ddd", float(xs[i]), float(ys[i]), float(zs[i])))
    return b"".join(parts)


def box_polygon(min_x, min_y, max_x, max_y) -> Polygon:
    """Closed CCW rectangle ring, like NTS factory.ToGeometry(Envelope)."""
    ring = np.array(
        [
            [min_x, min_y],
            [max_x, min_y],
            [max_x, max_y],
            [min_x, max_y],
            [min_x, min_y],
        ],
        dtype=np.float64,
    )
    return Polygon(ring)
