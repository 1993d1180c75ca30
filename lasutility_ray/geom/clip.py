"""Clip geometries to an axis-aligned box.

Stands in for NTS ``Geometry.Intersection(areaGeometry)`` as used at
``RasteriserEvenOdd.cs:43-48`` (the clip window there is the raster
area shrunk by epsilon). Polygons use Sutherland-Hodgman against the
convex box (per ring); line strings use Liang-Barsky per segment and
re-join contiguous runs. Sufficient for the engine's polygon tables
(rectilinear / simple synthetic features); degenerate results
(empty after clip) return None.
"""

from __future__ import annotations

import numpy as np

from .wkbgeom import LineString, MultiLineString, MultiPolygon, Polygon


def _clip_ring_half(pts: np.ndarray, axis: int, bound: float, keep_less: bool) -> np.ndarray:
    """Clip a closed ring against one half-plane; returns a closed ring."""
    if len(pts) == 0:
        return pts
    open_pts = pts[:-1] if len(pts) > 1 and np.array_equal(pts[0], pts[-1]) else pts
    out = []
    n = len(open_pts)
    for i in range(n):
        cur = open_pts[i]
        prv = open_pts[i - 1]
        cur_in = (cur[axis] <= bound) if keep_less else (cur[axis] >= bound)
        prv_in = (prv[axis] <= bound) if keep_less else (prv[axis] >= bound)
        if cur_in:
            if not prv_in:
                out.append(_intersect(prv, cur, axis, bound))
            out.append(cur)
        elif prv_in:
            out.append(_intersect(prv, cur, axis, bound))
    if not out:
        return np.empty((0, 2), dtype=np.float64)
    out.append(out[0])
    return np.asarray(out, dtype=np.float64)


def _intersect(p, q, axis: int, bound: float):
    t = (bound - p[axis]) / (q[axis] - p[axis])
    r = p + t * (q - p)
    r[axis] = bound
    return r


def clip_ring(ring: np.ndarray, min_x, min_y, max_x, max_y) -> np.ndarray:
    out = ring
    for axis, bound, keep_less in (
        (0, min_x, False),
        (0, max_x, True),
        (1, min_y, False),
        (1, max_y, True),
    ):
        out = _clip_ring_half(out, axis, bound, keep_less)
        if len(out) == 0:
            return out
    return out


def clip_polygon(poly: Polygon, min_x, min_y, max_x, max_y):
    ext = clip_ring(poly.exterior, min_x, min_y, max_x, max_y)
    if len(ext) < 4:  # < triangle + closing point
        return None
    interiors = []
    for ring in poly.interiors:
        c = clip_ring(ring, min_x, min_y, max_x, max_y)
        if len(c) >= 4:
            interiors.append(c)
    return Polygon(ext, interiors)


def _clip_segment(p, q, min_x, min_y, max_x, max_y):
    """Liang-Barsky; returns (p', q') or None."""
    x0, y0 = p
    x1, y1 = q
    dx, dy = x1 - x0, y1 - y0
    t0, t1 = 0.0, 1.0
    for num, den in (
        (min_x - x0, dx),
        (x0 - max_x, -dx),
        (min_y - y0, dy),
        (y0 - max_y, -dy),
    ):
        if den == 0:
            if num > 0:
                return None
            continue
        t = num / den
        if den > 0:
            t0 = max(t0, t)
        else:
            t1 = min(t1, t)
        if t0 > t1:
            return None
    return (
        np.array([x0 + t0 * dx, y0 + t0 * dy]),
        np.array([x0 + t1 * dx, y0 + t1 * dy]),
    )


def clip_linestring(ls: LineString, min_x, min_y, max_x, max_y):
    """Clip; contiguous surviving runs become LineString parts."""
    coords = ls.coords
    parts = []
    cur = []
    for i in range(1, len(coords)):
        seg = _clip_segment(coords[i - 1], coords[i], min_x, min_y, max_x, max_y)
        if seg is None:
            if len(cur) >= 2:
                parts.append(np.asarray(cur))
            cur = []
            continue
        a, b = seg
        if not cur:
            cur = [a, b]
        elif np.allclose(cur[-1], a):
            cur.append(b)
        else:
            if len(cur) >= 2:
                parts.append(np.asarray(cur))
            cur = [a, b]
    if len(cur) >= 2:
        parts.append(np.asarray(cur))
    if not parts:
        return None
    if len(parts) == 1:
        return LineString(parts[0])
    return MultiLineString([LineString(p) for p in parts])


def clip_geometry(geom, min_x, min_y, max_x, max_y):
    """Clip any supported geometry to the box; None if nothing remains."""
    if isinstance(geom, Polygon):
        return clip_polygon(geom, min_x, min_y, max_x, max_y)
    if isinstance(geom, MultiPolygon):
        parts = [
            c
            for p in geom.parts
            if (c := clip_polygon(p, min_x, min_y, max_x, max_y)) is not None
        ]
        if not parts:
            return None
        return parts[0] if len(parts) == 1 else MultiPolygon(parts)
    if isinstance(geom, LineString):
        return clip_linestring(geom, min_x, min_y, max_x, max_y)
    if isinstance(geom, MultiLineString):
        parts = []
        for p in geom.parts:
            c = clip_linestring(p, min_x, min_y, max_x, max_y)
            if c is None:
                continue
            parts.extend(c.parts if isinstance(c, MultiLineString) else [c])
        if not parts:
            return None
        return parts[0] if len(parts) == 1 else MultiLineString(parts)
    raise TypeError(f"unsupported geometry {type(geom)}")


def envelope_contains(outer, inner) -> bool:
    """NTS Envelope.Contains: outer contains inner envelope."""
    return (
        inner[0] >= outer[0]
        and inner[1] >= outer[1]
        and inner[2] <= outer[2]
        and inner[3] <= outer[3]
    )
