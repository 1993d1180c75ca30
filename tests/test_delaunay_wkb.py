"""Delaunay property tests + WKB codec + box clipping."""

import numpy as np
import pytest

from lasutility_ray.geom.delaunay import Delaunator, _in_circle, triangulate
from lasutility_ray.geom import clip as cl
from lasutility_ray.geom.wkbgeom import (
    LineString,
    MultiLineString,
    MultiPolygon,
    Polygon,
    box_polygon,
    from_wkb,
    to_wkb,
)


def hull_area(pts):
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(ps):
        h = []
        for p in ps:
            while len(h) >= 2 and np.cross(h[-1] - h[-2], p - h[-2]) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.array(lower[:-1] + upper[:-1])
    x0, y0 = hull[:, 0], hull[:, 1]
    return 0.5 * abs(np.dot(x0, np.roll(y0, -1)) - np.dot(y0, np.roll(x0, -1)))


class TestDelaunay:
    @pytest.mark.parametrize("n", [3, 10, 100, 1000])
    def test_covers_convex_hull(self, n):
        rng = np.random.default_rng(n)
        x = rng.uniform(0, 100, n)
        y = rng.uniform(0, 100, n)
        tris = triangulate(x, y)
        ax, ay = x[tris[:, 0]], y[tris[:, 0]]
        bx, by = x[tris[:, 1]], y[tris[:, 1]]
        cx, cy = x[tris[:, 2]], y[tris[:, 2]]
        area = 0.5 * np.abs((bx - ax) * (cy - ay) - (cx - ax) * (by - ay)).sum()
        assert abs(area - hull_area(np.stack([x, y], axis=1))) < 1e-6 * max(area, 1)

    def test_empty_circumcircle(self):
        rng = np.random.default_rng(9)
        x = rng.uniform(0, 100, 300)
        y = rng.uniform(0, 100, 300)
        tris = triangulate(x, y)
        for ti in rng.integers(0, len(tris), 40):
            i0, i1, i2 = tris[ti]
            for pi in rng.integers(0, 300, 30):
                if pi in (i0, i1, i2):
                    continue
                assert not _in_circle(
                    x[i0], y[i0], x[i1], y[i1], x[i2], y[i2], x[pi], y[pi]
                )

    def test_collinear_raises(self):
        with pytest.raises(ValueError):
            Delaunator(np.array([0.0, 1.0, 2.0]), np.array([0.0, 1.0, 2.0]))

    def test_too_few_points_raises(self):
        with pytest.raises(ValueError):
            Delaunator(np.array([0.0, 1.0]), np.array([0.0, 0.0]))


class TestWkb:
    def test_polygon_roundtrip(self):
        p = Polygon(
            np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=np.float64),
            [np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], dtype=np.float64)],
        )
        q = from_wkb(to_wkb(p))
        assert isinstance(q, Polygon)
        assert np.array_equal(q.exterior, p.exterior)
        assert len(q.interiors) == 1
        assert q.envelope == (0, 0, 4, 4)

    def test_multi_roundtrip(self):
        mp = MultiPolygon([box_polygon(0, 0, 1, 1), box_polygon(2, 2, 3, 3)])
        q = from_wkb(to_wkb(mp))
        assert isinstance(q, MultiPolygon) and len(q.parts) == 2
        assert q.envelope == (0, 0, 3, 3)
        ls = LineString(np.array([[0, 0], [5, 5], [10, 0]], dtype=np.float64))
        mls = MultiLineString([ls, LineString(ls.coords + 20)])
        q2 = from_wkb(to_wkb(mls))
        assert isinstance(q2, MultiLineString) and len(q2.parts) == 2


class TestClip:
    def test_polygon_clip(self):
        p = box_polygon(-5, -5, 5, 5)
        c = cl.clip_polygon(p, 0, 0, 10, 10)
        assert c is not None
        assert c.envelope == (0, 0, 5, 5)

    def test_polygon_outside_returns_none(self):
        p = box_polygon(20, 20, 30, 30)
        assert cl.clip_polygon(p, 0, 0, 10, 10) is None

    def test_linestring_clip(self):
        ls = LineString(np.array([[-5, 5], [15, 5]], dtype=np.float64))
        c = cl.clip_linestring(ls, 0, 0, 10, 10)
        assert isinstance(c, LineString)
        assert np.allclose(c.coords[0], [0, 5])
        assert np.allclose(c.coords[-1], [10, 5])

    def test_linestring_split_into_parts(self):
        # enters, leaves, re-enters -> MultiLineString
        ls = LineString(
            np.array([[-5, 5], [5, 5], [5, 20], [8, 20], [8, 5], [15, 5]], dtype=np.float64)
        )
        c = cl.clip_linestring(ls, 0, 0, 10, 10)
        assert isinstance(c, MultiLineString)
        assert len(c.parts) == 2

    def test_envelope_contains(self):
        assert cl.envelope_contains((0, 0, 10, 10), (1, 1, 2, 2))
        assert not cl.envelope_contains((0, 0, 10, 10), (1, 1, 12, 2))
