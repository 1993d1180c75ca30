"""Delaunay triangulation — from-scratch port of the Delaunator
sweep-circle algorithm (Mapbox Delaunator, ISC-licensed public
algorithm; also the algorithm behind the reference's DelaunatorSharp
dependency, ``LasUtility/DEM/Triangulation.cs:68``).

Delaunay triangulations of points in general position are unique, so
any correct implementation yields the same triangle *set* as the
reference; conformance tests compare sets and interpolated values,
never array order (see SURVEY.md §7.5).

Pure Python/numpy, O(n log n); runs per tile inside ``map_groups``
(thousands of points per call), never on the driver.
"""

from __future__ import annotations

import math

import numpy as np

EPSILON = 2.0**-52
EDGE_STACK_SIZE = 512


def _orient2d(ax, ay, bx, by, cx, cy):
    """Robust-ish orientation: > 0 if (a,b,c) clockwise in this
    formulation (matches Delaunator's orient())."""
    return (by - ay) * (cx - bx) - (bx - ax) * (cy - by)


def _circumradius2(ax, ay, bx, by, cx, cy):
    dx = bx - ax
    dy = by - ay
    ex = cx - ax
    ey = cy - ay
    bl = dx * dx + dy * dy
    cl = ex * ex + ey * ey
    d = dx * ey - dy * ex
    if d == 0:
        return math.inf
    d = 0.5 / d
    x = (ey * bl - dy * cl) * d
    y = (dx * cl - ex * bl) * d
    return x * x + y * y


def _circumradius2_vec(ax, ay, bx, by, cx, cy):
    """Vectorized _circumradius2 over candidate arrays cx, cy."""
    dx = bx - ax
    dy = by - ay
    ex = cx - ax
    ey = cy - ay
    bl = dx * dx + dy * dy
    cl = ex * ex + ey * ey
    d = dx * ey - dy * ex
    with np.errstate(divide="ignore", invalid="ignore"):
        d = 0.5 / d
        px = (ey * bl - dy * cl) * d
        py = (dx * cl - ex * bl) * d
        out = px * px + py * py
    return np.where(np.isfinite(out), out, np.inf)


def _circumcenter(ax, ay, bx, by, cx, cy):
    dx = bx - ax
    dy = by - ay
    ex = cx - ax
    ey = cy - ay
    bl = dx * dx + dy * dy
    cl = ex * ex + ey * ey
    d = 0.5 / (dx * ey - dy * ex)
    return ax + (ey * bl - dy * cl) * d, ay + (dx * cl - ex * bl) * d


def _in_circle(ax, ay, bx, by, cx, cy, px, py):
    dx = ax - px
    dy = ay - py
    ex = bx - px
    ey = by - py
    fx = cx - px
    fy = cy - py
    ap = dx * dx + dy * dy
    bp = ex * ex + ey * ey
    cp = fx * fx + fy * fy
    return (
        dx * (ey * cp - bp * fy)
        - dy * (ex * cp - bp * fx)
        + ap * (ex * fy - ey * fx)
    ) < 0


class Delaunator:
    """Triangulate 2D points. ``triangles`` is a flat int array of
    vertex indices, 3 per triangle (same layout as the reference's
    ``_delaunator.Triangles``, ``Triangulation.cs:78``)."""

    def __init__(self, x: np.ndarray, y: np.ndarray):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        n = len(x)
        if n < 3:
            raise ValueError("needs at least 3 points")
        self._x = x
        self._y = y
        # hot-loop state lives in python lists: the incremental
        # insertion/legalization loops do scalar element access, where
        # list indexing is several times faster than numpy boxing
        self._xl = x.tolist()
        self._yl = y.tolist()

        max_triangles = max(2 * n - 5, 0)
        self._triangles = [0] * (max_triangles * 3)
        self._halfedges = [0] * (max_triangles * 3)
        self.triangles_len = 0

        self._hash_size = int(math.ceil(math.sqrt(n)))
        self._hull_prev = [0] * n
        self._hull_next = [0] * n
        self._hull_tri = [0] * n
        self._hull_hash = [-1] * self._hash_size
        self._edge_stack = [0] * EDGE_STACK_SIZE

        self._update()

    # -- public ------------------------------------------------------

    @property
    def triangles(self) -> np.ndarray:
        return np.array(self._triangles[: self.triangles_len], dtype=np.int64)

    @property
    def halfedges(self) -> np.ndarray:
        return np.array(self._halfedges[: self.triangles_len], dtype=np.int64)

    @property
    def hull(self) -> np.ndarray:
        return self._hull

    # -- core --------------------------------------------------------

    def _update(self):
        xnp, ynp = self._x, self._y
        x, y = self._xl, self._yl
        n = len(x)

        min_x, min_y = xnp.min(), ynp.min()
        max_x, max_y = xnp.max(), ynp.max()
        cx, cy = (min_x + max_x) / 2, (min_y + max_y) / 2

        # pick seed point close to centroid
        d2 = (xnp - cx) ** 2 + (ynp - cy) ** 2
        i0 = int(np.argmin(d2))
        i0x, i0y = x[i0], y[i0]

        # point closest to seed
        d2 = (xnp - i0x) ** 2 + (ynp - i0y) ** 2
        d2[i0] = np.inf
        i1 = int(np.argmin(d2))
        i1x, i1y = x[i1], y[i1]

        # third point: smallest circumcircle with first two
        # (vectorized: the python loop was the O(n) cold-start cost)
        r2 = _circumradius2_vec(i0x, i0y, i1x, i1y, xnp, ynp)
        r2[i0] = np.inf
        r2[i1] = np.inf
        i2 = int(np.argmin(r2))
        min_radius = float(r2[i2])
        if not math.isfinite(min_radius):
            raise ValueError("collinear input: no Delaunay triangulation exists")
        i2x, i2y = x[i2], y[i2]

        if _orient2d(i0x, i0y, i1x, i1y, i2x, i2y) < 0:
            i1, i2 = i2, i1
            i1x, i2x = i2x, i1x
            i1y, i2y = i2y, i1y

        self._cx, self._cy = _circumcenter(i0x, i0y, i1x, i1y, i2x, i2y)
        dists = (xnp - self._cx) ** 2 + (ynp - self._cy) ** 2
        ids = np.argsort(dists, kind="stable").tolist()

        hull_prev = self._hull_prev
        hull_next = self._hull_next
        hull_tri = self._hull_tri

        self._hull_start = i0
        hull_size = 3
        hull_next[i0] = hull_prev[i2] = i1
        hull_next[i1] = hull_prev[i0] = i2
        hull_next[i2] = hull_prev[i1] = i0
        hull_tri[i0] = 0
        hull_tri[i1] = 1
        hull_tri[i2] = 2

        self._hull_hash = [-1] * self._hash_size
        self._hull_hash[self._hash_key(i0x, i0y)] = i0
        self._hull_hash[self._hash_key(i1x, i1y)] = i1
        self._hull_hash[self._hash_key(i2x, i2y)] = i2

        self.triangles_len = 0
        self._add_triangle(i0, i1, i2, -1, -1, -1)

        xp = yp = math.nan
        for k in range(n):
            i = int(ids[k])
            xi, yi = x[i], y[i]

            # skip near-duplicate points
            if k > 0 and abs(xi - xp) <= EPSILON and abs(yi - yp) <= EPSILON:
                continue
            xp, yp = xi, yi

            if i == i0 or i == i1 or i == i2:
                continue

            # find a visible edge on the convex hull using edge hash
            start = 0
            key = self._hash_key(xi, yi)
            for j in range(self._hash_size):
                start = int(self._hull_hash[(key + j) % self._hash_size])
                if start != -1 and start != int(hull_next[start]):
                    break

            start = int(hull_prev[start])
            e = start
            while True:
                q = int(hull_next[e])
                if _orient2d(xi, yi, x[e], y[e], x[q], y[q]) < 0:
                    break
                e = q
                if e == start:
                    e = -1
                    break
            if e == -1:
                continue  # likely a near-duplicate point

            # first triangle from the point
            t = self._add_triangle(e, i, int(hull_next[e]), -1, -1, int(hull_tri[e]))
            hull_tri[i] = self._legalize(t + 2)
            hull_tri[e] = t
            hull_size += 1

            # walk forward, adding triangles
            nn = int(hull_next[e])
            while True:
                q = int(hull_next[nn])
                if not (_orient2d(xi, yi, x[nn], y[nn], x[q], y[q]) < 0):
                    break
                t = self._add_triangle(nn, i, q, int(hull_tri[i]), -1, int(hull_tri[nn]))
                hull_tri[i] = self._legalize(t + 2)
                hull_next[nn] = nn  # mark removed
                hull_size -= 1
                nn = q

            # walk backward
            if e == start:
                while True:
                    q = int(hull_prev[e])
                    if not (_orient2d(xi, yi, x[q], y[q], x[e], y[e]) < 0):
                        break
                    t = self._add_triangle(q, i, e, -1, int(hull_tri[e]), int(hull_tri[q]))
                    self._legalize(t + 2)
                    hull_tri[q] = t
                    hull_next[e] = e  # mark removed
                    hull_size -= 1
                    e = q

            self._hull_start = e
            hull_prev[i] = e
            hull_next[e] = i
            hull_prev[nn] = i
            hull_next[i] = nn

            self._hull_hash[self._hash_key(xi, yi)] = i
            self._hull_hash[self._hash_key(x[e], y[e])] = e

        hull = np.zeros(hull_size, dtype=np.int64)
        e = self._hull_start
        for i in range(hull_size):
            hull[i] = e
            e = int(hull_next[e])
        self._hull = hull

    def _hash_key(self, px, py) -> int:
        dx = px - self._cx
        dy = py - self._cy
        # pseudo-angle: monotone with true angle
        p = dx / (abs(dx) + abs(dy)) if (dx or dy) else 0.0
        a = (3 - p) / 4 if dy > 0 else (1 + p) / 4
        return int(math.floor(a * self._hash_size)) % self._hash_size

    def _link(self, a: int, b: int):
        self._halfedges[a] = b
        if b != -1:
            self._halfedges[b] = a

    def _add_triangle(self, i0, i1, i2, a, b, c) -> int:
        t = self.triangles_len
        self._triangles[t] = i0
        self._triangles[t + 1] = i1
        self._triangles[t + 2] = i2
        self._link(t, a)
        self._link(t + 1, b)
        self._link(t + 2, c)
        self.triangles_len += 3
        return t

    def _legalize(self, a: int) -> int:
        triangles = self._triangles
        halfedges = self._halfedges
        coords_x, coords_y = self._xl, self._yl
        stack = self._edge_stack
        i = 0
        ar = 0

        while True:
            b = int(halfedges[a])
            a0 = a - a % 3
            ar = a0 + (a + 2) % 3

            if b == -1:
                if i == 0:
                    break
                i -= 1
                a = int(stack[i])
                continue

            b0 = b - b % 3
            al = a0 + (a + 1) % 3
            bl = b0 + (b + 2) % 3

            p0 = int(triangles[ar])
            pr = int(triangles[a])
            pl = int(triangles[al])
            p1 = int(triangles[bl])

            illegal = _in_circle(
                coords_x[p0], coords_y[p0],
                coords_x[pr], coords_y[pr],
                coords_x[pl], coords_y[pl],
                coords_x[p1], coords_y[p1],
            )

            if illegal:
                triangles[a] = p1
                triangles[b] = p0

                hbl = int(halfedges[bl])
                if hbl == -1:
                    # edge is on convex hull: fix hull_tri reference
                    e = self._hull_start
                    while True:
                        if int(self._hull_tri[e]) == bl:
                            self._hull_tri[e] = a
                            break
                        e = int(self._hull_prev[e])
                        if e == self._hull_start:
                            break
                self._link(a, hbl)
                self._link(b, int(halfedges[ar]))
                self._link(ar, bl)

                br = b0 + (b + 1) % 3
                if i < len(stack):
                    stack[i] = br
                    i += 1
            else:
                if i == 0:
                    break
                i -= 1
                a = int(stack[i])

        return ar


def triangulate(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Convenience: points -> (n_tri, 3) int64 vertex-index array."""
    d = Delaunator(x, y)
    return d.triangles.reshape(-1, 3)
