"""Convex hull (Andrew monotone chain) and a strict point-outside
test — the geometric primitives behind the certificate-based exact
halo mode (``stages/salting.py``).

The hull is distributively combinable: hull(S) == hull(union of
hulls of any partition of S), so a Ray pipeline computes per-batch
partial hulls and a tiny per-tile combine produces the exact tile
hull without materializing the tile's points anywhere.
"""

from __future__ import annotations

import numpy as np


def _chain(pts: np.ndarray) -> np.ndarray:
    """Monotone chain over (n, 2) points -> CCW hull vertices (k, 2),
    no repeated endpoint. Collinear points on the boundary are
    DROPPED (strictly convex output)."""
    pts = np.unique(pts, axis=0)  # sorts lexicographically (x, then y)
    n = len(pts)
    if n <= 2:
        return pts

    def half(idx_iter):
        out: list[int] = []
        for i in idx_iter:
            while len(out) >= 2:
                ox, oy = pts[out[-2]]
                ax, ay = pts[out[-1]]
                bx, by = pts[i]
                if (ax - ox) * (by - oy) - (ay - oy) * (bx - ox) <= 0:
                    out.pop()
                else:
                    break
            out.append(i)
        return out

    lower = half(range(n))
    upper = half(range(n - 1, -1, -1))
    return pts[np.array(lower[:-1] + upper[:-1], dtype=np.int64)]


def convex_hull_xy(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """CCW convex hull of the point set as an (k, 2) array. A
    vectorized extreme-quadrilateral pre-filter discards interior
    points before the python chain loop (the Akl-Toussaint heuristic),
    so the loop runs over O(hull-ish) survivors, not all points."""
    pts = np.column_stack((np.asarray(x, np.float64), np.asarray(y, np.float64)))
    if len(pts) > 16:
        # CCW: leftmost -> bottom -> rightmost -> top
        qi = np.array(
            [np.argmin(pts[:, 0]), np.argmin(pts[:, 1]),
             np.argmax(pts[:, 0]), np.argmax(pts[:, 1])]
        )
        quad = pts[qi]
        keep = np.zeros(len(pts), dtype=bool)
        for j in range(4):
            e0 = quad[j]
            e1 = quad[(j + 1) % 4]
            # points on or right of a CCW quad edge may be on the hull
            keep |= (pts[:, 0] - e0[0]) * (e1[1] - e0[1]) - (
                pts[:, 1] - e0[1]
            ) * (e1[0] - e0[0]) >= 0
        keep[qi] = True
        pts = pts[keep]
    return _chain(pts)


def combine_hulls(hulls: list[np.ndarray]) -> np.ndarray:
    """Exact hull of a union from partial hulls."""
    pts = np.concatenate([h for h in hulls if len(h)]) if hulls else np.zeros((0, 2))
    if len(pts) == 0:
        return pts
    return _chain(pts)


def strictly_outside_hull(
    hull: np.ndarray, px: np.ndarray, py: np.ndarray, margin: float = 1e-6
) -> np.ndarray:
    """Boolean mask: query point lies at least ``margin`` OUTSIDE the
    CCW hull (certainly not inside or on the boundary). Degenerate
    hulls (< 3 vertices: the point set was empty / a point / a
    segment) certify nothing spans area, so everything off the
    segment/point by ``margin`` is outside; for simplicity those
    return all-False (callers treat un-certified as pending)."""
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    if len(hull) < 3:
        return np.zeros(len(px), dtype=bool)
    out = np.zeros(len(px), dtype=bool)
    hx = hull[:, 0]
    hy = hull[:, 1]
    nxt = np.roll(np.arange(len(hull)), -1)
    for j in range(len(hull)):
        ex, ey = hx[j], hy[j]
        dx, dy = hx[nxt[j]] - ex, hy[nxt[j]] - ey
        elen = float(np.hypot(dx, dy))
        if elen == 0.0:
            continue
        # (e1-e0) x (p-e0) / |e1-e0| = signed distance, left/inside > 0
        out |= dx * (py - ey) - dy * (px - ex) < -margin * elen
    return out
