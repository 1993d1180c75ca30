"""Distributed-merge exact Delaunay: seam-merge per-strip Delaunay
triangulations of x-separated point subsets into the Delaunay
triangulation of the union.

This is the merge step of the classic divide-and-conquer Delaunay
algorithms (Lee & Schachter 1980; Guibas & Stolfi 1985, "Primitives
for the manipulation of general subdivisions" — public algorithms),
re-expressed over vertex adjacency lists instead of quad-edges so the
initial structure can be built vectorized from Delaunator triangle
arrays:

1. each strip is triangulated independently (``geom.delaunay``
   Delaunator, exactly the builder the single-task path uses);
2. the union adjacency (CCW-sorted neighbor lists per vertex) is
   assembled vectorized from all strip triangle arrays at once;
3. adjacent strips are merged left-to-right with the rising-bridge
   loop: lower common hull tangent, then alternating left/right
   candidate selection with in-circle deletions until the upper
   tangent — only seam vertices are ever touched by python-loop code;
4. the final triangle set is assembled incrementally: strip triangles
   that touch no deleted edge survive unchanged (a final triangle
   whose three edges are all strip edges must have been a face of its
   strip's triangulation — a triangle face holds no interior
   vertices), and the new seam triangles are exactly the faces
   adjacent to added cross edges, traced in O(seam) from the final
   adjacency. The merge task therefore does O(n) vectorized work plus
   O(seam) python work — never a full re-extraction.

Because the Delaunay triangulation of points in general position is
unique, the merged triangle SET equals the single-build triangle set;
``stages/salting.py`` uses this to split a hot tile's BUILD across
tasks (strip builds in parallel, one cheap seam-merge task) with
output bit-identical to the unsalted path wherever containment is
unambiguous — the same argument the certified halo mode rests on.
Degenerate inputs (a strip with < 3 points, collinear strips, exact
four-point cocircularity on a seam) raise :class:`MergeError` and the
caller falls back to the single-task build.

Predicates are the same double-precision arithmetic Delaunator uses;
near-cocircular quads beyond float discrimination may flip a diagonal
vs the incremental build (measure-zero for jittered survey data, and
the affected cells interpolate identically on the shared edge).
"""

from __future__ import annotations

from bisect import bisect_left, insort

import numpy as np

from .delaunay import Delaunator


class MergeError(ValueError):
    """Raised when the strip-merge cannot certify an exact result;
    callers fall back to the single-task full build."""


def _pseudo_angle(dx: float, dy: float) -> float:
    """Monotone CCW pseudo-angle in [0, 1): East=0, North=0.25,
    West=0.5, South=0.75 (y-up)."""
    d = abs(dx) + abs(dy)
    if d == 0.0:
        raise MergeError("zero-length edge (duplicate point on a seam)")
    p = dx / d
    if dy >= 0.0:
        return (1.0 - p) / 4.0
    return (3.0 + p) / 4.0


def _pseudo_angle_vec(dx: np.ndarray, dy: np.ndarray) -> np.ndarray:
    d = np.abs(dx) + np.abs(dy)
    with np.errstate(divide="ignore", invalid="ignore"):
        p = dx / d
    up = (1.0 - p) / 4.0
    dn = (3.0 + p) / 4.0
    out = np.where(dy >= 0.0, up, dn)
    if not np.isfinite(out).all():
        raise MergeError("zero-length edge (duplicate point on a seam)")
    return out


def _orient(ax, ay, bx, by, cx, cy):
    """> 0 iff (a, b, c) counterclockwise (c left of a->b), y-up."""
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _in_circle(ax, ay, bx, by, cx, cy, dx, dy):
    """> 0 iff d strictly inside the circle through CCW (a, b, c)."""
    adx = ax - dx
    ady = ay - dy
    bdx = bx - dx
    bdy = by - dy
    cdx = cx - dx
    cdy = cy - dy
    alift = adx * adx + ady * ady
    blift = bdx * bdx + bdy * bdy
    clift = cdx * cdx + cdy * cdy
    return (
        adx * (bdy * clift - blift * cdy)
        - ady * (bdx * clift - blift * cdx)
        + alift * (bdx * cdy - bdy * cdx)
    ) > 0


class _Adjacency:
    """CCW-sorted neighbor lists over all points: CSR arrays built
    vectorized from the strip triangulations, per-vertex python lists
    materialized lazily only for vertices the seam merge touches."""

    def __init__(self, x: np.ndarray, y: np.ndarray, tris_all: np.ndarray):
        self.x = x
        self.y = y
        n = len(x)
        self.n = n
        a, b, c = tris_all[:, 0], tris_all[:, 1], tris_all[:, 2]
        u = np.concatenate([a, b, c, b, c, a])
        v = np.concatenate([b, c, a, a, b, c])
        lo = np.minimum(u, v).astype(np.int64)
        hi = np.maximum(u, v).astype(np.int64)
        und = np.unique(lo * n + hi)
        lo, hi = und // n, und % n
        du = np.concatenate([lo, hi])
        dv = np.concatenate([hi, lo])
        ang = _pseudo_angle_vec(x[dv] - x[du], y[dv] - y[du])
        order = np.lexsort((ang, du))
        self._csr_nbr = dv[order]
        self._csr_ang = ang[order]
        counts = np.bincount(du, minlength=n)
        self._csr_starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=self._csr_starts[1:])
        self.n_edges0 = len(und)  # initial undirected edge count
        self._nbrs: dict[int, list] = {}
        self._angs: dict[int, list] = {}
        self.added: set[int] = set()
        self.deleted: set[int] = set()

    # -- lazy per-vertex lists ------------------------------------

    def _touch(self, u: int):
        nb = self._nbrs.get(u)
        if nb is None:
            s, e = self._csr_starts[u], self._csr_starts[u + 1]
            nb = self._csr_nbr[s:e].tolist()
            self._nbrs[u] = nb
            self._angs[u] = self._csr_ang[s:e].tolist()
        return nb

    def ccw_next(self, u: int, v: int) -> int:
        nb = self._touch(u)
        i = nb.index(v)
        return nb[(i + 1) % len(nb)]

    def cw_next(self, u: int, v: int) -> int:
        nb = self._touch(u)
        i = nb.index(v)
        return nb[i - 1]

    def _key(self, u: int, v: int) -> int:
        return (u * self.n + v) if u < v else (v * self.n + u)

    def add_edge(self, u: int, v: int):
        for a, b in ((u, v), (v, u)):
            nb = self._touch(a)
            ang = _pseudo_angle(self.x[b] - self.x[a], self.y[b] - self.y[a])
            pos = bisect_left(self._angs[a], ang)
            nb.insert(pos, b)
            insort(self._angs[a], ang)
        k = self._key(u, v)
        if k in self.deleted:
            self.deleted.discard(k)
        else:
            self.added.add(k)

    def del_edge(self, u: int, v: int):
        for a, b in ((u, v), (v, u)):
            nb = self._touch(a)
            i = nb.index(b)
            nb.pop(i)
            self._angs[a].pop(i)
        k = self._key(u, v)
        if k in self.added:
            self.added.discard(k)
        else:
            self.deleted.add(k)



def _normalize_ccw_hull(hull: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    hx, hy = x[hull], y[hull]
    area2 = np.sum(hx * np.roll(hy, -1) - np.roll(hx, -1) * hy)
    if area2 < 0:
        return hull[::-1]
    return hull


def merge_parts(
    x: np.ndarray,
    y: np.ndarray,
    part_tris: list[np.ndarray],
    part_hulls: list[np.ndarray],
) -> np.ndarray:
    """Merge x-separated Delaunay parts into the union's Delaunay.

    ``part_tris[i]``: (n_i, 3) GLOBAL vertex indices of strip i's
    triangulation; ``part_hulls[i]``: strip i's convex hull as global
    indices (any rotation, either orientation). Strips must be ordered
    left to right with every point of strip i strictly left (in x) of
    every point of strip i+1. Returns the (n_tri, 3) triangle array of
    the union (vertex order within each triangle is CCW; triangle
    order is by minimal vertex id — a canonical, deterministic order).
    """
    if len(part_tris) != len(part_hulls) or not part_tris:
        raise MergeError("need at least one part with matching hulls")
    for t in part_tris:
        if len(t) == 0:
            raise MergeError("empty part triangulation")

    adj = _Adjacency(x, y, np.concatenate([np.asarray(t).reshape(-1, 3) for t in part_tris]))

    hull_next: dict[int, int] = {}
    hull_prev: dict[int, int] = {}
    hulls = [
        _normalize_ccw_hull(np.asarray(h, dtype=np.int64), x, y) for h in part_hulls
    ]
    for h in hulls:
        for i in range(len(h)):
            a, b = int(h[i]), int(h[(i + 1) % len(h)])
            hull_next[a] = b
            hull_prev[b] = a

    def lexmax(idx: np.ndarray) -> int:
        xx, yy = x[idx], y[idx]
        best = np.lexsort((yy, xx))[-1]
        return int(idx[best])

    def lexmin(idx: np.ndarray) -> int:
        xx, yy = x[idx], y[idx]
        best = np.lexsort((yy, xx))[0]
        return int(idx[best])

    left_rightmost = lexmax(hulls[0])
    for pi in range(1, len(hulls)):
        right_leftmost = lexmin(hulls[pi])
        _merge_pair(adj, hull_next, hull_prev, left_rightmost, right_leftmost, x, y)
        left_rightmost = lexmax(hulls[pi])

    return _assemble_triangles(adj, part_tris, part_hulls, hull_next, left_rightmost)


def _merge_pair(adj, hull_next, hull_prev, l0, r0, x, y):
    """Rising-bridge merge of the accumulated left part (rightmost
    hull vertex ``l0``) with the next strip (leftmost ``r0``)."""

    # lower common tangent: slide both endpoints down their hulls
    # until no hull neighbor is strictly below the line l->r
    l, r = l0, r0
    for _ in range(4 * adj.n + 8):
        lp = hull_prev[l]
        if _orient(x[l], y[l], x[r], y[r], x[lp], y[lp]) < 0:
            l = lp
            continue
        rn = hull_next[r]
        if _orient(x[l], y[l], x[r], y[r], x[rn], y[rn]) < 0:
            r = rn
            continue
        break
    else:
        raise MergeError("lower-tangent walk did not converge")

    lt_l, lt_r = l, r
    adj.add_edge(l, r)

    for _ in range(6 * adj.n + 16):
        # left candidate: rotate CCW around l starting from r
        lcand = adj.ccw_next(l, r)
        lvalid = _orient(x[l], y[l], x[r], y[r], x[lcand], y[lcand]) > 0
        if lvalid:
            while True:
                nxt = adj.ccw_next(l, lcand)
                if nxt == r:
                    break
                if _in_circle(
                    x[l], y[l], x[r], y[r], x[lcand], y[lcand], x[nxt], y[nxt]
                ):
                    adj.del_edge(l, lcand)
                    lcand = nxt
                else:
                    break
            lvalid = _orient(x[l], y[l], x[r], y[r], x[lcand], y[lcand]) > 0

        # right candidate: rotate CW around r starting from l
        rcand = adj.cw_next(r, l)
        rvalid = _orient(x[l], y[l], x[r], y[r], x[rcand], y[rcand]) > 0
        if rvalid:
            while True:
                nxt = adj.cw_next(r, rcand)
                if nxt == l:
                    break
                if _in_circle(
                    x[l], y[l], x[r], y[r], x[rcand], y[rcand], x[nxt], y[nxt]
                ):
                    adj.del_edge(r, rcand)
                    rcand = nxt
                else:
                    break
            rvalid = _orient(x[l], y[l], x[r], y[r], x[rcand], y[rcand]) > 0

        if not lvalid and not rvalid:
            break  # reached the upper common tangent

        if not lvalid or (
            rvalid
            and _in_circle(
                x[lcand], y[lcand], x[l], y[l], x[r], y[r], x[rcand], y[rcand]
            )
        ):
            adj.add_edge(l, rcand)
            r = rcand
        else:
            adj.add_edge(lcand, r)
            l = lcand
    else:
        raise MergeError("bridge loop did not converge")

    # merged hull: bottom bridge lt_l -> lt_r (CCW traverses the
    # bottom left-to-right), top bridge r -> l (CCW traverses the top
    # right-to-left); interior remnants of the old hulls drop out
    hull_next[lt_l] = lt_r
    hull_prev[lt_r] = lt_l
    hull_next[r] = l
    hull_prev[l] = r


def _assemble_triangles(
    adj: _Adjacency,
    part_tris: list[np.ndarray],
    part_hulls: list[np.ndarray],
    hull_next: dict,
    hull_vertex: int,
) -> np.ndarray:
    """Incremental final triangle set: strip triangles that touch no
    deleted edge survive (a final triangle whose three edges are all
    strip edges encloses no vertex, so it was a face of its strip's
    triangulation), plus the faces adjacent to added cross edges,
    traced from the final adjacency (left face of u->v closes in
    exactly three ``cw_next`` steps; the outer face fails closure or
    the CCW-orientation test)."""
    x, y, n = adj.x, adj.y, adj.n
    base = np.concatenate([np.asarray(t).reshape(-1, 3) for t in part_tris])
    if adj.deleted:
        darr = np.fromiter(adj.deleted, dtype=np.int64)
        a, b, c = base[:, 0], base[:, 1], base[:, 2]

        def key(u, v):
            return np.minimum(u, v) * n + np.maximum(u, v)

        bad = (
            np.isin(key(a, b), darr)
            | np.isin(key(b, c), darr)
            | np.isin(key(c, a), darr)
        )
        base = base[~bad]

    new = []
    seen = set()
    for k in adj.added:
        u, v = int(k // n), int(k % n)
        for a, b in ((u, v), (v, u)):
            c = adj.cw_next(b, a)
            if c == a or adj.cw_next(c, b) != a or adj.cw_next(a, c) != b:
                continue  # not a 3-cycle (outer face or larger walk)
            if _orient(x[a], y[a], x[b], y[b], x[c], y[c]) <= 0:
                continue  # CW cycle = the outer face of a 3-hull
            tkey = (a, b, c) if a < b and a < c else ((b, c, a) if b < c else (c, a, b))
            if tkey not in seen:
                seen.add(tkey)
                new.append(tkey)
    tris = (
        np.concatenate([base, np.array(new, dtype=np.int64).reshape(-1, 3)])
        if new
        else base
    )

    # Euler certification: a strip triangulation with T_i triangles
    # and h_i hull vertices has p_i = (T_i + h_i + 2) / 2 points and
    # E_i = (3 T_i + h_i) / 2 edges; the merged triangulation must
    # satisfy T = 2p - 2 - h and E = 3p - 3 - h. Any seam degeneracy
    # the float predicates mishandled shows up here and triggers the
    # single-build fallback.
    p = sum((len(t) + len(h) + 2) // 2 for t, h in zip(part_tris, part_hulls))
    n_edges = (
        sum((3 * len(t) + len(h)) // 2 for t, h in zip(part_tris, part_hulls))
        - len(adj.deleted)
        + len(adj.added)
    )
    h = 1
    v0 = hull_vertex
    v = hull_next[v0]
    limit = n + 2
    while v != v0:
        v = hull_next[v]
        h += 1
        limit -= 1
        if limit <= 0:
            raise MergeError("merged hull walk did not close")
    if len(tris) != 2 * p - 2 - h or n_edges != 3 * p - 3 - h:
        raise MergeError(
            f"Euler check failed: p={p} h={h} tris={len(tris)} edges={n_edges}"
        )
    return tris


def delaunay_merge_strips(
    x: np.ndarray, y: np.ndarray, n_strips: int
) -> np.ndarray:
    """Reference composition (used by tests and as the in-task
    fallback shape): assign equal-width x strips, triangulate each
    with Delaunator, seam-merge. Raises MergeError on degenerate
    strips — callers fall back to a single full Delaunator build."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    strip = strip_assign(x, n_strips)
    part_tris, part_hulls = [], []
    for s in range(n_strips):
        idx = np.flatnonzero(strip == s)
        t, h = build_strip(x, y, idx)
        if t is None:
            raise MergeError(f"strip {s}: degenerate ({len(idx)} points)")
        part_tris.append(t)
        part_hulls.append(h)
    return merge_parts(x, y, part_tris, part_hulls)


def strip_assign(x: np.ndarray, n_strips: int) -> np.ndarray:
    """Deterministic equal-width x strips over [min, max]; every point
    with the same x lands in the same strip, so strips are strictly
    x-separated."""
    x0, x1 = float(np.min(x)), float(np.max(x))
    w = (x1 - x0) / n_strips if x1 > x0 else 1.0
    s = np.minimum(((x - x0) / w).astype(np.int64), n_strips - 1)
    return np.maximum(s, 0)


def build_strip(x, y, idx):
    """Triangulate one strip; returns (tris_global, hull_global) or
    (None, None) when the strip is degenerate (< 3 points or
    collinear)."""
    if len(idx) < 3:
        return None, None
    try:
        d = Delaunator(x[idx], y[idx])
    except ValueError:
        return None, None
    if d.triangles_len == 0:
        return None, None
    return idx[d.triangles.reshape(-1, 3)], idx[d.hull]
