"""Vectorized even-odd point-in-polygon (ray casting).

The membership rule mirrors the reference's even-odd scanline fill
(``Common/MathUtils.cs:114-170``, crossing rule at ``:131``): a point
is inside iff a horizontal ray to -inf crosses the rings an odd
number of times. Crossing test per edge (y0 <= py < y1 half-open in
y, matching ``nodeY[i] < y && nodeY[j] >= y || ...``) keeps vertices
from double-counting. Holes come free: parity over ALL rings.
"""

from __future__ import annotations

import numpy as np


def points_in_ring_parity(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Boolean parity flips for one ring; callers XOR parities over
    rings. ``ring`` is (n, 2), closed or open (closure implied)."""
    x0 = ring[:, 0]
    y0 = ring[:, 1]
    x1 = np.roll(x0, -1)
    y1 = np.roll(y0, -1)
    # drop the duplicate closing edge if the ring is explicitly closed
    if ring.shape[0] > 1 and ring[0, 0] == ring[-1, 0] and ring[0, 1] == ring[-1, 1]:
        x0, y0, x1, y1 = x0[:-1], y0[:-1], x1[:-1], y1[:-1]

    py_ = py[:, None]
    px_ = px[:, None]
    crosses = (y0[None, :] <= py_) != (y1[None, :] <= py_)
    # x of edge at scan height py (only meaningful where crosses)
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        t = (py_ - y0[None, :]) / (y1[None, :] - y0[None, :])
        xs = x0[None, :] + t * (x1[None, :] - x0[None, :])
    hits = crosses & (xs < px_)
    return hits.sum(axis=1) % 2 == 1


def points_in_polygon(px, py, exterior: np.ndarray, interiors=()) -> np.ndarray:
    """Even-odd membership: parity over exterior + hole rings."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = points_in_ring_parity(px, py, np.asarray(exterior, dtype=np.float64))
    for hole in interiors:
        inside ^= points_in_ring_parity(px, py, np.asarray(hole, dtype=np.float64))
    return inside
