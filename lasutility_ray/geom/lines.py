"""Grid line traversal (4-connected Bresenham variant).

Matches ``LasUtility/Common/MathUtils.cs:18-87`` (the public-domain
"RasterLineTo" walk): every step moves exactly one cell in x OR y
(``i = dx + dy`` steps), with a perfect-diagonal fast path that moves
both axes per step (``MathUtils.cs:40-60``). The decision sequence is
stateful, so the general case is a literal sequential walk; the
perfect-diagonal and axis-aligned cases (the common ones for clipped
road segments) are vectorized closed forms.
"""

from __future__ import annotations

import numpy as np


def line_cells_ref(ax: int, ay: int, bx: int, by: int):
    """Literal port of MathUtils.Line (MathUtils.cs:18-87)."""
    out = [(ax, ay)]
    xinc = -1 if bx < ax else 1
    yinc = -1 if by < ay else 1
    dx = xinc * (bx - ax)
    dy = yinc * (by - ay)

    if dx == dy:  # perfect diagonal (MathUtils.cs:40-60)
        while dx > 0:
            dx -= 1
            ax += xinc
            ay += yinc
            out.append((ax, ay))
        return out

    side = -1 * ((yinc if dx == 0 else xinc) - 1)
    i = dx + dy
    error = dx - dy
    dx *= 2
    dy *= 2
    while i > 0:
        i -= 1
        if error > 0 or error == side:
            ax += xinc
            error -= dy
        else:
            ay += yinc
            error += dx
        out.append((ax, ay))
    return out


def line_cells(ax: int, ay: int, bx: int, by: int) -> np.ndarray:
    """Cells on the 4-connected line, as an int64 array (n, 2) of (x, y).

    Vectorized fast paths for diagonals and axis-aligned segments;
    the general case walks the exact reference error loop (cell count
    is bounded by the tile span, so this is never cross-batch hot).
    """
    xinc = -1 if bx < ax else 1
    yinc = -1 if by < ay else 1
    dx = xinc * (bx - ax)
    dy = yinc * (by - ay)

    if dx == dy:
        steps = np.arange(dx + 1, dtype=np.int64)
        return np.stack((ax + xinc * steps, ay + yinc * steps), axis=1)
    if dy == 0:
        steps = np.arange(dx + 1, dtype=np.int64)
        return np.stack((ax + xinc * steps, np.full(dx + 1, ay, dtype=np.int64)), axis=1)
    if dx == 0:
        steps = np.arange(dy + 1, dtype=np.int64)
        return np.stack((np.full(dy + 1, ax, dtype=np.int64), ay + yinc * steps), axis=1)

    return np.asarray(line_cells_ref(ax, ay, bx, by), dtype=np.int64)


def burn_line(
    raster: np.ndarray, ax: int, ay: int, bx: int, by: int, value: int,
    clamp: bool = False,
) -> None:
    """Burn a line into ``raster[y][x]`` (RasteriserEvenOdd.cs:84-101).
    ``clamp=True`` drops cells outside the raster (used by the tiled
    burn, whose segments stay unclipped for Bresenham exactness)."""
    cells = line_cells(ax, ay, bx, by)
    if clamp:
        m = (
            (cells[:, 0] >= 0)
            & (cells[:, 0] < raster.shape[1])
            & (cells[:, 1] >= 0)
            & (cells[:, 1] < raster.shape[0])
        )
        cells = cells[m]
    raster[cells[:, 1], cells[:, 0]] = value
