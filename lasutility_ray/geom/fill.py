"""Even-odd scanline polygon fill over a byte raster.

Matches ``LasUtility/Common/MathUtils.cs:89-170`` (Darel Rex Finley's
public-domain polygon fill, 2007):

- polygon vertices are first projected to *cell index space* with
  ``ProjToCell`` (``MathUtils.cs:104-109``);
- per raster row, edge crossings use the asymmetric rule
  ``polyY[i] < y && polyY[j] >= y || polyY[j] < y && polyY[i] >= y``
  (``MathUtils.cs:131``);
- node x positions are truncated to int (``MathUtils.cs:136``);
- fill is half-open per crossing pair: ``[nodeX[i], nodeX[i+1])``
  (``MathUtils.cs:162-168``);
- rows iterated over the polygon envelope's cell rows only.

The reference caps crossings at 100 per row (``MathUtils.cs:119``);
we keep the cap as a validation to preserve failure semantics.

Holes (interior rings) are handled as in
``RasteriserEvenOdd.cs:103-148``: exterior ring filled with the value,
interior rings re-filled with NoData on a temp raster, then non-NoData
cells copied back so pre-existing values inside holes survive.
"""

from __future__ import annotations

import numpy as np

from .bounds import RasterBounds

MAX_NODES_PER_ROW = 100  # MathUtils.cs:119
NO_DATA = 0  # ByteRaster.cs:13


def fill_polygon_window(
    bounds: RasterBounds,
    raster: np.ndarray,
    value: int,
    ring_xy: np.ndarray,
) -> None:
    """Window-mode fill: the ring may extend (far) beyond ``bounds``;
    cell coordinates are computed with floor in the global grid
    (identical to the reference's ProjToCell for in-bounds vertices,
    and the correct continuation outside), rows are restricted to the
    window and spans clamped to its columns. Fill spans covering
    window cells are therefore bit-identical to an unsplit
    full-extent burn — the exactness basis of the tiled J3 burn (no
    polygon clipping, no clip artifacts)."""
    poly_x = np.floor((ring_xy[:, 0] - bounds.min_x) / bounds.cell_width)
    poly_y = np.floor((ring_xy[:, 1] - bounds.min_y) / bounds.cell_height)
    row_lo = max(int(poly_y.min()), 0)
    row_hi = min(int(poly_y.max()), bounds.n_rows - 1)
    if row_hi < row_lo:
        return
    # edge pre-filter: edges whose y-span misses the window rows can
    # produce no crossings there — dropping them never changes row
    # parity (an x-filter WOULD: off-window edges still flip parity)
    jx = np.roll(poly_x, 1)
    jy = np.roll(poly_y, 1)
    lo = np.minimum(poly_y, jy)
    hi = np.maximum(poly_y, jy)
    keep = (hi >= row_lo) & (lo <= row_hi)
    if not keep.any():
        return
    _fill_rows_edges(
        raster, value, row_hi, row_lo,
        poly_x[keep], poly_y[keep], jx[keep], jy[keep], clamp_cols=True,
    )


def fill_polygon(
    bounds: RasterBounds,
    raster: np.ndarray,
    value: int,
    ring_xy: np.ndarray,
) -> None:
    """Fill one ring (closed coordinate sequence) into ``raster``.

    ``ring_xy``: float64 (n, 2) projected coordinates of the ring
    (first == last point allowed but not required — the reference
    passes the closed LineString; the crossing loop uses all vertices
    with the wrap edge ``j = i-1`` so a duplicated closing vertex is
    harmless and we keep it for exactness).
    """
    env_min_x = ring_xy[:, 0].min()
    env_min_y = ring_xy[:, 1].min()
    env_max_x = ring_xy[:, 0].max()
    env_max_y = ring_xy[:, 1].max()

    rc_min = bounds.proj_to_cell_scalar(env_min_x, env_min_y)
    rc_max = bounds.proj_to_cell_scalar(env_max_x, env_max_y)
    if rc_min is None or rc_max is None:
        raise ValueError("Polygon is larger than the bounds")

    rows, cols, _valid = bounds.proj_to_cell(ring_xy[:, 0], ring_xy[:, 1])
    poly_x = cols.astype(np.float64)
    poly_y = rows.astype(np.float64)

    _fill_rows(raster, value, rc_max[0], rc_min[0], poly_x, poly_y)


def _fill_rows(
    raster: np.ndarray,
    value: int,
    image_top: int,
    image_bot: int,
    poly_x: np.ndarray,
    poly_y: np.ndarray,
    clamp_cols: bool = False,
) -> None:
    """Vectorized Finley fill (MathUtils.cs:114-170).

    Edge crossings for all rows are computed in one (n_edges, n_rows)
    numpy pass; the per-row pair fill loops only over rows that have
    crossings.
    """
    jx = np.roll(poly_x, 1)  # polyX[j], j = i-1 with wraparound
    jy = np.roll(poly_y, 1)
    _fill_rows_edges(
        raster, value, image_top, image_bot, poly_x, poly_y, jx, jy, clamp_cols
    )


def _fill_rows_edges(
    raster: np.ndarray,
    value: int,
    image_top: int,
    image_bot: int,
    poly_x: np.ndarray,
    poly_y: np.ndarray,
    jx: np.ndarray,
    jy: np.ndarray,
    clamp_cols: bool = False,
) -> None:
    rows = np.arange(image_bot, image_top + 1, dtype=np.float64)
    if rows.size == 0:
        return

    # crossing condition per (edge, row)
    yi = poly_y[:, None]
    yj = jy[:, None]
    r = rows[None, :]
    crossing = ((yi < r) & (yj >= r)) | ((yj < r) & (yi >= r))

    if not crossing.any():
        return

    # node x per (edge, row); safe divide (only used where crossing)
    denom = yj - yi
    denom_safe = np.where(denom == 0, 1.0, denom)
    node = poly_x[:, None] + (r - yi) / denom_safe * (jx[:, None] - poly_x[:, None])
    # C# (int) cast truncates toward zero (MathUtils.cs:136)
    node_i = np.trunc(node).astype(np.int64)

    counts = crossing.sum(axis=0)
    if counts.max(initial=0) > MAX_NODES_PER_ROW:
        raise ValueError(
            f"Cannot process polygons with more than {MAX_NODES_PER_ROW} edges per row."
        )

    n_cols = raster.shape[1]
    for k in np.flatnonzero(counts):
        xs = np.sort(node_i[crossing[:, k], k])
        y = image_bot + k
        for i in range(0, len(xs) - 1, 2):
            a, b = xs[i], xs[i + 1]
            if clamp_cols:
                a = max(a, 0)
                b = min(b, n_cols)
            if b > a:
                raster[y, a:b] = value


def burn_polygon_with_holes(
    bounds: RasterBounds,
    raster: np.ndarray,
    temp_raster: np.ndarray | None,
    value: int,
    exterior_xy: np.ndarray,
    interiors_xy: list[np.ndarray],
    env_rc_min: tuple[int, int],
    env_rc_max: tuple[int, int],
) -> np.ndarray | None:
    """RasterisePolygon (RasteriserEvenOdd.cs:103-148).

    If the polygon has interior rings, fill on a temp raster and copy
    back only non-NoData cells inside the *feature envelope* rows/cols
    ``[min, max)`` (note the reference's strict ``<`` loop bounds at
    RasteriserEvenOdd.cs:134-136 — preserved exactly). Returns the
    (possibly newly allocated) temp raster for reuse.
    """
    if not interiors_xy:
        fill_polygon(bounds, raster, value, exterior_xy)
        return temp_raster

    if temp_raster is None:
        temp_raster = np.full_like(raster, NO_DATA)

    fill_polygon(bounds, temp_raster, value, exterior_xy)
    for ring in interiors_xy:
        fill_polygon(bounds, temp_raster, NO_DATA, ring)

    r0, c0 = env_rc_min
    r1, c1 = env_rc_max
    win = temp_raster[r0:r1, c0:c1]
    mask = win != NO_DATA
    raster[r0:r1, c0:c1][mask] = win[mask]
    win[mask] = NO_DATA
    return temp_raster
