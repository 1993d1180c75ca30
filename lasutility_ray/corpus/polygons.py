"""Deterministic synthetic polygon/line feature table (the
shapefile-style small side of the PIP join / rasterisation flows).

Shape follows FIXTURES.md §1.2: ``feature_id, kind, geom_wkb, luokka,
source, feature_seq, min_x, min_y, max_x, max_y``. Three families:

- ``rect``   axis-aligned building rectangles — int arithmetic on the
             feature index, reproducible in SQL (``rects_sql_cte``);
             these back the DuckDB-checked PIP-join query with
             half-open ``[min,max)`` containment.
- ``holed``  lake polygons with a rectangular hole — exercise the
             even-odd fill + temp-raster path (pytest conformance).
- ``line``   road polylines — exercise the Bresenham burn.

Burn order is ``(source, feature_seq)`` — the reference sorts source
files and processes features in file order (RasteriserEvenOdd.Tests
.cs:45-46; later features overwrite earlier ones).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom.wkbgeom import LineString, Polygon, to_wkb
from .geocode import AREA_MIN_E, AREA_MIN_N, AREA_SIZE, H1_MUL, H2_MUL
from .nls import BUILDING_POLYGON, ROAD_LINE, WATER_POLYGON

N_RECTS = 200
N_HOLED = 20
N_LINES = 40

_BUILDING_CODES = sorted(BUILDING_POLYGON)
_WATER_CODES = sorted(WATER_POLYGON)
_ROAD_CODES = sorted(ROAD_LINE)

N_TILES_EDGE = AREA_SIZE // 1000  # 24


N_URBAN_START = 160  # rects k >= 160 are large blocks in the 4 urban tiles
URBAN_TILE_T = 6 * 24 + 6  # tile (col 6, row 6) = the first urban tile


def rect_params(k: np.ndarray):
    """Rectangle k -> (min_x, min_y, max_x, max_y, luokka); exact
    int64 arithmetic mirrored by ``rects_sql_cte``. k < 160: small
    buildings spread over the area; k >= 160: 200 m blocks inside the
    urban skew tiles (so the PIP join has dense coverage)."""
    k = np.asarray(k, dtype=np.int64)
    urban = k >= N_URBAN_START
    t = np.where(urban, URBAN_TILE_T + k % 4, k % (N_TILES_EDGE * N_TILES_EDGE))
    te = AREA_MIN_E + (t % N_TILES_EDGE) * 1000
    tn = AREA_MIN_N + (t // N_TILES_EDGE) * 1000
    min_x = te + (k * H1_MUL) % np.where(urban, 790, 700)
    min_y = tn + (k * H2_MUL) % np.where(urban, 790, 700)
    w = np.where(urban, 200, 20 + k % 60)
    h = np.where(urban, 200, 20 + (k * 7) % 60)
    luokka = np.asarray(_BUILDING_CODES, dtype=np.int32)[k % len(_BUILDING_CODES)]
    return min_x, min_y, min_x + w, min_y + h, luokka


def rects_sql_cte(name: str = "rects") -> str:
    """DuckDB CTE reproducing :func:`rect_params` for k in
    [0, N_RECTS)."""
    codes = ", ".join(str(c) for c in _BUILDING_CODES)
    ne = N_TILES_EDGE
    return f"""
{name}_t AS (
  SELECT k,
    CASE WHEN k >= {N_URBAN_START} THEN {URBAN_TILE_T} + k % 4
         ELSE k % {ne * ne} END AS t,
    CASE WHEN k >= {N_URBAN_START} THEN 790 ELSE 700 END AS m,
    CASE WHEN k >= {N_URBAN_START} THEN 200 ELSE 20 + k % 60 END AS w,
    CASE WHEN k >= {N_URBAN_START} THEN 200 ELSE 20 + (k * 7) % 60 END AS h
  FROM (SELECT unnest(range({N_RECTS})) AS k)),
{name} AS (
  SELECT k,
    {AREA_MIN_E} + (t % {ne}) * 1000 + (k * {H1_MUL}) % m AS min_x,
    {AREA_MIN_N} + (t // {ne}) * 1000 + (k * {H2_MUL}) % m AS min_y,
    {AREA_MIN_E} + (t % {ne}) * 1000 + (k * {H1_MUL}) % m + w AS max_x,
    {AREA_MIN_N} + (t // {ne}) * 1000 + (k * {H2_MUL}) % m + h AS max_y,
    [{codes}][CAST(k % {len(_BUILDING_CODES)} AS INT) + 1] AS luokka
  FROM {name}_t)
"""


def build_feature_table() -> pa.Table:
    """The full deterministic feature table (small: broadcastable)."""
    rows = {
        "feature_id": [], "kind": [], "geom_wkb": [], "luokka": [],
        "source": [], "feature_seq": [], "min_x": [], "min_y": [],
        "max_x": [], "max_y": [],
    }

    def add(fid, kind, geom, luokka, source, seq):
        env = geom.envelope
        rows["feature_id"].append(fid)
        rows["kind"].append(kind)
        rows["geom_wkb"].append(to_wkb(geom))
        rows["luokka"].append(luokka)
        rows["source"].append(source)
        rows["feature_seq"].append(seq)
        rows["min_x"].append(float(env[0]))
        rows["min_y"].append(float(env[1]))
        rows["max_x"].append(float(env[2]))
        rows["max_y"].append(float(env[3]))

    fid = 0
    ks = np.arange(N_RECTS)
    x0, y0, x1, y1, luokka = rect_params(ks)
    for k in range(N_RECTS):
        ring = np.array(
            [
                [x0[k], y0[k]], [x1[k], y0[k]], [x1[k], y1[k]],
                [x0[k], y1[k]], [x0[k], y0[k]],
            ],
            dtype=np.float64,
        )
        add(fid, "rect", Polygon(ring), int(luokka[k]), "r_synth_p", k)
        fid += 1

    for k in range(N_HOLED):
        # lakes with a rectangular island (hole)
        cx = AREA_MIN_E + 1500 + (k * 104729) % (AREA_SIZE - 3000)
        cy = AREA_MIN_N + 1500 + (k * 130363) % (AREA_SIZE - 3000)
        half = 200 + (k * 37) % 300
        hole_half = half // 3
        ext = np.array(
            [
                [cx - half, cy - half], [cx + half, cy - half],
                [cx + half, cy + half], [cx - half, cy + half],
                [cx - half, cy - half],
            ],
            dtype=np.float64,
        )
        hole = np.array(
            [
                [cx - hole_half, cy - hole_half], [cx + hole_half, cy - hole_half],
                [cx + hole_half, cy + hole_half], [cx - hole_half, cy + hole_half],
                [cx - hole_half, cy - hole_half],
            ],
            dtype=np.float64,
        )
        code = _WATER_CODES[k % len(_WATER_CODES)]
        add(fid, "holed", Polygon(ext, [hole]), code, "m_synth_p", k)
        fid += 1

    for k in range(N_LINES):
        # roads: two-segment polylines
        sx = AREA_MIN_E + (k * 49297) % (AREA_SIZE - 2000)
        sy = AREA_MIN_N + (k * 57139) % (AREA_SIZE - 2000)
        mx = sx + 300 + (k * 11) % 500
        my = sy + (k * 13) % 700
        ex = mx + 400
        ey = my + 200 + (k * 17) % 400
        coords = np.array([[sx, sy], [mx, my], [ex, ey]], dtype=np.float64)
        code = _ROAD_CODES[k % len(_ROAD_CODES)]
        add(fid, "line", LineString(coords), code, "l_synth_v", k)
        fid += 1

    return pa.table(
        {
            "feature_id": pa.array(rows["feature_id"], pa.int64()),
            "kind": pa.array(rows["kind"], pa.string()),
            "geom_wkb": pa.array(rows["geom_wkb"], pa.binary()),
            "luokka": pa.array(rows["luokka"], pa.int32()),
            "source": pa.array(rows["source"], pa.string()),
            "feature_seq": pa.array(rows["feature_seq"], pa.int64()),
            "min_x": pa.array(rows["min_x"], pa.float64()),
            "min_y": pa.array(rows["min_y"], pa.float64()),
            "max_x": pa.array(rows["max_x"], pa.float64()),
            "max_y": pa.array(rows["max_y"], pa.float64()),
        }
    )
