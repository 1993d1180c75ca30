"""Per-tile DEM viewshed — the classic terrain-analysis operator
(which cells can an observer see?) over the engine's geocoded corpus,
run as an exact integer R3 line-of-sight sweep.

Per 1 km tile: rasterize the tile's points to a CELL_MM grid DEM
(per-cell max height, cm ints straight from the geocoder hash; empty
cells are ground level 0), put the observer on the tile's highest
occupied cell (+OBS_CM antenna), then test EVERY cell along its own
Bresenham ray — a cell at path length M is occluded iff some
intermediate step m has tangent >= the target's:

    (z_m - z_obs) * M >= (z_tgt - z_obs) * m      (exact int64)

The sweep is vectorized the R3 way turned sideways: ALL rays step
SIMULTANEOUSLY (one (n_cells,) Bresenham state update per step, <=
2*GRID steps total), so there is no per-cell python loop. Ties
occlude (>=), observer and adjacent cells are visible by
construction — all pinned by hand-DEM tests (flat plane -> everything
visible; a wall -> exact shadow).

Shape at 100 TB: slim (tile, cell, z) rows through the engine's
standard coarse-bucket tile shuffle (group_apply_bucketed); each
tile's sweep touches only its own grid. Rows-only query (line-of-
sight has no SQL expression); kernel pinned by construction tests.
Reference framing: the closest reference surface is the DEM
rasterization consumed by WriteAsAscii (LasUtility/DEM/*); viewshed
is the beyond-reference terrain analytic on the same raster.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .snap import point_mm

TILE_MM = 1_000_000  # 1 km
CELL_MM = 20_000  # 20 m cells -> 50x50 grid per tile
GRID = TILE_MM // CELL_MM
OBS_CM = 200  # observer antenna height (cm)


def visible_mask(z: np.ndarray, oi: int, oj: int, obs_cm: int = OBS_CM):
    """Exact integer R3 viewshed over grid ``z`` (cm) from observer
    cell (oi, oj); returns a boolean visibility grid."""
    g = z.shape[0]
    zo = int(z[oi, oj]) + obs_cm
    ti, tj = np.meshgrid(np.arange(g), np.arange(g), indexing="ij")
    ti, tj = ti.ravel(), tj.ravel()
    di = np.abs(ti - oi)
    dj = np.abs(tj - oj)
    si = np.sign(ti - oi)
    sj = np.sign(tj - oj)
    M = np.maximum(di, dj)  # Bresenham path length per target
    dzc = z[ti, tj].astype(np.int64) - zo
    # simultaneous Bresenham: state per ray
    x = np.full(len(ti), oi)
    y = np.full(len(tj), oj)
    err = di - dj
    blocked = np.zeros(len(ti), dtype=bool)
    for step in range(1, int(M.max(initial=0))):
        e2 = 2 * err
        move_x = e2 >= -dj
        move_y = e2 <= di
        err = err + np.where(move_x, -dj, 0) + np.where(move_y, di, 0)
        # finished rays keep stepping; clamp them into the grid (their
        # samples are masked out by `live` below)
        x = np.clip(x + np.where(move_x, si, 0), 0, g - 1)
        y = np.clip(y + np.where(move_y, sj, 0), 0, g - 1)
        live = step < M  # only intermediate steps occlude
        dzm = z[x, y].astype(np.int64) - zo
        blocked |= live & (dzm * M >= dzc * step)
    return (~blocked).reshape(g, g)


def _tile_sweep(df: pd.DataFrame) -> pd.DataFrame:
    ci = df["ci"].to_numpy(np.int64)
    cj = df["cj"].to_numpy(np.int64)
    zc = df["z_cm"].to_numpy(np.int64)
    z = np.zeros((GRID, GRID), dtype=np.int64)
    np.maximum.at(z, (ci, cj), zc)
    occupied = np.zeros((GRID, GRID), dtype=bool)
    occupied[ci, cj] = True
    # observer: highest occupied cell, ties -> smallest (ci, cj)
    zi = np.where(occupied, z, -1)
    flat = int(np.argmax(zi))  # argmax takes the first (row-major) max
    oi, oj = divmod(flat, GRID)
    vis = visible_mask(z, oi, oj)
    return pd.DataFrame(
        {
            "tile_i": df["tile_i"].iloc[:1].to_numpy(np.int64),
            "tile_j": df["tile_j"].iloc[:1].to_numpy(np.int64),
            "obs_i": np.array([oi], np.int64),
            "obs_j": np.array([oj], np.int64),
            "n_occupied": np.array([int(occupied.sum())], np.int64),
            "n_visible": np.array([int(vis.sum())], np.int64),
            "n_occupied_visible": np.array(
                [int((vis & occupied).sum())], np.int64
            ),
        }
    )


def tile_viewsheds(docs_ds):
    """documents -> one viewshed summary row per occupied 1 km tile."""
    from .cogroup import group_apply_bucketed

    def slim(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        px, py = point_mm(d)
        h1 = (d * 2654435761) % 4294967296
        z_cm = h1 % 100000  # the geocoder's z numerator, exact cm
        return pa.table(
            {
                "tile_key": pa.array(
                    (px // TILE_MM) * 1024 + py // TILE_MM, pa.int64()
                ),
                "tile_i": pa.array(px // TILE_MM, pa.int64()),
                "tile_j": pa.array(py // TILE_MM, pa.int64()),
                "ci": pa.array((px % TILE_MM) // CELL_MM, pa.int64()),
                "cj": pa.array((py % TILE_MM) // CELL_MM, pa.int64()),
                "z_cm": pa.array(z_cm, pa.int64()),
            }
        )

    return group_apply_bucketed(
        docs_ds.map_batches(slim, batch_format="pyarrow"),
        "tile_key",
        _tile_sweep,
    )
