"""Tiling stage: pages/documents -> geocoded, tile-keyed points.

The map-side of every wide step (SURVEY.md §3.1 "Ray shape"):
``read_parquet -> map_batches(add_tile_columns, batch_format=
"pyarrow")``. The emitted ``tile_id`` (1 km NLS name,
``Nls/TileNamer.cs:314-481``) is the engine's partition/shuffle key;
``row``/``col`` are the in-tile voxel cell indices at ``CELL_SIZE_M``
(half-open bounds semantics, ``Common/RasterBounds.cs:118-133``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..corpus.geocode import geocode
from ..geom import tilenamer

CELL_SIZE_M = 10.0
TILE_SIZE_M = 1000
CELLS_PER_EDGE = int(TILE_SIZE_M / CELL_SIZE_M)  # 100


def add_point_columns(batch: pa.Table, doc_col: str = "doc_id") -> pa.Table:
    """Append x, y, z, classification, is_ground, tile_id, row, col.

    Pure vectorized numpy; the cell arithmetic mirrors
    ``RasterBounds.proj_to_cell`` for the tile-local grid (tile min
    is the 1 km-aligned floor, so ``row = trunc((y - tile_min_n) /
    cell)`` — identical IEEE ops to the DuckDB oracle SQL).
    """
    doc_id = batch.column(doc_col).to_numpy()
    x, y, z, cls, is_ground = geocode(doc_id)
    tile_id = tilenamer.encode(x, y, TILE_SIZE_M)

    tile_min_e = np.floor(x / TILE_SIZE_M) * TILE_SIZE_M
    tile_min_n = np.floor(y / TILE_SIZE_M) * TILE_SIZE_M
    col = ((x - tile_min_e) / CELL_SIZE_M).astype(np.int64)
    row = ((y - tile_min_n) / CELL_SIZE_M).astype(np.int64)

    return (
        batch.append_column("x", pa.array(x, pa.float64()))
        .append_column("y", pa.array(y, pa.float64()))
        .append_column("z", pa.array(z, pa.float64()))
        .append_column("classification", pa.array(cls, pa.uint8()))
        .append_column("is_ground", pa.array(is_ground, pa.bool_()))
        .append_column("tile_id", pa.array(tile_id, pa.string()))
        .append_column("tile_key", pa.array(tile_key_of(x, y), pa.int64()))
        .append_column("row", pa.array(row, pa.int64()))
        .append_column("col", pa.array(col, pa.int64()))
    )


# ---------------------------------------------------- int64 tile key
#
# The string tile name is the USER-facing id, but carrying 4M+ python
# strings through a shuffle + pandas group conversion costs multiple
# seconds per million rows (measured: the string column dominates the
# checkpoint read, the sort payload AND the to_pandas step). The key
# packs the tile's km-grid coordinates bijectively into an int64; the
# name is reconstructed ONCE PER GROUP on the far side of the shuffle.

_TILE_KEY_SHIFT = 20  # e_km fits in 20 bits (envelope max 692 km)


def tile_key_of(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """(n_km << 20) | e_km for the TILE_SIZE_M-aligned floor corner."""
    e_km = np.floor(x / TILE_SIZE_M).astype(np.int64)
    n_km = np.floor(y / TILE_SIZE_M).astype(np.int64)
    return (n_km << _TILE_KEY_SHIFT) | e_km


def tile_key_to_name(key: int) -> str:
    """Reconstruct the string tile name from the packed key (exact:
    encodes the tile's center point)."""
    e_km = int(key) & ((1 << _TILE_KEY_SHIFT) - 1)
    n_km = int(key) >> _TILE_KEY_SHIFT
    return str(
        tilenamer.encode(
            np.array([e_km * TILE_SIZE_M + TILE_SIZE_M / 2]),
            np.array([n_km * TILE_SIZE_M + TILE_SIZE_M / 2]),
            TILE_SIZE_M,
        )[0]
    )


def name_to_tile_key(name: str) -> int:
    """Inverse of :func:`tile_key_to_name` via the tilenamer decode."""
    min_e, min_n, _, _ = tilenamer.decode(name)
    return (int(min_n) // TILE_SIZE_M << _TILE_KEY_SHIFT) | (
        int(min_e) // TILE_SIZE_M
    )


def points_dataset(ds, doc_col: str = "doc_id"):
    """documents/pages Dataset -> points Dataset (no shuffle)."""
    return ds.map_batches(
        lambda b: add_point_columns(b, doc_col), batch_format="pyarrow"
    )


# ------------------------------------------------- S2-keyed shuffle
#
# The north rule's exact phrasing: "a groupby-aggregate shuffle over
# H3/S2 cell keys reproduces LasUtility's km-grid tiling". The work
# area is planar ETRS-TM35FIN, so each km tile maps to a spherical
# point by a fixed linear chart (center meters -> degrees on a small
# patch near 25E 61N — any injective chart works, the key only has
# to CO-LOCATE whole tiles); the shuffle key is the S2 cell of that
# point at S2_BUCKET_LEVEL (coarser than a tile: one S2 cell holds a
# contiguous block of km tiles, preserving Hilbert locality), and the
# per-tile work runs inside each S2 group. Output is bit-identical to
# the direct km-grid groupby (pinned in tests/test_s2.py).

S2_BUCKET_LEVEL = 11  # ~8 km cells on the unit sphere's scale below
_CHART_LON0, _CHART_LAT0 = 25.0, 61.0  # degrees per 100 km, chart origin
_CHART_SCALE = 1.0 / 100_000.0


def s2_bucket_of_tiles(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """km-tile-center coords -> coarse S2 cell key (int64 view)."""
    from ..geom import s2

    e_km = np.floor(x / TILE_SIZE_M) * TILE_SIZE_M + TILE_SIZE_M / 2
    n_km = np.floor(y / TILE_SIZE_M) * TILE_SIZE_M + TILE_SIZE_M / 2
    lon = _CHART_LON0 + e_km * _CHART_SCALE
    lat = _CHART_LAT0 + n_km * _CHART_SCALE
    return s2.lonlat_to_cell(lon, lat, S2_BUCKET_LEVEL).view(np.int64)


def tile_counts_via_s2(points_ds):
    """``voxelize.tile_counts`` re-expressed with the S2 cell as the
    shuffle key: groupby(s2_bucket) moves whole km tiles together
    (Hilbert locality keeps neighboring tiles in one group), then the
    per-tile aggregation happens inside each group — same output,
    different (spherical, hierarchy-capable) partition key."""
    import pandas as pd

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "s2_bucket",
            pa.array(
                s2_bucket_of_tiles(
                    t.column("x").to_numpy(), t.column("y").to_numpy()
                ),
                pa.int64(),
            ),
        )

    def per_tile(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("tile_id", sort=False).size().reset_index(name="n_docs")
        out["n_docs"] = out["n_docs"].astype(np.int64)
        return out

    return (
        points_ds.map_batches(add_bucket, batch_format="pyarrow")
        .select_columns(["s2_bucket", "tile_id"])
        .groupby("s2_bucket")
        .map_groups(per_tile, batch_format="pandas")
    )
