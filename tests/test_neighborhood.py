"""Distributed neighborhood-peak query (stages/neighborhood.py, J6)
vs a DuckDB oracle and the per-tile reference kernel."""

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

from lasutility_ray.corpus.geocode import sql_exprs
from lasutility_ray.stages.neighborhood import neighborhood_peaks_ds
from lasutility_ray.stages.tiling import points_dataset

SF_DIR = "/root/testdata/sf0.01"


def _oracle(radius: int, lo: int, hi: int) -> pd.DataFrame:
    e = sql_exprs("doc_id")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    return con.execute(
        f"WITH pts AS (SELECT doc_id, {e['x']} AS x, {e['y']} AS y, "
        f"{e['z']} AS z, CAST({e['classification']} AS INT) AS c FROM documents), "
        "cls AS (SELECT CAST(floor(y / 10.0) AS BIGINT) AS gr, "
        "CAST(floor(x / 10.0) AS BIGINT) AS gc, max(z) AS best FROM pts "
        f"WHERE c BETWEEN {lo} AND {hi} GROUP BY 1, 2) "
        "SELECT a.gr, a.gc, a.best FROM cls a WHERE NOT EXISTS ("
        f"SELECT 1 FROM cls b WHERE b.gr BETWEEN a.gr - {radius} AND a.gr + {radius} "
        f"AND b.gc BETWEEN a.gc - {radius} AND a.gc + {radius} "
        "AND NOT (b.gr = a.gr AND b.gc = a.gc) AND b.best >= a.best) "
        "ORDER BY gr, gc"
    ).df()


def test_peaks_match_oracle(ray_session):
    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    pts = points_dataset(docs)
    got = (
        neighborhood_peaks_ds(pts, lo=3, hi=5, radius=2)
        .to_pandas()
        .sort_values(["gr", "gc"])
        .reset_index(drop=True)
    )
    want = _oracle(2, 3, 5).reset_index(drop=True)
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_peaks_cross_tile_halo(ray_session):
    """A taller point in the adjacent tile within the radius must
    disqualify a would-be peak near the tile edge."""
    import pyarrow as pa

    # two points straddling a 1 km tile border at x = 351000:
    # peak candidate at (350995, ...), taller neighbor at (351004, ...)
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "x": pa.array([350995.0, 351004.0]),
            "y": pa.array([6700505.0, 6700505.0]),
            "z": pa.array([10.0, 20.0]),
            "classification": pa.array([4, 4], pa.uint8()),
            "is_ground": pa.array([False, False]),
            "tile_id": pa.array(["a", "b"]),  # ignored by the stage
        }
    )
    ds = rd.from_arrow(t)
    out = neighborhood_peaks_ds(ds, lo=3, hi=5, radius=2).to_pandas()
    # only the taller point's cell is a peak; the shorter one is
    # suppressed across the tile boundary by the halo exchange
    assert len(out) == 1
    assert out["best"].iloc[0] == 20.0


def test_radius_validation(ray_session):
    import pytest

    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    pts = points_dataset(docs)
    with pytest.raises(ValueError):
        neighborhood_peaks_ds(pts, 3, 5, radius=0)
    with pytest.raises(ValueError):
        neighborhood_peaks_ds(pts, 3, 5, radius=101)
