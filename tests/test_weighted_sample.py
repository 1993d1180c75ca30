"""Efraimidis-Spirakis weighted sampling (quantiles.weighted_sample):
SQL-oracle exactness, statistical weighting property, and
partitioning determinism."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import __ray_entry__ as E
from lasutility_ray.stages.quantiles import weighted_sample

SF = "/root/testdata/sf0.001"


def test_matches_oracle(ray_session):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    got = E.queries()["q_weighted_sample"](SF).to_pandas()
    ref = con.execute(E.oracle_sql()["q_weighted_sample"]).df()
    cols = sorted(got.columns)
    pd.testing.assert_frame_equal(
        got[cols].sort_values("rank").reset_index(drop=True),
        ref[cols].sort_values("rank").reset_index(drop=True),
    )


def test_weighting_property(ray_session):
    """Across many disjoint key blocks, heavy rows win far more often
    than light rows (w 100:1 -> selection should be lopsided)."""
    import ray.data as rd

    n = 4000
    w = np.where(np.arange(n) % 2 == 0, 100, 1).astype(np.int64)
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(n), pa.int64()), "w": pa.array(w)})
    )
    out = weighted_sample(ds, "doc_id", "w", k=200).to_pandas()
    heavy = (out["doc_id"] % 2 == 0).sum()
    assert heavy > 180  # ~99% expected; far above the 50% null


def test_partitioning_determinism(ray_session):
    import ray.data as rd

    n = 3000
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "w": pa.array(np.arange(1, n + 1, dtype=np.int64)),
        }
    )
    a = weighted_sample(rd.from_arrow(t), "doc_id", "w", k=50).to_pandas()
    b = weighted_sample(rd.from_arrow(t).repartition(11), "doc_id", "w", k=50).to_pandas()
    cols = sorted(a.columns)
    pd.testing.assert_frame_equal(
        a[cols].sort_values("rank").reset_index(drop=True),
        b[cols].sort_values("rank").reset_index(drop=True),
    )


def test_zero_weight_rows_excluded(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "w": pa.array([0, 5, 0, 7], pa.int64()),
        }
    )
    out = weighted_sample(rd.from_arrow(t), "doc_id", "w", k=10).to_pandas()
    assert set(out["doc_id"]) == {2, 4}
