"""Quantile + hash-sample stages (stages/quantiles.py): exact vs
DuckDB quantile_cont, histogram path within its error bound, Lehmer
sample membership recomputable."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from lasutility_ray.stages.quantiles import (
    group_quantiles,
    group_quantiles_hist,
    hash_sample,
)

SF = "/root/testdata/sf0.001"
QS = {"p10": 0.10, "p50": 0.50, "p90": 0.90, "p99": 0.99}


def test_exact_quantiles_match_duckdb(ray_session):
    duckdb = pytest.importorskip("duckdb")
    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    out = (
        group_quantiles(ev, "event_type", "value", QS)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    ref = (
        duckdb.sql(
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
            "quantile_cont(value, 0.10) AS p10, quantile_cont(value, 0.50) AS p50, "
            "quantile_cont(value, 0.90) AS p90, quantile_cont(value, 0.99) AS p99 "
            f"FROM read_parquet('{SF}/events.parquet') GROUP BY event_type "
            "ORDER BY event_type"
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[ref.columns.tolist()], ref, check_dtype=True)


def test_hist_quantiles_within_bound(ray_session):
    # the histogram path estimates the DISCRETE order statistic at
    # rank floor(q*n), within one bin width of it
    n_bins = 512
    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    exact = group_quantiles(ev, "event_type", "value", QS).to_pandas()
    approx = group_quantiles_hist(
        ev, "event_type", "value", QS, n_bins=n_bins
    ).to_pandas()
    merged = exact.merge(approx, on="event_type", suffixes=("_e", "_a"))
    assert (merged["n_e"] == merged["n_a"]).all()
    vals = rd.read_parquet(
        f"{SF}/events.parquet", columns=["event_type", "value"]
    ).to_pandas()
    for et, grp in vals.groupby("event_type"):
        v = np.sort(grp["value"].to_numpy())
        width = (v[-1] - v[0]) / n_bins
        row = merged[merged["event_type"] == et].iloc[0]
        for q, p in QS.items():
            rank = min(int(p * len(v)), len(v) - 1)
            assert abs(row[f"{q}_a"] - v[rank]) <= width + 1e-12, (et, q)


def test_hash_sample_membership_and_determinism(ray_session):
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(10_000), pa.int64())})
    )
    out = hash_sample(docs, "doc_id", 250).to_pandas()
    k = out["doc_id"].to_numpy()
    m = 2_147_483_647
    assert ((k % m) * 48271 % m * 48271 % m < (m * 250) // 1000).all()
    # complement: no kept key outside, i.e. recompute full membership
    all_k = np.arange(10_000)
    want = all_k[(all_k % m) * 48271 % m * 48271 % m < (m * 250) // 1000]
    assert np.array_equal(np.sort(k), want)
    # rate is roughly right (Lehmer is equidistributed enough here)
    assert 0.2 < len(k) / 10_000 < 0.3
    # deterministic on re-run
    again = hash_sample(docs, "doc_id", 250).to_pandas()["doc_id"].to_numpy()
    assert np.array_equal(np.sort(again), np.sort(k))


def test_hash_sample_bad_rate_raises(ray_session):
    docs = rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError):
        hash_sample(docs, "doc_id", 1001)


def test_quantile_bad_prob_raises(ray_session):
    docs = rd.from_arrow(
        pa.table({"g": pa.array([1], pa.int64()), "v": pa.array([1.0])})
    )
    with pytest.raises(ValueError):
        group_quantiles(docs, "g", "v", {"bad": 1.5})


def test_stratified_sample_matches_duckdb(ray_session):
    duckdb = pytest.importorskip("duckdb")
    import __ray_entry__ as entry

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    df = entry.queries()["q_stratified_sample"](sf).to_pandas()
    ref = con.execute(entry.oracle_sql()["q_stratified_sample"]).df()
    cols = sorted(ref.columns)
    pd.testing.assert_frame_equal(
        df[cols].sort_values(cols).reset_index(drop=True),
        ref[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False,
    )
    # exactly 5 per source, and re-running yields the same sample
    assert (df.groupby("source").size() == 5).all()
    df2 = entry.queries()["q_stratified_sample"](sf).to_pandas()
    assert sorted(df2["doc_id"]) == sorted(df["doc_id"])
