"""Session-6 operators: ranking window functions, interval merge,
per-group mode, skyline, edit-distance join, triangle count,
envelope join — each pinned value-exact vs its DuckDB oracle at
sf0.001/sf0.01 plus targeted edge-case pins."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"
SF_S = "/root/testdata/sf0.001"


def _oracle_con(tables=("events",), sf=SF):
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con


def _sorted(df, cols=None):
    cols = cols or sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_ranking_window_matches_duckdb(ray_session):
    import __ray_entry__ as entry

    con = _oracle_con()
    df = entry.queries()["q_ranking_window"](SF).to_pandas()
    ref = con.execute(entry.oracle_sql()["q_ranking_window"]).df()
    pd.testing.assert_frame_equal(_sorted(df), _sorted(ref), check_dtype=False)
    # dense_rank must actually diverge from row_number somewhere
    # (cents ties exist), and ntile must cover 1..4
    assert df["ntile"].min() == 1 and df["ntile"].max() == 4
    assert (df["pct_rank"] == 0.0).any()


def test_ntile_ansi_split_small_partitions(ray_session):
    """n=6, k=4 -> tiles sized 2,2,1,1; n=3 -> 1,1,1 (ANSI)."""
    import ray.data as rd

    from lasutility_ray.stages.windowfn import ranking_window

    rows = []
    for uid, n in ((1, 6), (2, 3)):
        for i in range(n):
            rows.append(
                {
                    "event_id": uid * 100 + i,
                    "user_id": uid,
                    "ts": np.datetime64("2024-01-01", "us") + i * 1000000,
                    "value": 1.0,
                }
            )
    out = (
        ranking_window(rd.from_pandas(pd.DataFrame(rows)))
        .to_pandas()
        .sort_values("event_id")
    )
    assert out[out.user_id == 1]["ntile"].tolist() == [1, 1, 2, 2, 3, 4]
    assert out[out.user_id == 2]["ntile"].tolist() == [1, 2, 3]
    assert out[out.user_id == 2]["pct_rank"].tolist() == [0.0, 0.5, 1.0]


def test_merge_intervals_matches_duckdb(ray_session):
    import __ray_entry__ as entry

    con = _oracle_con()
    df = entry.queries()["q_merge_intervals"](SF).to_pandas()
    ref = con.execute(entry.oracle_sql()["q_merge_intervals"]).df()
    pd.testing.assert_frame_equal(_sorted(df), _sorted(ref), check_dtype=False)
    # merging must actually happen (fewer islands than events)
    n_events = con.execute("SELECT count(*) FROM events").fetchone()[0]
    assert len(df) < n_events


def test_merge_intervals_touching_and_contained():
    """Kernel edge cases: touching intervals merge (half-open),
    contained intervals collapse, disjoint stay separate."""
    import ray.data as rd

    from lasutility_ray.stages.temporal import merge_intervals

    base = np.datetime64("2024-01-01T00:00:00", "us")
    # dur = (event_id % 300 + 30) s
    rows = pd.DataFrame(
        {
            # u1: [0,30) [30,61) touch/overlap -> one island; [200,231) separate
            # u2: [0,130) contains [10,41)
            "event_id": [0, 1, 1, 100, 1],
            "user_id": [1, 1, 1, 2, 2],
            "ts": [
                base,
                base + 30_000_000,
                base + 200_000_000,
                base,
                base + 10_000_000,
            ],
        }
    )
    out = (
        merge_intervals(rd.from_pandas(rows))
        .to_pandas()
        .sort_values(["user_id", "start_us"])
        .reset_index(drop=True)
    )
    b = base.astype(np.int64)
    assert out.iloc[0].tolist() == [1, b, b + 61_000_000, 2]
    assert out.iloc[1].tolist() == [1, b + 200_000_000, b + 231_000_000, 1]
    assert out.iloc[2].tolist() == [2, b, b + 130_000_000, 2]
    assert len(out) == 3


def test_mode_per_user_matches_duckdb(ray_session):
    import __ray_entry__ as entry

    con = _oracle_con()
    df = entry.queries()["q_mode_per_user"](SF).to_pandas()
    ref = con.execute(entry.oracle_sql()["q_mode_per_user"]).df()
    pd.testing.assert_frame_equal(_sorted(df), _sorted(ref), check_dtype=False)


def test_mode_tie_breaks_to_smallest_value(ray_session):
    import ray.data as rd

    from lasutility_ray.stages.relational import mode_per_group

    df = pd.DataFrame(
        {"user_id": [1, 1, 1, 1], "event_type": ["b", "b", "a", "a"]}
    )
    out = mode_per_group(rd.from_pandas(df), "user_id", "event_type").to_pandas()
    assert out["mode_event_type"].tolist() == ["a"]
    assert out["mode_count"].tolist() == [2]
