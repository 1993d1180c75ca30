"""Session-7 operators: time-bounded funnel conversion, PMI/lift
collocation mining — value-exact vs DuckDB plus kernel edge pins."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"


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


def test_funnel_matches_duckdb_with_dropoff(ray_session):
    import __ray_entry__ as entry

    con = _oracle_con()
    df = entry.queries()["q_funnel_conversion"](SF).to_pandas()
    ref = con.execute(entry.oracle_sql()["q_funnel_conversion"]).df()
    pd.testing.assert_frame_equal(_sorted(df), _sorted(ref), check_dtype=False)
    ordered = df.sort_values("stage")["n_users"].tolist()
    # real drop-off at every hop, and monotone non-increasing
    assert ordered[0] > ordered[1] > ordered[2] > 0


def test_funnel_window_boundaries(ray_session):
    """Strict lower bound (ts == t_prev does NOT count), inclusive
    upper bound (ts == t_prev + window DOES), first-touch anchoring
    (a later cheaper step-1 can't re-anchor the window)."""
    import ray.data as rd

    from lasutility_ray.stages.funnel import funnel_stages

    base = np.datetime64("2024-01-01T00:00:00", "us")
    s = 1_000_000  # one second in us
    rows = [
        # u1: click exactly AT the window edge (inclusive) -> converts
        (1, "view", 0), (1, "click", 10 * s),
        # u2: click exactly at view's ts -> strict '>' rejects it
        (2, "view", 0), (2, "click", 0),
        # u3: click after the window -> rejected
        (3, "view", 0), (3, "click", 11 * s),
        # u4: SECOND view is closer to the click, but first-touch
        # anchors at the first view -> click is outside -> rejected
        (4, "view", 0), (4, "view", 20 * s), (4, "click", 25 * s),
    ]
    df = pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "event_type": [r[1] for r in rows],
            "ts": [base + r[2] for r in rows],
        }
    )
    out = (
        funnel_stages(
            rd.from_pandas(df), steps=("view", "click"), window_s=10
        )
        .to_pandas()
        .sort_values("stage")
    )
    assert out["n_users"].tolist() == [4, 1]


def test_collocations_match_duckdb(ray_session):
    import __ray_entry__ as entry

    con = _oracle_con(tables=("documents",))
    df = entry.queries()["q_collocations"](SF).to_pandas()
    ref = con.execute(entry.oracle_sql()["q_collocations"]).df()
    pd.testing.assert_frame_equal(_sorted(df), _sorted(ref), check_dtype=False)
    assert len(df) == 25 and (df["c_ab"] >= 5).all()


def test_collocations_hand_corpus(ray_session):
    """Tiny corpus where lift is computable by hand; also pins that
    pairs never cross document boundaries."""
    import ray.data as rd

    from lasutility_ray.stages.collocations import collocations

    # "x y" always together (max lift); "a b" sometimes; "b a" never
    docs = pd.DataFrame(
        {
            "text": (
                ["x y"] * 5          # c(x,y)=5
                + ["a b c"] * 5      # c(a,b)=5, c(b,c)=5
                + ["a c b"] * 5      # c(a,c)=5, c(c,b)=5
                # boundary guard: 'y' ends one doc, 'x' starts this one;
                # (y,x) must NOT appear as a pair
                + ["x z y z"] * 5    # c(x,z)=5, c(z,y)=5, c(y,z)=5
            )
        }
    )
    out = collocations(
        rd.from_pandas(docs).repartition(3), k=100, min_count=5
    ).to_pandas()
    pairs = set(zip(out["a"], out["b"]))
    assert ("y", "x") not in pairs and ("b", "a") not in pairs
    # hand lift for (x, y): N=40 pairs total, c_ab=5,
    # c_a = pairs starting with x = 10, c_b = pairs ending with y = 10
    row = out[(out.a == "x") & (out.b == "y")].iloc[0]
    assert row["lift_e6"] == (5 * 40 * 1_000_000) // (10 * 10)
    # (x, z): c_ab=5, c_a(x..)=10, c_b(..z)=10 -> same lift
    row2 = out[(out.a == "x") & (out.b == "z")].iloc[0]
    assert row2["lift_e6"] == row["lift_e6"]
