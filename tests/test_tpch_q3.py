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


def test_left_outer_join_matches_oracle(ray_session):
    """q_orders_customer_left: every customer survives; NULL order
    columns for customers with no qualifying order."""
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    got = E.queries()["q_orders_customer_left"](SF).to_pandas()
    ref = con.execute(E.oracle_sql()["q_orders_customer_left"]).df()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = ref[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    n_cust = con.execute("SELECT count(DISTINCT c_custkey) FROM customer").fetchone()[0]
    assert got["c_custkey"].nunique() == n_cust  # no customer dropped
