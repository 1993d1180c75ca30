"""Session-5 operators: window functions, ROLLUP, Gopher rules,
token-budget selection (stages/windowfn.py, relational.rollup_agg,
stages/gopher.py, stages/selection.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

SF = "/root/testdata/sf0.001"


def _oracle_con(tables=("documents",)):
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _sorted(df, cols=None):
    cols = cols or sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


# ---------------------------------------------------------------- windowfn


def test_windowfn_matches_duckdb(ray_session):
    import __ray_entry__ as entry

    con = _oracle_con(("events",))
    df = entry.queries()["q_window_functions"](SF).to_pandas()
    ref = con.execute(entry.oracle_sql()["q_window_functions"]).df()
    a, b = _sorted(df), _sorted(ref)
    for c in a.columns:
        if "int" in str(a[c].dtype).lower():
            a[c] = a[c].astype("Int64")
        if "int" in str(b[c].dtype).lower():
            b[c] = b[c].astype("Int64")
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_windowfn_edges(ray_session):
    """Tie timestamps break on event_id; single-row users lag NULL;
    cum restarts per user."""
    from lasutility_ray.stages.windowfn import partitioned_window

    ts = pa.array(
        np.array([1000, 1000, 2000, 500], dtype="int64"), pa.timestamp("us")
    )
    ev = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([2, 1, 3, 9], pa.int64()),
                "user_id": pa.array([7, 7, 7, 8], pa.int64()),
                "ts": ts,
                "value": pa.array([1.25, 2.50, 4.00, 9.99]),
            }
        )
    )
    out = partitioned_window(ev).to_pandas().sort_values("event_id")
    out = out.set_index("event_id")
    # user 7 order: (1000us, id1), (1000us, id2), (2000us, id3)
    assert out.loc[1, "row_num"] == 1 and pd.isna(out.loc[1, "prev_value_cents"])
    assert out.loc[2, "row_num"] == 2 and out.loc[2, "prev_value_cents"] == 250
    assert out.loc[3, "row_num"] == 3 and out.loc[3, "prev_value_cents"] == 125
    assert out.loc[3, "cum_value_cents"] == 250 + 125 + 400
    assert (out.loc[[1, 2, 3], "user_n_events"] == 3).all()
    # user 8: singleton partition
    assert out.loc[9, "row_num"] == 1 and pd.isna(out.loc[9, "prev_value_cents"])
    assert out.loc[9, "cum_value_cents"] == 999 and out.loc[9, "user_n_events"] == 1


# ---------------------------------------------------------------- rollup


def test_rollup_matches_duckdb(ray_session):
    import __ray_entry__ as entry

    con = _oracle_con(("lineitem",))
    df = entry.queries()["q_rollup_agg"](SF).to_pandas()
    ref = con.execute(entry.oracle_sql()["q_rollup_agg"]).df()
    a = _sorted(df.fillna({"l_returnflag": "~", "l_linestatus": "~"}))
    b = _sorted(ref.fillna({"l_returnflag": "~", "l_linestatus": "~"}))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_rollup_levels(ray_session):
    """Grand total row equals the sum of the fine level; per-flag rows
    equal their fine-level partials."""
    from lasutility_ray.stages.relational import rollup_agg

    li = rd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )
    out = rollup_agg(li).to_pandas()
    fine = out[out.l_linestatus.notna() & out.l_returnflag.notna()]
    lvl1 = out[out.l_linestatus.isna() & out.l_returnflag.notna()]
    lvl0 = out[out.l_returnflag.isna()]
    assert len(lvl0) == 1 and lvl0.l_linestatus.isna().all()
    assert lvl0.sum_qty.iloc[0] == fine.sum_qty.sum()
    assert lvl0.n_rows.iloc[0] == fine.n_rows.sum()
    for flag, grp in fine.groupby("l_returnflag"):
        row = lvl1[lvl1.l_returnflag == flag]
        assert row.sum_qty.iloc[0] == grp.sum_qty.sum()
        assert row.n_rows.iloc[0] == grp.n_rows.sum()


# ---------------------------------------------------------------- gopher


def test_gopher_matches_duckdb(ray_session):
    import __ray_entry__ as entry

    con = _oracle_con()
    df = entry.queries()["q_gopher_rules"](SF).to_pandas()
    ref = con.execute(entry.oracle_sql()["q_gopher_rules"]).df()
    pd.testing.assert_frame_equal(_sorted(df), _sorted(ref), check_dtype=False)
    # the keep flag must split the fixture (not a constant rule)
    assert 0 < df["keep"].sum() < len(df)


def test_gopher_adversarial_parity(ray_session):
    """Engine vs DuckDB on counter edge cases: overlapping ellipses,
    stop words inside words (into != to), empty text, tabs/newlines,
    pure-symbol words."""
    duckdb = pytest.importorskip("duckdb")
    from lasutility_ray.stages.gopher import gopher_quality, gopher_quality_sql

    texts = [
        "",
        "the...the...the",
        "ellipsis....... seven dots",
        "Into the woods to be or not",
        "a  b\t c\nd",
        "#### #tag the end",
        "12345 67890 !!!",
        ("word " * 40 + "the of and that have with be to").strip(),
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = gopher_quality(rd.from_arrow(t)).to_pandas()
    con = duckdb.connect()
    con.register("edge_docs", t)
    ref = con.execute(gopher_quality_sql("edge_docs")).df()
    pd.testing.assert_frame_equal(_sorted(out), _sorted(ref), check_dtype=False)


# ---------------------------------------------------------------- budget


def test_budget_select_matches_duckdb(ray_session):
    import __ray_entry__ as entry

    con = _oracle_con()
    df = entry.queries()["q_budget_select"](SF).to_pandas()
    ref = con.execute(entry.oracle_sql()["q_budget_select"]).df()
    pd.testing.assert_frame_equal(_sorted(df), _sorted(ref), check_dtype=False)
    assert 0 < df["selected"].sum() < len(df)


def _brute_select(docs: pd.DataFrame, budget: int) -> pd.DataFrame:
    """Independent oracle: literal running-sum over the sorted frame."""
    d = docs.sort_values(["score", "doc_id"], ascending=[False, True]).copy()
    d["cum"] = d["n_tok"].cumsum()
    d["selected"] = (d["cum"] <= budget).astype("int64")
    return d[["doc_id", "selected"]].sort_values("doc_id").reset_index(drop=True)


def _docs_from_words(doc_ids, word_counts, stop_counts):
    """Synthesize texts with exact n_words and stop-hit counts."""
    texts = []
    for nw, ns in zip(word_counts, stop_counts):
        words = ["the"] * ns + ["zzz"] * (nw - ns)
        texts.append(" ".join(words))
    return pd.DataFrame({"doc_id": doc_ids, "text": texts})


def test_budget_select_boundary_exact(ray_session):
    """Budget landing exactly on a score-partition boundary: the next
    score's docs are all dropped (no off-by-one), and doc_id order
    breaks ties inside the boundary score across id blocks."""
    from lasutility_ray.stages.selection import budget_select

    # score 1000 docs: 10+10 tokens; score 0 docs: 5+5 tokens
    docs = _docs_from_words(
        doc_ids=[1, 70_000, 140_000, 2],
        word_counts=[10, 10, 5, 5],
        stop_counts=[10, 10, 0, 0],
    )
    ds = rd.from_pandas(docs)
    out = budget_select(ds, budget=20).to_pandas().sort_values("doc_id")
    assert out.set_index("doc_id")["selected"].to_dict() == {
        1: 1,
        70_000: 1,
        2: 0,
        140_000: 0,
    }
    # budget 25: one score-0 doc fits; doc_id 2 wins over 140000
    out = budget_select(ds, budget=25).to_pandas().sort_values("doc_id")
    assert out.set_index("doc_id")["selected"].to_dict() == {
        1: 1,
        70_000: 1,
        2: 1,
        140_000: 0,
    }


def test_budget_select_multiblock_prefix(ray_session):
    """Boundary docs spanning multiple doc_id blocks (65536) exercise
    the two-level prefix sum; result equals the brute running sum."""
    from lasutility_ray.stages.selection import budget_select

    rng = np.random.RandomState(7)
    n = 50
    ids = (rng.choice(np.arange(5 * 65536), size=n, replace=False)).astype(int)
    nw = rng.randint(1, 30, size=n)
    # every doc same score (all stop words) -> single boundary score
    docs = _docs_from_words(ids.tolist(), nw.tolist(), nw.tolist())
    budget = int(nw.sum() // 3)
    out = (
        budget_select(rd.from_pandas(docs), budget=budget)
        .to_pandas()
        .sort_values("doc_id")[["doc_id", "selected"]]
        .reset_index(drop=True)
    )
    brute = _brute_select(
        pd.DataFrame({"doc_id": ids, "score": 1000, "n_tok": nw}), budget
    )
    pd.testing.assert_frame_equal(out, brute, check_dtype=False)


def test_budget_select_fast_and_distributed_paths_identical(ray_session):
    """The one-task boundary fast path and the forced two-level
    distributed prefix sum produce identical selections."""
    from lasutility_ray.stages.selection import budget_select

    rng = np.random.RandomState(11)
    n = 60
    ids = rng.choice(np.arange(4 * 65536), size=n, replace=False).astype(int)
    nw = rng.randint(1, 25, size=n)
    docs = _docs_from_words(ids.tolist(), nw.tolist(), nw.tolist())
    budget = int(nw.sum() // 3)
    ds = rd.from_pandas(docs)
    fast = (
        budget_select(ds, budget=budget)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    dist = (
        budget_select(ds, budget=budget, fast_max=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, dist)


def test_topk_per_group_matches_duckdb(ray_session):
    import __ray_entry__ as entry

    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    df = entry.queries()["q_topk_orders_per_cust"](SF).to_pandas()
    ref = con.execute(entry.oracle_sql()["q_topk_orders_per_cust"]).df()
    pd.testing.assert_frame_equal(_sorted(df), _sorted(ref), check_dtype=False)


def test_cube_agg_matches_duckdb(ray_session):
    import __ray_entry__ as entry

    con = _oracle_con(("lineitem",))
    df = entry.queries()["q_cube_agg"](SF).to_pandas()
    ref = con.execute(entry.oracle_sql()["q_cube_agg"]).df()
    a = _sorted(df.fillna({"l_returnflag": "~", "l_linestatus": "~"}))
    b = _sorted(ref.fillna({"l_returnflag": "~", "l_linestatus": "~"}))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # cube = rollup + the status-only level
    roll = entry.queries()["q_rollup_agg"](SF).to_pandas()
    assert len(df) == len(roll) + df["l_returnflag"].isna().sum() - 1
