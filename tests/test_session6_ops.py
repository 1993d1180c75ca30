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


def test_skyline_orders_matches_duckdb(ray_session):
    import __ray_entry__ as entry

    con = _oracle_con(tables=("orders",))
    df = entry.queries()["q_skyline_orders"](SF).to_pandas()
    ref = con.execute(entry.oracle_sql()["q_skyline_orders"]).df()
    pd.testing.assert_frame_equal(_sorted(df), _sorted(ref), check_dtype=False)
    assert len(df) >= 2  # a real front, not one point


def test_skyline_partition_invariance(ray_session):
    """skyline(T) == skyline(union of per-block skylines) at ANY
    partitioning: repartitioned input gives the identical front."""
    import ray.data as rd

    from lasutility_ray.stages.skyline import skyline_orders

    ds = rd.read_parquet(
        f"{SF_S}/orders.parquet", columns=["o_totalprice", "o_orderdate"]
    )
    a = _sorted(skyline_orders(ds).to_pandas())
    b = _sorted(skyline_orders(ds.repartition(13)).to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_skyline_dominance_holds(ray_session):
    """No returned point dominates another; every input point is
    dominated-or-equal by some skyline point (brute-force audit)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from lasutility_ray.stages.skyline import skyline_orders

    t = pq.read_table(
        f"{SF_S}/orders.parquet", columns=["o_totalprice", "o_orderdate"]
    )
    p = np.round(t.column("o_totalprice").to_numpy() * 100).astype(np.int64)
    d = (
        t.column("o_orderdate")
        .to_numpy(zero_copy_only=False)
        .astype("datetime64[us]")
        .astype(np.int64)
    )
    sk = skyline_orders(
        rd.read_parquet(
            f"{SF_S}/orders.parquet", columns=["o_totalprice", "o_orderdate"]
        )
    ).to_pandas()
    sp = sk["price_cents"].to_numpy()
    sd = sk["date_us"].to_numpy()
    for i in range(len(sp)):  # pairwise non-dominance within the front
        dom = (sp >= sp[i]) & (sd <= sd[i]) & ((sp > sp[i]) | (sd < sd[i]))
        assert not dom.any()
    # every input point is dominated by (or equal to) a front point
    for i in range(0, len(p), max(1, len(p) // 200)):
        assert ((sp >= p[i]) & (sd <= d[i])).any()


def test_ed1_hosts_matches_duckdb(ray_session):
    import __ray_entry__ as entry

    con = _oracle_con(tables=("documents",))
    df = entry.queries()["q_ed1_hosts"](SF).to_pandas()
    ref = con.execute(entry.oracle_sql()["q_ed1_hosts"]).df()
    pd.testing.assert_frame_equal(_sorted(df), _sorted(ref), check_dtype=False)
    assert len(df) > 0


def test_ed1_verify_kernel_exact():
    """The vectorized verifier == python Levenshtein on adversarial
    pairs: substitution, deletion at head/middle/tail, transposition
    (distance 2 — must REJECT), prefix pairs, equal strings."""
    from lasutility_ray.stages.editdist import _ed1_verify

    def lev(a, b):
        m, n = len(a), len(b)
        dp = list(range(n + 1))
        for i in range(1, m + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, n + 1):
                cur = dp[j]
                dp[j] = min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
                )
                prev = cur
        return dp[n]

    # NOTE: identical strings are OUT of the kernel's contract —
    # ed1_join filters wa != wb before verifying (the vocabulary is
    # distinct), so they are deliberately absent here.
    pairs = [
        ("site1", "site2"), ("site1", "site12"), ("site1", "ite1"),
        ("abcd", "abdc"), ("ab", "ba"),
        ("a", "ab"), ("abc", "a"), ("xabc", "abc"), ("abc", "abx"),
        ("site123", "site213"), ("s", "t"), ("aaaa", "aaa"),
        ("aaab", "aaba"), ("host", "hosts"), ("hello", "hallo"),
    ]
    wa = pd.Series([a for a, _ in pairs])
    wb = pd.Series([b for _, b in pairs])
    got = _ed1_verify(wa, wb)
    want = np.array([lev(a, b) <= 1 for a, b in pairs])
    assert (got == want).all(), list(zip(pairs, got, want))


def test_envelope_join_matches_duckdb(ray_session):
    import __ray_entry__ as entry

    con = _oracle_con(tables=("documents",))
    df = entry.queries()["q_envelope_join"](SF).to_pandas()
    ref = con.execute(entry.oracle_sql()["q_envelope_join"]).df()
    pd.testing.assert_frame_equal(_sorted(df), _sorted(ref), check_dtype=False)
    assert len(df) > 0


def test_envelope_cross_cell_pairs_once(ray_session):
    """Rects spanning multiple grid cells are reported exactly once
    (the PBSM reference-point rule), including a pair whose overlap
    region itself straddles a cell boundary."""
    import ray.data as rd

    from lasutility_ray.stages.envelope import GRID_M, doc_rects, envelope_self_join

    # find two doc ids whose rects overlap AND whose cell windows differ
    ids = np.arange(0, 4000, dtype=np.int64)
    x0, y0, x1, y1 = doc_rects(ids)
    hits = []
    for i in range(len(ids)):
        ok = (
            (x0 <= x1[i]) & (x0[i] <= x1) & (y0 <= y1[i]) & (y0[i] <= y1)
        )
        ok[i] = False
        for j in np.flatnonzero(ok):
            if j > i and (x0[i] // GRID_M != x0[j] // GRID_M
                          or y0[i] // GRID_M != y0[j] // GRID_M):
                hits.append((i, j))
    assert hits, "fixture must contain cross-cell overlaps"
    sub = sorted({i for ij in hits for i in ij})
    out = envelope_self_join(
        rd.from_pandas(pd.DataFrame({"doc_id": np.array(sub, np.int64)}))
    ).to_pandas()
    # each emitted pair exactly once
    assert not out.duplicated(["a", "b"]).any()
    got = set(zip(out["a"], out["b"]))
    want = {(int(ids[i]), int(ids[j])) for i, j in hits
            if ids[i] in sub and ids[j] in sub}
    assert want <= got


def test_triangle_counts_matches_duckdb(ray_session):
    import __ray_entry__ as entry

    con = _oracle_con(tables=("documents",))
    df = entry.queries()["q_triangle_counts"](SF).to_pandas()
    ref = con.execute(entry.oracle_sql()["q_triangle_counts"]).df()
    pd.testing.assert_frame_equal(_sorted(df), _sorted(ref), check_dtype=False)
    # each triangle credits 3 hosts -> total divisible by 3
    assert df["n_triangles"].sum() % 3 == 0 and len(df) > 0


def test_triangle_counts_dense_graph(ray_session):
    """Denser substrate (20k synthetic doc ids -> all 1000 hosts,
    many triangles) so the wedge/close machinery is exercised well
    past the sparse 500-doc fixture; also pins partition invariance."""
    import duckdb
    import ray.data as rd

    from lasutility_ray.stages.graph import triangle_counts, triangle_counts_sql

    docs = pd.DataFrame({"doc_id": np.arange(20000, dtype=np.int64)})
    con = duckdb.connect()
    con.register("documents", docs)
    ref = con.execute(triangle_counts_sql()).df()
    assert ref["n_triangles"].sum() // 3 > 100  # genuinely dense
    out = triangle_counts(rd.from_pandas(docs).repartition(7)).to_pandas()
    pd.testing.assert_frame_equal(_sorted(out), _sorted(ref), check_dtype=False)
