"""Session-11 operators: exact sliding-window distinct users via
interval expansion — value-exact vs DuckDB plus a hand-built pin of
the window cover/clamp semantics."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

SF = "/root/testdata/sf0.01"


def _oracle_con(tables=("documents",), sf=SF):
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


def _match(name, tables=("documents",)):
    import __ray_entry__ as entry

    con = _oracle_con(tables=tables)
    df = entry.queries()[name](SF).to_pandas()
    ref = con.execute(entry.oracle_sql()[name]).df()
    a, b = _sorted(df), _sorted(ref)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert [str(t) for t in a.dtypes] == [str(t) for t in b.dtypes]
    return df


# ------------------------------------------------- sliding distinct


def test_sliding_distinct_matches_duckdb(ray_session):
    df = _match("q_sliding_distinct", tables=("events",))
    assert len(df) > 24  # corpus spans more than one window
    # trailing windows accumulate: some hour must see more users than
    # any single hour contributes (otherwise the window does nothing)
    assert df["n_users"].max() > 0


def test_sliding_distinct_hand_window(ray_session):
    from lasutility_ray.stages.slidingdistinct import sliding_distinct_users

    # user 1 active at hours 0 and 30; user 2 at hour 29 only.
    # 24h trailing windows (clamped to max hour 30):
    #   hours 0..23  -> {u1}            = 1
    #   hours 24..28 -> {}              (no rows emitted)
    #   hour  29     -> {u2}            = 1
    #   hour  30     -> {u1, u2}        = 2
    hr = np.array([0, 30, 29], dtype=np.int64)
    ev = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 2], dtype=np.int64),
            "ts": pd.to_datetime(hr * 3600, unit="s"),
        }
    )
    out = (
        sliding_distinct_users(rd.from_pandas(ev))
        .to_pandas()
        .sort_values("hr")
        .reset_index(drop=True)
    )
    got = dict(zip(out["hr"].astype(int), out["n_users"].astype(int)))
    expect = {h: 1 for h in range(24)}
    expect[29] = 1
    expect[30] = 2
    assert got == expect


def test_sliding_distinct_dedups_within_hour(ray_session):
    from lasutility_ray.stages.slidingdistinct import sliding_distinct_users

    # same user, 3 events inside one hour -> still 1 distinct user
    ev = pd.DataFrame(
        {
            "user_id": np.array([7, 7, 7], dtype=np.int64),
            "ts": pd.to_datetime([10, 600, 3599], unit="s"),
        }
    )
    out = sliding_distinct_users(rd.from_pandas(ev)).to_pandas()
    assert (out["n_users"] == 1).all()
    assert len(out) == 1  # clamped to the single corpus hour


# --------------------------------------------------- similar hosts


def test_similar_hosts_matches_duckdb(ray_session):
    df = _match("q_similar_hosts")
    assert len(df) > 0  # planted near-dup pairs surface at host level
    assert (df["jaccard_e6"] >= 800_000).all()
    assert (df["host_a"] < df["host_b"]).all()


def test_similar_hosts_unions_pages_per_host(ray_session):
    from lasutility_ray.stages.hostsim import similar_hosts

    # host A publishes two pages whose CONCATENATED shingle sets equal
    # host B's single page -> pair only exists if vocab is the UNION
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    pages = pd.DataFrame(
        {
            "url": [
                "https://a.example/1",
                "https://a.example/2",
                "https://b.example/1",
            ],
            "text": [base, base + " lambda mu nu xi", base + " lambda mu nu xi"],
        }
    )
    out = similar_hosts(
        rd.from_pandas(pages), threshold_e6=900_000
    ).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["host_a"] == "a.example"
    assert out.iloc[0]["host_b"] == "b.example"
    assert out.iloc[0]["jaccard_e6"] == 1_000_000


def test_similar_hosts_threshold_excludes(ray_session):
    from lasutility_ray.stages.hostsim import similar_hosts

    pages = pd.DataFrame(
        {
            "url": ["https://a.example/1", "https://b.example/1"],
            "text": [
                "one two three four five six seven eight nine ten",
                "one two three four five ALPHA BETA GAMMA DELTA EPSILON",
            ],
        }
    )
    out = similar_hosts(rd.from_pandas(pages), threshold_e6=800_000).to_pandas()
    assert len(out) == 0  # J ~ 3/13 well below 0.8


# ------------------------------------------------------- watersheds


def test_watersheds_match_duckdb(ray_session):
    df = _match("q_watersheds")
    assert len(df) > 0
    # pits label themselves and a basin's size equals its member count
    pits = df[(df["ci"] == df["bci"]) & (df["cj"] == df["bcj"])]
    assert len(pits) == df.groupby(["bci", "bcj"]).ngroups
    sizes = df.groupby(["bci", "bcj"]).size()
    for (bci, bcj), n in sizes.items():
        assert (
            df[(df["bci"] == bci) & (df["bcj"] == bcj)]["basin_n"] == n
        ).all()


def test_watersheds_distributed_equals_fast_path(ray_session):
    from lasutility_ray.stages.watershed import watershed_labels

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    fast = (
        watershed_labels(docs)
        .to_pandas()
        .sort_values(["ci", "cj"])
        .reset_index(drop=True)
    )
    dist = (
        watershed_labels(docs, distributed=True)
        .to_pandas()
        .sort_values(["ci", "cj"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, dist, check_dtype=False)


def test_watershed_pointer_doubling_chain():
    from lasutility_ray.stages.watershed import _label_frame

    # strictly descending staircase: every cell drains to the last
    zs = [90_000, 80_000, 70_000, 60_000, 50_000]
    df = pd.DataFrame(
        {
            "ci": np.arange(5, dtype=np.int64),
            "cj": np.zeros(5, dtype=np.int64),
            "z_cm": np.array(zs, dtype=np.int64),
        }
    )
    out = _label_frame(df)
    assert (out["bci"] == 4).all() and (out["bcj"] == 0).all()
    assert (out["basin_n"] == 5).all()


# -------------------------------------------------- interval overlap


def test_interval_overlap_matches_duckdb(ray_session):
    df = _match("q_interval_overlap", tables=("events",))
    assert len(df) > 0
    assert (df["overlap_us"] >= 0).all()
    # pairs are unique (owner-bucket rule emits each exactly once)
    assert not df.duplicated(["a_id", "b_id"]).any()


def test_interval_overlap_cross_bucket_pair(ray_session):
    from lasutility_ray.stages.overlapjoin import interval_overlap_join

    W = 1000  # tiny bucket so the pair spans many buckets
    a = pd.DataFrame(
        {"a_id": np.array([1], np.int64), "s": np.array([100], np.int64),
         "e": np.array([5200], np.int64)}
    )
    b = pd.DataFrame(
        {"b_id": np.array([2, 3], np.int64),
         "s": np.array([4900, 9000], np.int64),
         "e": np.array([7000, 9100], np.int64)}
    )
    out = interval_overlap_join(
        rd.from_pandas(a), rd.from_pandas(b), bucket_us=W
    ).to_pandas()
    # (1,2) overlap [4900,5200] emitted once; (1,3) disjoint
    assert len(out) == 1
    assert out.iloc[0]["a_id"] == 1 and out.iloc[0]["b_id"] == 2
    assert out.iloc[0]["overlap_us"] == 300


def test_interval_overlap_touching_endpoints(ray_session):
    from lasutility_ray.stages.overlapjoin import interval_overlap_join

    # closed intervals: touching endpoints DO overlap with length 0
    a = pd.DataFrame(
        {"a_id": np.array([1], np.int64), "s": np.array([0], np.int64),
         "e": np.array([1000], np.int64)}
    )
    b = pd.DataFrame(
        {"b_id": np.array([2], np.int64), "s": np.array([1000], np.int64),
         "e": np.array([2000], np.int64)}
    )
    out = interval_overlap_join(
        rd.from_pandas(a), rd.from_pandas(b), bucket_us=500
    ).to_pandas()
    assert len(out) == 1 and out.iloc[0]["overlap_us"] == 0


# ----------------------------------------------------- audio neardup


def test_audio_neardup_recovers_planted_exactly(ray_session):
    import __ray_entry__ as entry

    df = entry.queries()["q_audio_neardup"](SF).to_pandas()
    # exactly the planted (d-1, d) pairs for d % 10 == 9, d-1 >= 0
    import pyarrow.parquet as pq

    ids = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id"]
    ).column("doc_id").to_numpy()
    idset = set(ids.tolist())
    expect = {(d - 1, d) for d in idset if d % 10 == 9 and (d - 1) in idset}
    got = set(zip(df["a"].astype(int), df["b"].astype(int)))
    assert got == expect
    assert (df["n_aligned"] >= 100).all()  # measured planted floor 154


def test_audio_fp_shift_and_scale_invariance():
    from lasutility_ray.stages.audiofp import clip_fingerprints

    rng = np.random.default_rng(123)
    pcm = rng.integers(-(1 << 15), 1 << 15, 2048, dtype=np.int16)
    h1, t1 = clip_fingerprints(pcm)
    shifted = np.concatenate(
        [np.zeros(256, np.int16), (pcm * 0.8).astype(np.int16)]
    )
    h2, t2 = clip_fingerprints(shifted)
    common, i1, i2 = np.intersect1d(h1, h2, return_indices=True)
    assert len(common) >= 0.5 * len(h1)
    # the shared landmarks vote for ONE offset (2 hops)
    offs = t2[i2] - t1[i1]
    vals, cnts = np.unique(offs, return_counts=True)
    assert vals[np.argmax(cnts)] == 2


def test_audio_fp_silence_emits_nothing():
    from lasutility_ray.stages.audiofp import clip_fingerprints

    h, t = clip_fingerprints(np.zeros(2048, np.int16))
    assert len(h) == 0


# ------------------------------------------------------ region labels


def test_region_labels_match_duckdb(ray_session):
    df = _match("q_region_labels")
    assert len(df) > 0
    # labels are canonical: the label cell belongs to its own region
    lab = df[(df["ci"] == df["rci"]) & (df["cj"] == df["rcj"])]
    assert len(lab) == df.groupby(["rci", "rcj"]).ngroups
    # region sizes are consistent
    sizes = df.groupby(["rci", "rcj"]).size()
    assert (
        df.set_index(["rci", "rcj"])["region_n"]
        .groupby(level=[0, 1])
        .first()
        .sort_index()
        == sizes.sort_index()
    ).all()
    # the urban block (cells 12-13 in both axes at 500 m) is one
    # contiguous region of >= 4 cells
    urban = df[(df["ci"].between(12, 13)) & (df["cj"].between(12, 13))]
    assert urban["region_n"].max() >= 4


def test_region_labels_singletons_and_diagonals(ray_session):
    from lasutility_ray.stages.regions import region_labels

    # diagonal-only neighbors are NOT connected under rook adjacency;
    # build a docs table whose cells are known via direct cell probe
    import lasutility_ray.stages.watershed as ws

    probe = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    cells = ws._cells_ds(probe).to_pandas()
    out = region_labels(probe).to_pandas()
    assert len(out) == len(cells)
    # every singleton region labels itself
    singles = out[out["region_n"] == 1]
    assert (singles["ci"] == singles["rci"]).all()
    assert (singles["cj"] == singles["rcj"]).all()


# ------------------------------------------------------ sliding median


def test_sliding_median_matches_duckdb(ray_session):
    df = _match("q_sliding_median", tables=("events",))
    assert len(df) > 24


def test_sliding_median_hand_window(ray_session):
    from lasutility_ray.stages.slidingdistinct import sliding_window_median

    # values 10 @ h0, 20 @ h1, 30 @ h2, window 2:
    #   h0 -> median(10) = 10; h1 -> median(10,20) = 15
    #   h2 -> median(20,30) = 25
    ev = pd.DataFrame(
        {
            "ts": pd.to_datetime(np.array([0, 1, 2]) * 3600, unit="s"),
            "value": [10.0, 20.0, 30.0],
        }
    )
    out = (
        sliding_window_median(rd.from_pandas(ev), window_hours=2)
        .to_pandas()
        .sort_values("hr")
        .reset_index(drop=True)
    )
    assert out["hr"].tolist() == [0, 1, 2]
    assert out["med_value"].tolist() == [10.0, 15.0, 25.0]


# ------------------------------------------------------ zonemap prune


def test_zonemap_prune_matches_duckdb(ray_session):
    df = _match("q_zonemap_prune", tables=("events",))
    assert len(df) == 120  # every hour of the 5-day range is active


def test_clustered_read_prunes_partitions(ray_session, tmp_path):
    import os

    from lasutility_ray.state.clustered import (
        read_hr_range,
        write_clustered_events,
    )

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["ts", "user_id"])
    path = str(tmp_path / "clustered")
    write_clustered_events(ev, path)
    days = sorted(d for d in os.listdir(path) if d.startswith("day="))
    assert len(days) >= 30  # the fixture spans a month
    # a one-day range touches exactly one partition directory and
    # returns exactly that day's hours
    lo = 473_352 + 48  # day 3 of the month
    out = read_hr_range(path, lo, lo + 23).to_pandas()
    assert set(out["hr"] // 24) == {lo // 24}
    # empty range outside the corpus yields an empty typed result
    empty = read_hr_range(path, 1, 2).to_pandas()
    assert len(empty) == 0


# ------------------------------------------------------- late events


def test_late_events_match_duckdb(ray_session):
    df = _match("q_late_events", tables=("events",))
    assert 0 < len(df) < 10000  # ~7% of the fixture is late at 28 days


def test_late_events_first_arrival_never_late(ray_session):
    from lasutility_ray.stages.watermark import ARR_MOD, ARR_MUL, late_events

    # two events: the one arriving FIRST can never be late, the one
    # arriving second is late iff its time trails by > lateness
    ev = pd.DataFrame(
        {
            "event_id": np.array([3, 4], np.int64),
            "ts": pd.to_datetime([100 * 86400, 0], unit="s"),
        }
    )
    arr3, arr4 = (3 * ARR_MUL) % ARR_MOD, (4 * ARR_MUL) % ARR_MOD
    out = late_events(
        rd.from_pandas(ev), lateness_us=86400 * 1_000_000
    ).to_pandas()
    if arr3 < arr4:
        # event 4 (ts=0) arrives after event 3 (ts=100d): 100d late
        assert out["event_id"].tolist() == [4]
        assert out["lag_us"].tolist() == [100 * 86400 * 1_000_000]
    else:
        assert len(out) == 0  # late-ts event arrived first


def test_late_events_blocks_partition_invariant(ray_session):
    from lasutility_ray.stages.watermark import late_events

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "ts"])
    a = (
        late_events(ev)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    b = (
        late_events(ev.repartition(17))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


# ------------------------------------------------------ table profile


def test_profile_table_matches_duckdb(ray_session):
    df = _match("q_profile_table")
    assert len(df) == 5
    d = df.set_index("col")
    assert d.loc["doc_id", "n_distinct"] == d.loc["doc_id", "n_rows"]  # key
    assert (df["n_null"] == 0).all()


def test_profile_table_nulls_and_constants(ray_session):
    from lasutility_ray.stages.profile import profile_table

    t = pd.DataFrame(
        {
            "k": np.array([1, 2, 3, 4], np.int64),
            "s": ["x", None, "x", "y"],
            "const": ["c", "c", "c", "c"],
        }
    )
    out = (
        profile_table(rd.from_pandas(t), ["k", "s", "const"])
        .to_pandas()
        .set_index("col")
    )
    assert out.loc["s", "n_null"] == 1
    assert out.loc["s", "n_distinct"] == 2
    assert out.loc["s", "min_v"] == "x" and out.loc["s", "max_v"] == "y"
    assert out.loc["const", "n_distinct"] == 1
    assert out.loc["k", "min_v"] == "1" and out.loc["k", "max_v"] == "4"


# ---------------------------------------------- triangle fast path


def test_triangle_local_path_equals_distributed(ray_session):
    from lasutility_ray.stages.graph import (
        triangle_counts_from_edges,
        undirected_host_edges,
    )

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    edges = undirected_host_edges(docs).materialize()
    fast = (
        triangle_counts_from_edges(edges)
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    dist = (
        triangle_counts_from_edges(edges, local_edge_limit=0)  # force
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, dist, check_dtype=False)
    assert fast["n_triangles"].sum() > 0


# -------------------------------------------------------- mutual NN


def test_mutual_nn_matches_duckdb(ray_session):
    df = _match("q_mutual_nn", tables=("embeddings",))
    assert len(df) > 0  # planted near-dup clusters pair up
    assert (df["a"] < df["b"]).all()
    assert not df.duplicated(["a"]).any()  # best-match is a matching


def test_mutual_nn_hand_case(ray_session):
    from lasutility_ray.stages.similarity import mutual_nn

    # 0 and 1 nearly parallel; 2 points at 1 but 1's best is 0 ->
    # only (0, 1) is mutual
    emb = pd.DataFrame(
        {
            "vec_id": np.array([0, 1, 2], np.int64),
            "embedding": [
                [1.0, 0.0, 0.0],
                [0.999, 0.04, 0.0],
                [0.90, 0.43, 0.0],
            ],
        }
    )
    out = mutual_nn(rd.from_pandas(emb)).to_pandas()
    assert out[["a", "b"]].values.tolist() == [[0, 1]]


# ------------------------------------------------------ phrase search


def test_phrase_search_matches_duckdb(ray_session):
    df = _match("q_phrase_search")
    assert len(df) > 0
    assert (df["n_hits"] >= 1).all()


def test_phrase_search_boundaries(ray_session):
    from lasutility_ray.stages.chunking import phrase_search

    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3, 4], np.int64),
            "text": [
                "alpha beta tail",        # at start
                "head alpha beta",        # at end
                "alpha beta alpha beta",  # twice, non-overlapping
                "alpha gamma beta",       # NOT consecutive
            ],
        }
    )
    out = (
        phrase_search(rd.from_pandas(docs), "alpha beta")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["n_hits"].tolist() == [1, 1, 2]


def test_phrase_search_never_crosses_docs(ray_session):
    from lasutility_ray.stages.chunking import phrase_search

    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2], np.int64),
            "text": ["ends with alpha", "beta starts here"],
        }
    )
    out = phrase_search(rd.from_pandas(docs), "alpha beta").to_pandas()
    assert len(out) == 0


# ---------------------------------------------------------- two hop


def test_two_hop_matches_duckdb(ray_session):
    df = _match("q_two_hop")
    assert len(df) > 0
    # 2-hop reach is at least the 1-hop degree for every host
    from lasutility_ray.stages.graph import undirected_host_edges

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    e = undirected_host_edges(docs).to_pandas()
    deg = (
        pd.concat([e["u"], e["v"]]).value_counts().rename("deg").rename_axis("host_id")
    )
    j = df.set_index("host_id").join(deg)
    assert (j["n_reach2"] >= j["deg"]).all()


# ------------------------------------------------------- DEM pyramid


def test_dem_pyramid_matches_duckdb(ray_session):
    df = _match("q_dem_pyramid")
    assert set(df["level"]) == {1, 2, 3}
    # each coarser level has fewer-or-equal cells and its counts sum
    # to the occupied base-cell total
    n1 = df[df["level"] == 1]["n_cells"].sum()
    n2 = df[df["level"] == 2]["n_cells"].sum()
    n3 = df[df["level"] == 3]["n_cells"].sum()
    assert n1 == n2 == n3  # every base cell lands once in each level
    assert (
        len(df[df["level"] == 1])
        >= len(df[df["level"] == 2])
        >= len(df[df["level"] == 3])
    )


def test_dem_pyramid_parent_max_dominates(ray_session):
    df = _match("q_dem_pyramid")
    l1 = df[df["level"] == 1].set_index(["ci", "cj"])["z_max"]
    l2 = df[df["level"] == 2].set_index(["ci", "cj"])["z_max"]
    for (ci, cj), z in l1.items():
        assert l2.loc[(ci // 2, cj // 2)] >= z


# -------------------------------------------------- hourly anomalies


def test_hourly_anomalies_match_duckdb(ray_session):
    df = _match("q_hourly_anomalies", tables=("events",))
    assert len(df) > 24
    assert df["is_anomaly"].dtype == bool or set(
        df["is_anomaly"].unique()
    ) <= {True, False}


def test_hourly_anomalies_integer_test_hand_case(ray_session):
    from lasutility_ray.stages.hourlyanom import hourly_anomalies

    # hour-of-day 0 across 4 days: counts 10, 10, 10, 50 -> the 50 is
    # an anomaly ((n*c-S)^2 = (4*50-80)^2 = 14400 > 4*(4*Q-S^2) =
    # 4*(4*2800-6400) = 19200? no -> compute: Q=300+2500=2800,
    # rhs = 4*(11200-6400) = 19200, lhs(50) = 120^2 = 14400 -> NOT
    # anomalous at k=2 (one wild day inflates the std); at k=1 it is.
    ev_hours = [0, 24, 48, 72]
    rows = []
    for h, n in zip(ev_hours, (10, 10, 10, 50)):
        rows.extend([h * 3600] * n)
    ev = pd.DataFrame({"ts": pd.to_datetime(rows, unit="s")})
    out2 = hourly_anomalies(rd.from_pandas(ev), k=2).to_pandas()
    assert not out2["is_anomaly"].any()
    out1 = hourly_anomalies(rd.from_pandas(ev), k=1).to_pandas()
    assert out1.set_index("hr")["is_anomaly"][72]
    assert not out1.set_index("hr")["is_anomaly"][0]


# --------------------------------------------------------- TPC-H Q1


def test_tpch_q1_matches_duckdb(ray_session):
    df = _match("q_tpch_q1", tables=("lineitem",))
    assert len(df) >= 3  # flag x status combinations present
    assert (df["sum_disc_c"] <= df["sum_base_c"]).all()
    assert (df["sum_charge_c"] >= df["sum_disc_c"]).all()
    assert df["count_order"].sum() < 60000  # the date filter bites


# ----------------------------------------------------------- unpivot


def test_unpivot_matches_duckdb(ray_session):
    df = _match("q_unpivot", tables=("lineitem",))
    assert len(df) == 60000 * 4
    assert set(df["variable"]) == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax"
    }


# -------------------------------------------------- spanning forest


def test_mst_forest_invariants(ray_session):
    import __ray_entry__ as entry
    from lasutility_ray.stages.graph import undirected_host_edges

    df = entry.queries()["q_mst_forest"](SF).to_pandas()
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    e = undirected_host_edges(docs).to_pandas()
    nodes = set(e["u"]) | set(e["v"])
    # forest: |E_msf| = |V| - #components; acyclic via union-find
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(df["u"], df["v"]):
        ru, rv = find(u), find(v)
        assert ru != rv, "MSF contains a cycle"
        parent[ru] = rv
    n_comp = len({find(n) for n in nodes})
    assert len(df) == len(nodes) - n_comp
    # spanning: adding any non-MSF edge closes a cycle within a comp
    chosen = set(zip(df["u"], df["v"]))
    for u, v in zip(e["u"], e["v"]):
        if (u, v) not in chosen:
            assert find(u) == find(v)


def test_mst_boruvka_equals_kruskal(ray_session):
    from lasutility_ray.stages.graphstats import mst_forest

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    fast = (
        mst_forest(docs)
        .to_pandas()
        .sort_values(["u", "v"])
        .reset_index(drop=True)
    )
    dist = (
        mst_forest(docs, distributed=True)
        .to_pandas()
        .sort_values(["u", "v"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, dist, check_dtype=False)
    assert len(fast) > 0


# -------------------------------------------------------- props stats


def test_props_stats_match_duckdb(ray_session):
    df = _match("q_props_stats", tables=("events",))
    assert len(df) >= 2
    assert (df["min_k"] <= df["max_k"]).all()
    assert (df["n_distinct_k"] <= df["n_events"]).all()


# ----------------------------------------------------- trending hosts


def test_trending_hosts_match_duckdb(ray_session):
    df = _match("q_trending_hosts")
    assert len(df) > 0
    assert (df["score_scaled"] >= 0).all()
    # freshest pages carry weight 2^30; anything nonzero is >= 1
    assert df["score_scaled"].max() >= (1 << 30)


# ------------------------------------------------------- interarrival


def test_interarrival_matches_duckdb(ray_session):
    df = _match("q_interarrival", tables=("events",))
    assert len(df) > 0
    assert (df["median_gap_us"] >= 0).all()


def test_interarrival_discrete_median_convention(ray_session):
    from lasutility_ray.stages.events import interarrival_medians

    # user 1: events at 0, 10, 40, 100 s -> gaps {10, 30, 60} s,
    # discrete median = 30 s (ceil(3/2) = 2nd smallest)
    # user 2: events at 0, 5 s -> single gap 5 s
    ev = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 1, 1, 2, 2], np.int64),
            "ts": pd.to_datetime([0, 10, 40, 100, 0, 5], unit="s"),
        }
    )
    out = (
        interarrival_medians(rd.from_pandas(ev))
        .to_pandas()
        .set_index("user_id")
    )
    assert out.loc[1, "n_gaps"] == 3
    assert out.loc[1, "median_gap_us"] == 30_000_000
    assert out.loc[2, "median_gap_us"] == 5_000_000


# ------------------------------------------------------- cell density


def test_cell_density_matches_duckdb(ray_session):
    import duckdb
    import __ray_entry__ as entry

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    df = entry.queries()["q_cell_density"](SF).to_pandas()
    ref = con.execute(entry.oracle_sql()["q_cell_density"]).df()
    a, b = _sorted(df), _sorted(ref)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert len(df) > 0
    # density includes the cell itself
    assert (df["n_density"] >= 1).all()


# --------------------------------------------------------- total sort


def test_total_sort_matches_duckdb(ray_session):
    df = _match("q_total_sort")
    assert len(df) == 500
    assert df["rank"].min() == 1 and df["rank"].max() == 500
    assert not df["rank"].duplicated().any()


def test_total_sort_split_invariance(ray_session):
    from lasutility_ray.stages.totalsort import total_sort_ranks

    docs = rd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    a = (
        total_sort_ranks(docs, sample_n=4096)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    # degenerate splits (tiny sample) must give the SAME ranks —
    # split points affect balance only, never correctness
    b = (
        total_sort_ranks(docs, sample_n=2)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


# ------------------------------------------------------ jsonl source


def test_jsonl_roundtrip_matches_source(ray_session):
    df = _match("q_jsonl_roundtrip")
    assert len(df) == 500


def test_jsonl_preserves_newlines_and_unicode(ray_session, tmp_path):
    from lasutility_ray.sources.jsonl import read_jsonl, write_jsonl_shards

    src = pd.DataFrame(
        {
            "doc_id": np.array([1, 2], np.int64),
            "text": ["line one\nline two", "ünïcödé → ✓"],
        }
    )
    path = str(tmp_path / "jl")
    write_jsonl_shards(rd.from_pandas(src), path)
    out = (
        read_jsonl(path).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, src, check_dtype=False)


# -------------------------------------------------- schema evolution


def test_schema_evolution_matches_duckdb(ray_session):
    df = _match("q_schema_evolution")
    assert len(df) == 500
    # v1 rows (even ids) carry NULL lang; v2 rows keep theirs
    assert df[df["doc_id"] % 2 == 0]["lang"].isna().all()
    assert df[df["doc_id"] % 2 == 1]["lang"].notna().all()
    assert str(df["n_chars"].dtype) == "int64"  # widened from int32


# --------------------------------------------------------- quarantine


def test_quarantine_matches_duckdb(ray_session):
    df = _match("q_quarantine")
    assert len(df) == 495  # 5 poison docs at sf0.01
    assert not (df["doc_id"] % 100 == 13).any()


def test_quarantine_sink_holds_exactly_the_poison(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lasutility_ray.stages.quarantine import quarantine_map_batches

    src = pd.DataFrame({"doc_id": np.arange(50, dtype=np.int64)})

    def f(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy()
        if np.isin(d, (7, 23)).any():
            raise RuntimeError("boom")
        return t

    qdir = str(tmp_path / "q")
    out = quarantine_map_batches(
        rd.from_pandas(src), f, qdir, batch_size=16
    ).to_pandas()
    assert sorted(out["doc_id"]) == [i for i in range(50) if i not in (7, 23)]
    bad = pq.read_table(qdir).to_pandas()
    assert sorted(bad["doc_id"]) == [7, 23]
    assert bad["__error"].str.contains("boom").all()


# ------------------------------------------------------ merge upsert


def test_merge_upsert_matches_duckdb(ray_session):
    df = _match("q_merge_upsert", tables=("orders",))
    assert not (df["k"] % 97 == 0).any()  # tombstoned keys gone
    assert (df[df["k"] >= 10_000_000]["price_c"] == 4200).all()  # inserts
    upd = df[(df["k"] % 10 == 0) & (df["k"] % 97 != 0) & (df["k"] < 10_000_000)]
    assert (upd["version"] == 1).all()  # delta won


def test_merge_upsert_delta_beats_base_at_equal_version(ray_session):
    from lasutility_ray.stages.scd import merge_upsert

    base = pd.DataFrame(
        {"k": np.array([1], np.int64), "v": np.array([5], np.int64),
         "version": np.array([3], np.int64)}
    )
    delta = pd.DataFrame(
        {"k": np.array([1], np.int64), "v": np.array([9], np.int64),
         "version": np.array([3], np.int64), "op": ["U"]}
    )
    out = merge_upsert(
        rd.from_pandas(base), rd.from_pandas(delta), "k", "version"
    ).to_pandas()
    assert out["v"].tolist() == [9]


# -------------------------------------------------------- bloom index


def test_bloom_index_matches_duckdb(ray_session):
    df = _match("q_bloom_index")
    assert len(df) == 7


def test_bloom_index_prunes_shards(ray_session, tmp_path):
    from lasutility_ray.state.shardindex import (
        point_lookup,
        write_indexed_shards,
    )

    docs = rd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    path = str(tmp_path / "idx")
    write_indexed_shards(docs, path, "doc_id", rows_per_shard=32)
    out, n_read, n_total = point_lookup(path, "doc_id", np.array([42], np.int64))
    got = out.to_pandas()
    assert got["doc_id"].tolist() == [42]
    assert n_total >= 15  # 500 rows / 32 per shard
    assert n_read < n_total  # the index actually pruned
    # absent key: typically zero shards open (fp-rate ~ (k m_set/m)^k)
    out2, n2, _ = point_lookup(path, "doc_id", np.array([10**9], np.int64))
    assert len(out2.to_pandas()) == 0


# ------------------------------------------------------ pseudonymize


def test_pseudonymize_matches_duckdb(ray_session):
    df = _match("q_pseudonymize", tables=("events",))
    assert len(df) > 0


def test_pseudonymize_is_bijective(ray_session):
    from lasutility_ray.stages.pii import pseudonymize

    src = pd.DataFrame({"user_id": np.arange(1000, dtype=np.int64)})
    out = pseudonymize(rd.from_pandas(src), ["user_id"]).to_pandas()
    assert out["user_id"].nunique() == 1000  # no collisions
    assert not set(out["user_id"]) & set(range(1000))  # actually tokenized


# -------------------------------------------------- negative samples


def test_negative_samples_match_duckdb(ray_session):
    df = _match("q_negative_samples")
    assert len(df) == 500 * 2
    assert not (df["doc_id"] == df["neg_id"]).any()
    assert set(df["slot"]) == {0, 1}


def test_negative_samples_deterministic_across_partitioning(ray_session):
    from lasutility_ray.stages.dsir import negative_samples

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    a = (
        negative_samples(docs, 500)
        .to_pandas()
        .sort_values(["doc_id", "slot"])
        .reset_index(drop=True)
    )
    b = (
        negative_samples(docs.repartition(13), 500)
        .to_pandas()
        .sort_values(["doc_id", "slot"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


# ------------------------------------------------ distribution drift


def test_distribution_drift_matches_duckdb(ray_session):
    df = _match("q_distribution_drift")
    assert len(df) == 1
    assert 0 <= df.iloc[0]["tvd_e6"] <= 1_000_000


def test_distribution_drift_extremes(ray_session):
    from lasutility_ray.stages.skewprof import distribution_drift

    # identical halves -> TVD 0; disjoint categories -> TVD 1
    same = pd.DataFrame(
        {"doc_id": np.arange(8, dtype=np.int64),
         "lang": ["en", "fi"] * 4}
    )
    # parity split: even ids all 'en'? construct: even ids get 'en',
    # odd ids get 'en' too -> identical distributions
    same["lang"] = "en"
    out0 = distribution_drift(rd.from_pandas(same)).to_pandas()
    assert out0.iloc[0]["tvd_e6"] == 0
    disj = pd.DataFrame(
        {"doc_id": np.arange(8, dtype=np.int64),
         "lang": ["en", "fi"] * 4}
    )  # even ids en, odd ids fi -> disjoint
    out1 = distribution_drift(rd.from_pandas(disj)).to_pandas()
    assert out1.iloc[0]["tvd_e6"] == 1_000_000


# --------------------------------------------------------- cocitation


def test_cocitation_matches_duckdb(ray_session):
    df = _match("q_cocitation")
    assert len(df) > 0
    assert (df["n_common"] >= 2).all()
    assert (df["host_a"] < df["host_b"]).all()


# ---------------------------------------------------------- winsorize


def test_winsorize_matches_duckdb(ray_session):
    df = _match("q_winsorize", tables=("events",))
    assert len(df) == 10000
    # clipping happened at both tails
    import duckdb

    con = _oracle_con(tables=("events",), sf=SF)
    raw = con.execute("SELECT min(value), max(value) FROM events").fetchone()
    assert df["value_w"].min() > raw[0]
    assert df["value_w"].max() < raw[1]


# ----------------------------------------------------------- ab chisq


def test_ab_chisq_matches_duckdb(ray_session):
    df = _match("q_ab_chisq", tables=("events",))
    assert len(df) == 1
    r = df.iloc[0]
    assert r[["a_succ", "a_other", "b_succ", "b_other"]].sum() == 10000
    # the fixture's hash coupling lands just over the 95% line
    # (chi2_e6 = 4 921 748); the flag must agree with the statistic
    assert bool(r["significant"]) == (r["chi2_e6"] > 3_841_459)


def test_ab_chisq_detects_planted_effect(ray_session):
    from lasutility_ray.stages.hourlyanom import ab_chisq

    # arm 0 converts 50%, arm 1 converts 10% -> obviously significant
    rows = []
    for u in range(200):
        arm = u % 2
        n_succ = 5 if arm == 0 else 1
        rows += [(u, "purchase")] * n_succ + [(u, "view")] * (10 - n_succ)
    ev = pd.DataFrame(rows, columns=["user_id", "event_type"])
    ev["user_id"] = ev["user_id"].astype(np.int64)
    out = ab_chisq(rd.from_pandas(ev)).to_pandas().iloc[0]
    assert out["significant"]
    assert out["chi2_e6"] > 100 * 1_000_000


# ----------------------------------------------------- daily top terms


def test_daily_top_terms_match_duckdb(ray_session):
    df = _match("q_daily_top_terms")
    assert len(df) > 0
    assert (df["rank"] <= 5).all()
    # within a day, counts are non-increasing by rank
    for _, g in df.groupby("day"):
        s = g.sort_values("rank")["n"].to_numpy()
        assert (s[:-1] >= s[1:]).all()


# ------------------------------------------------------------ contours


def test_contours_match_duckdb(ray_session):
    df = _match("q_contours")
    assert len(df) > 0
    # segments connect adjacent edge midpoints: Chebyshev length <= 2
    d = np.maximum(
        (df["r2"] - df["r1"]).abs(), (df["c2"] - df["c1"]).abs()
    )
    assert (d >= 1).all() and (d <= 2).all()


def test_contours_hand_block():
    from lasutility_ray.stages.contours import _E1, _E2, _EDGE_ID, _SEGS

    # case 5 (a+c inside) must emit TWO segments under the fixed
    # saddle convention; case 9 (a+d) a single top-bottom cut
    assert (_E1[5 * 2] >= 0) and (_E1[5 * 2 + 1] >= 0)
    assert _SEGS[9] == [("T", "B")]
    # every case's segments use valid edges
    for case, pairs in _SEGS.items():
        for s, (x, y) in enumerate(pairs):
            assert _E1[case * 2 + s] == _EDGE_ID[x]
            assert _E2[case * 2 + s] == _EDGE_ID[y]
