"""Session-9 operators: SCD Type-2 validity intervals, longest
consecutive-day streaks (gaps-and-islands), market-basket association
rules, and the key-skew profiler — value-exact vs DuckDB, with kernel
edge pins (open-interval NaN, streak tie rule, brute-force pair
expansion, uniform-vs-hot-key Gini, integer nearest-rank)."""

import itertools

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

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


def _match(name, tables=("events",)):
    import __ray_entry__ as entry

    con = _oracle_con(tables=tables)
    df = entry.queries()[name](SF).to_pandas()
    ref = con.execute(entry.oracle_sql()[name]).df()
    a, b = _sorted(df), _sorted(ref)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert [str(t) for t in a.dtypes] == [str(t) for t in b.dtypes]
    return df


# ------------------------------------------------------------------ SCD2


def test_scd2_matches_duckdb(ray_session):
    df = _match("q_scd2_intervals")
    # real data exercises multi-version users and open intervals
    assert df["version"].max() >= 3
    assert df["valid_to_us"].isna().sum() == df["user_id"].nunique()


def test_scd2_hand_case(ray_session):
    from lasutility_ray.stages.scd import scd2_intervals

    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6],
            "user_id": [7, 7, 7, 7, 9, 9],
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-01-03",
                 "2024-01-04", "2024-01-01", "2024-01-05"]
            ),
            "event_type": ["a", "a", "b", "a", "x", "x"],
        }
    )
    out = (
        scd2_intervals(rd.from_pandas(ev))
        .to_pandas()
        .sort_values(["user_id", "version"])
        .reset_index(drop=True)
    )
    assert list(out["event_type"]) == ["a", "b", "a", "x"]
    assert list(out["version"]) == [1, 2, 3, 1]
    assert list(out["n_events"]) == [2, 1, 1, 2]
    # each run's valid_to == next run's valid_from; final runs open
    assert out.loc[0, "valid_to_us"] == out.loc[1, "valid_from_us"]
    assert out.loc[1, "valid_to_us"] == out.loc[2, "valid_from_us"]
    assert np.isnan(out.loc[2, "valid_to_us"])
    assert np.isnan(out.loc[3, "valid_to_us"])


# ---------------------------------------------------------------- streaks


def test_streaks_match_duckdb(ray_session):
    df = _match("q_longest_streaks")
    assert (df["max_streak_days"] >= 1).all()
    assert (df["n_active_days"] >= df["max_streak_days"]).all()


def test_streaks_tie_prefers_earliest(ray_session):
    from lasutility_ray.stages.streaks import longest_streaks

    # user 5: days 10-11 and 20-21 (tie, earliest wins); one dup day
    ev = pd.DataFrame(
        {
            "user_id": [5, 5, 5, 5, 5],
            "ts": pd.to_datetime(
                [10, 10, 11, 20, 21], unit="D", origin="unix"
            ),
        }
    )
    out = longest_streaks(rd.from_pandas(ev)).to_pandas()
    assert len(out) == 1
    assert out.loc[0, "max_streak_days"] == 2
    assert out.loc[0, "streak_start_day"] == 10
    assert out.loc[0, "n_active_days"] == 4


# ----------------------------------------------------------------- basket


def test_basket_rules_match_duckdb(ray_session):
    df = _match("q_basket_rules")
    assert len(df) >= 3
    # lift sanity: pair support never exceeds either item support
    assert (df["pair_n"] <= df[["a_n", "b_n"]].min(axis=1)).all()


def test_basket_rules_brute_force(ray_session):
    from lasutility_ray.stages.basket import basket_rules

    rng = np.random.default_rng(3)
    n = 400
    ev = pd.DataFrame(
        {
            "user_id": rng.integers(0, 12, n),
            "ts": pd.to_datetime(
                rng.integers(0, 5, n) * 86_400_000_000, unit="us"
            ),
            "event_type": rng.choice(list("abcd"), n),
        }
    )
    out = (
        basket_rules(rd.from_pandas(ev))
        .to_pandas()
        .set_index(["item_a", "item_b"])
    )
    # brute force over python sets
    baskets = {}
    for r in ev.itertuples():
        baskets.setdefault(
            (r.user_id, r.ts.value // 86_400_000_000), set()
        ).add(r.event_type)
    total = len(baskets)
    supp, pair = {}, {}
    for items in baskets.values():
        for it in items:
            supp[it] = supp.get(it, 0) + 1
        for a, b in itertools.combinations(sorted(items), 2):
            pair[(a, b)] = pair.get((a, b), 0) + 1
    assert len(out) == len(pair)
    for (a, b), pn in pair.items():
        row = out.loc[(a, b)]
        assert row["pair_n"] == pn
        assert row["a_n"] == supp[a] and row["b_n"] == supp[b]
        assert row["conf_ab_micro"] == (1_000_000 * pn) // supp[a]
        assert row["lift_micro"] == (1_000_000 * pn * total) // (
            supp[a] * supp[b]
        )


# --------------------------------------------------------------- skewprof


def test_skew_profile_matches_duckdb(ray_session):
    df = _match("q_key_skew_profile")
    assert df.loc[0, "n_keys"] >= 2
    # the synthetic user distribution is genuinely non-uniform
    assert df.loc[0, "gini_micro"] > 0


def test_skew_profile_uniform_vs_hot(ray_session):
    from lasutility_ray.stages.skewprof import _stats_from_counts

    uni = _stats_from_counts(np.full(100, 7, np.int64))
    assert uni.loc[0, "gini_micro"] == 0
    assert uni.loc[0, "top10_share_micro"] == 100_000  # 10/100 keys
    assert uni.loc[0, "p50_count"] == 7 and uni.loc[0, "p99_count"] == 7
    hot = np.full(100, 1, np.int64)
    hot[0] = 9901  # one key holds 99% of rows
    h = _stats_from_counts(hot)
    assert h.loc[0, "max_count"] == 9901
    assert h.loc[0, "top10_share_micro"] == 991_000
    assert h.loc[0, "gini_micro"] > 900_000


def test_skew_profile_nearest_rank_integer_exact(ray_session):
    """n=10 exposes the IEEE ceil(0.9*10)=10 hazard: the integer rank
    must be 9 (ceil(90*10/100)) in both engines."""
    import duckdb

    from lasutility_ray.stages.skewprof import _stats_from_counts

    cnt = np.arange(1, 11, dtype=np.int64)  # counts 1..10
    ours = _stats_from_counts(cnt)
    assert ours.loc[0, "p90_count"] == 9
    con = duckdb.connect()
    # user x % 10 over 0..54 -> per-key counts 6,6,6,6,6,5,5,5,5,5
    con.execute(
        "CREATE TABLE events AS SELECT CAST(x % 10 AS BIGINT) AS user_id "
        "FROM (SELECT unnest(range(55)) AS x)"
    )
    from lasutility_ray.stages.skewprof import user_skew_profile_sql

    ref = con.execute(user_skew_profile_sql()).df()
    assert ref.loc[0, "p90_count"] == 6  # integer rank 9 of sorted
    assert ref.loc[0, "p50_count"] == 5


# --------------------------------------------------------------- resample


def test_resample_locf_matches_duckdb(ray_session):
    df = _match("q_resample_locf")
    # grids are dense: per user, hours are contiguous
    g = df.sort_values(["user_id", "hr"]).groupby("user_id")["hr"]
    assert ((g.max() - g.min() + 1) == g.count()).all()


def test_resample_locf_hand_case(ray_session):
    from lasutility_ray.stages.resample import resample_locf

    H = 3_600_000_000
    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [5, 5, 5, 5],
            # two events in hour 0 (latest wins), gap, then hour 3
            "ts": pd.to_datetime([100, 3000, 3 * H, 3 * H + 7], unit="us"),
            "value": [1.00, 2.00, 9.00, 4.00],
        }
    )
    out = (
        resample_locf(rd.from_pandas(ev))
        .to_pandas()
        .sort_values("hr")
        .reset_index(drop=True)
    )
    assert list(out["hr"]) == [0, 1, 2, 3]
    # hour 0 winner = latest in hour (200 cents); carried through the
    # gap; hour 3 winner = latest (400 cents)
    assert list(out["cents_locf"]) == [200, 200, 200, 400]


# ---------------------------------------------------------------- geohash


def test_geohash_counts_match_duckdb(ray_session):
    df = _match("q_geohash_counts", tables=("documents",))
    assert df["n_docs"].sum() == 500
    assert set(df["geohash"].str.len()) == {4}
    _match("q_geohash_rollup", tables=("documents",))


def test_geohash_codec_roundtrip(ray_session):
    from lasutility_ray.geom.geohash import decode_bounds, encode

    rng = np.random.default_rng(7)
    x = rng.integers(0, 24_000_000, 500)
    y = rng.integers(0, 24_000_000, 500)
    for p in (1, 3, 4, 7):
        codes = encode(x, y, p)
        for i in range(0, 500, 50):
            x0, y0, x1, y1 = decode_bounds(codes[i])
            assert x0 <= x[i] < x1 and y0 <= y[i] < y1
    # prefix property: the 2-char prefix IS the 2-char cell
    c4 = encode(x, y, 4)
    c2 = encode(x, y, 2)
    assert all(a[:2] == b for a, b in zip(c4, c2))


# ------------------------------------------------------------------- hull


def test_convex_hull_matches_duckdb(ray_session):
    df = _match("q_convex_hull", tables=("documents",))
    assert len(df) >= 3
    # edges close into one cycle: each vertex appears once as source
    # and once as target
    src = set(zip(df["ax"], df["ay"]))
    dst = set(zip(df["bx"], df["by"]))
    assert src == dst and len(src) == len(df)


def test_convex_hull_contains_all_points(ray_session):
    from lasutility_ray.stages.hull import _chain

    rng = np.random.default_rng(11)
    for _ in range(20):
        px = rng.integers(0, 1000, 60)
        py = rng.integers(0, 1000, 60)
        v = _chain(px, py)
        n = len(v)
        for i in range(n):
            ax, ay = v[i]
            bx, by = v[(i + 1) % n]
            cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
            assert (cross >= 0).all()  # CCW: everything left or on


def test_convex_hull_keeps_collinear_boundary_vertex(ray_session):
    from lasutility_ray.stages.hull import _chain

    # square plus a midpoint on the bottom edge: keep-collinear chain
    # retains it (matching the SQL strictly-left edge rule)
    px = np.array([0, 5, 10, 10, 0, 4])
    py = np.array([0, 0, 0, 10, 10, 6])
    v = [tuple(r) for r in _chain(px, py)]
    assert (5, 0) in v and (4, 6) not in v


# ----------------------------------------------------------- vocab growth


def test_vocab_growth_matches_duckdb(ray_session):
    df = _match("q_vocab_growth", tables=("documents",))
    df = df.sort_values("bucket").reset_index(drop=True)
    # a real Heaps curve: several buckets, cumulative is the cumsum
    assert len(df) >= 3
    assert (df["cum_vocab"] == df["n_new_tokens"].cumsum()).all()
    # novelty decays overall: the last bucket adds less than the first
    assert df["n_new_tokens"].iloc[-1] < df["n_new_tokens"].iloc[0]


def test_vocab_growth_first_appearance_rule(ray_session):
    from lasutility_ray.stages.vocabgrowth import vocab_growth

    docs = pd.DataFrame(
        {
            "doc_id": [0, 64, 128],
            # doc 64 repeats doc 0's only shingle; doc 128 adds one new
            "text": ["a b c", "a b c", "a b c d"],
        }
    )
    out = (
        vocab_growth(rd.from_pandas(docs))
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    # 'a b c' first at doc 0 (bucket 0); 'b c d' first at doc 128 (bucket 2)
    assert list(out["bucket"]) == [0, 2]
    assert list(out["n_new_tokens"]) == [1, 1]
    assert list(out["cum_vocab"]) == [1, 2]


# ------------------------------------------------------------ PIT join


def test_pit_join_matches_duckdb(ray_session):
    df = _match("q_pit_version_join")
    # both wings exercised: some lookups precede the first version
    assert df["version_asof"].isna().sum() >= 1
    assert df["version_asof"].notna().sum() >= 1


def test_pit_join_hand_case(ray_session):
    from lasutility_ray.stages.pitjoin import pit_version_join

    H = 3_600_000_000
    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [5, 5, 5, 5],
            "ts": pd.to_datetime([0, H, 2 * H, 3 * H + 1], unit="us"),
            "event_type": ["a", "b", "b", "a"],
        }
    )
    out = (
        pit_version_join(rd.from_pandas(ev))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # event 1 (t=0): t-1h < first version -> NaN
    assert np.isnan(out.loc[0, "version_asof"])
    # event 2 (t=1h): instant = 0 == version-1 start -> version 1 ('a')
    assert out.loc[1, "version_asof"] == 1.0 and out.loc[1, "type_asof"] == "a"
    # event 3 (t=2h): instant = 1h == version-2 start -> version 2 ('b')
    assert out.loc[2, "version_asof"] == 2.0 and out.loc[2, "type_asof"] == "b"
    # event 4 (t=3h+1us): instant just past 2h -> still version 2
    assert out.loc[3, "version_asof"] == 2.0 and out.loc[3, "type_asof"] == "b"


# ---------------------------------------------------------------- viewshed


def test_viewshed_flat_dem_all_visible(ray_session):
    from lasutility_ray.stages.viewshed import visible_mask

    z = np.zeros((20, 20), dtype=np.int64)
    assert visible_mask(z, 10, 10).all()


def test_viewshed_wall_casts_exact_shadow(ray_session):
    from lasutility_ray.stages.viewshed import visible_mask

    z = np.zeros((21, 21), dtype=np.int64)
    z[10, 12] = 10_000  # a 100 m wall two cells east of the observer
    vis = visible_mask(z, 10, 10, obs_cm=200)
    assert vis[10, 12]  # the wall face itself is visible
    # straight-east cells behind the wall: tangent of the wall at
    # k=2 is (10000-200)/2 = 4900/1; ground cells at k>2 have
    # negative tangent -> occluded
    assert not vis[10, 13] and not vis[10, 20]
    # unrelated directions stay visible
    assert vis[10, 8] and vis[0, 10] and vis[20, 10]


def test_viewshed_tile_summaries(ray_session):
    import __ray_entry__ as entry

    df = entry.queries()["q_tile_viewsheds"](SF).to_pandas()
    assert len(df) >= 100  # most 1-km tiles are occupied at sf0.01
    assert (df["n_visible"] <= 2500).all()
    assert (df["n_occupied_visible"] >= 1).all()  # observer cell visible
    assert (df["n_occupied_visible"] <= df["n_occupied"]).all()


# ------------------------------------------------------------ calibration


def test_calibration_bins_match_duckdb(ray_session):
    df = _match("q_calibration_bins", tables=("documents",))
    assert len(df) >= 5
    assert df["n"].sum() == 500
    # negative-margin bins exist (the // truncation-vs-floor hazard
    # is actually exercised)
    assert (df["bin_id"] < 0).any()
    # calibration is directionally sane: the hottest bin is more
    # positive than the coldest
    top = df.loc[df["bin_id"].idxmax(), "pos_rate_micro"]
    bot = df.loc[df["bin_id"].idxmin(), "pos_rate_micro"]
    assert top > bot


# ---------------------------------------------------------------- qnorm


def test_quantile_normalize_matches_duckdb(ray_session):
    df = _match("q_quantile_normalize", tables=("documents",))
    assert len(df) == 500
    assert (df["n_chars_qnorm"] > 0).all()


def test_quantile_normalize_identity_on_single_source(ray_session):
    """With one source the mapping is the identity: every value maps
    to itself (rank r of n maps to global rank ceil(r*n/n) = r)."""
    from lasutility_ray.stages.qnorm import quantile_normalize

    docs = pd.DataFrame(
        {
            "doc_id": range(10),
            "source": ["only"] * 10,
            "n_chars": [5, 5, 7, 9, 9, 9, 12, 20, 20, 31],
        }
    )
    out = quantile_normalize(rd.from_pandas(docs)).to_pandas()
    assert (out["n_chars_qnorm"] == out["n_chars"]).all()


def test_quantile_normalize_maps_shifted_source_onto_global(ray_session):
    """A source whose values sit at the bottom of the global range is
    pulled up toward the global distribution."""
    from lasutility_ray.stages.qnorm import quantile_normalize

    docs = pd.DataFrame(
        {
            "doc_id": range(8),
            "source": ["lo"] * 4 + ["hi"] * 4,
            "n_chars": [1, 2, 3, 4, 101, 102, 103, 104],
        }
    )
    out = (
        quantile_normalize(rd.from_pandas(docs))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # lo's rank-4/4 (value 4) -> global rank ceil(4*8/4)=8 -> 104
    assert out.loc[3, "n_chars_qnorm"] == 104
    # lo's rank-1/4 (value 1) -> global rank ceil(1*8/4)=2 -> 2
    assert out.loc[0, "n_chars_qnorm"] == 2


# ------------------------------------------------------------- DEM slope


def test_dem_slope_matches_duckdb(ray_session):
    df = _match("q_dem_slope", tables=("documents",))
    assert len(df) >= 50
    assert (df["max_dz_cm"] >= 0).all()
    assert (df["max_dz_cm"] < 100000).all()


def test_dem_slope_kernel_hand_case(ray_session):
    from lasutility_ray.stages.demslope import slope_frame

    df = pd.DataFrame(
        {
            # (0,0)=100 and (0,1)=400 are rook neighbors; (5,5) and
            # (7,7) are isolated; (5,6)=50 neighbors (5,5)=77
            "ci": np.array([0, 0, 5, 5, 7], np.int64),
            "cj": np.array([0, 1, 5, 6, 7], np.int64),
            "z_cm": np.array([100, 400, 77, 50, 9], np.int64),
        }
    )
    out = slope_frame(df).set_index(["ci", "cj"])
    assert out.loc[(0, 0), "max_dz_cm"] == 300
    assert out.loc[(0, 1), "max_dz_cm"] == 300
    assert out.loc[(5, 5), "max_dz_cm"] == 27
    assert out.loc[(5, 6), "max_dz_cm"] == 27
    # the isolated cell is dropped, diagonals don't count
    assert (7, 7) not in out.index
    assert len(out) == 4
