"""S2 cell-id codec (geom/s2.py) + the s2tiles stage.

The codec is from scratch (no S2 library exists here), so the pins
are structural invariants that uniquely characterize the scheme:
leaf round-trips, Hilbert-curve adjacency continuity, hierarchy
containment, face chart orientation, and the generated DuckDB SQL
mirror agreeing bit-for-bit with the numpy path.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from lasutility_ray.geom import s2

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dirs():
    rng = np.random.default_rng(7)
    n = 20000
    x = rng.uniform(-1, 1, n)
    y = rng.uniform(-1, 1, n)
    z = rng.uniform(-1, 1, n)
    # axis points, the degenerate all-zero vector, an |x|==|y| tie,
    # and exact face-boundary diagonals
    x[:6] = [1, 0, 0, -1, 0, 0]
    y[:6] = [0, 1, 0, 0, -1, 0]
    z[:6] = [0, 0, 1, 0, 0, -1]
    x[6] = y[6] = z[6] = 0.0
    x[7] = y[7] = 1.0
    z[7] = 0.5
    x[8] = y[8] = z[8] = 1.0
    return x, y, z


def test_lookup_tables_are_inverse_permutations():
    for orient in range(4):
        idx = np.arange(256)
        fwd = s2.LOOKUP_POS[(idx << 2) + orient]
        back = s2.LOOKUP_IJ[((fwd >> 2) << 2) + orient]
        assert np.array_equal(back >> 2, idx)
        # orientation transitions agree between the two tables
        assert np.array_equal(fwd & 3, back & 3)


def test_leaf_roundtrip(dirs):
    x, y, z = dirs
    leaf = s2.xyz_to_cell(x, y, z, 30)
    assert np.all(s2.level(leaf) == 30)
    f, i, j = s2.cell_to_face_ij(leaf)
    pos = s2._hilbert_pos(f, i, j)
    re = (
        (f.astype(np.uint64) << np.uint64(61))
        | (pos.astype(np.uint64) << np.uint64(1))
        | np.uint64(1)
    )
    assert np.array_equal(re, leaf)


def test_axis_directions_hit_all_six_faces():
    f, u, v = s2.face_uv(
        np.array([1.0, 0, 0, -1, 0, 0]),
        np.array([0.0, 1, 0, 0, -1, 0]),
        np.array([0.0, 0, 1, 0, 0, -1]),
    )
    assert f.tolist() == [0, 1, 2, 3, 4, 5]
    # face centers project to (u, v) = (0, 0)
    assert np.all(u == 0) and np.all(v == 0)


def test_hilbert_curve_is_continuous():
    """Consecutive leaf positions differ by exactly one step in i or
    j — the defining property of the Hilbert order (and the locality
    the shuffle key relies on)."""
    for face in (0, 3):
        pos = np.arange(500000, 520000, dtype=np.int64)
        ids = (
            (np.uint64(face) << np.uint64(61))
            | (pos.astype(np.uint64) << np.uint64(1))
            | np.uint64(1)
        )
        _, i, j = s2.cell_to_face_ij(ids)
        step = np.abs(np.diff(i)) + np.abs(np.diff(j))
        assert np.all(step == 1)


def test_parent_containment_and_levels(dirs):
    x, y, z = dirs
    leaf = s2.xyz_to_cell(x, y, z, 30)
    for lvl in (0, 2, 7, 12, 29):
        p = s2.parent(leaf, lvl)
        assert np.all(s2.level(p) == lvl)
        assert np.all(s2.range_min(p) <= leaf)
        assert np.all(leaf <= s2.range_max(p))
        # direct encode at lvl == parent of leaf
        assert np.array_equal(s2.xyz_to_cell(x, y, z, lvl), p)
        assert np.array_equal(s2.face_of(p), s2.face_of(leaf))


def test_st_uv_inverse_and_area_balance():
    s = np.linspace(0.0, 1.0, 1001)
    assert np.allclose(s2.uv_to_st(s2.st_to_uv(s)), s, atol=1e-12)
    # quadratic transform keeps cell areas within ~2.1x of each other
    # (the published bound for the quadratic projection is ~2.08)
    u = s2.st_to_uv(s)
    widths = np.diff(u)
    assert widths.max() / widths.min() < 2.2


def test_center_roundtrip_lonlat():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 3000)
    lat = rng.uniform(-89.9, 89.9, 3000)
    for lvl in (4, 12, 20):
        c = s2.lonlat_to_cell(lon, lat, lvl)
        lo, la = s2.cell_to_lonlat(c)
        assert np.array_equal(s2.lonlat_to_cell(lo, la, lvl), c)


def test_token_roundtrip(dirs):
    x, y, z = dirs
    for lvl in (1, 13, 30):
        cells = s2.xyz_to_cell(x[:50], y[:50], z[:50], lvl)
        for c in cells.tolist():
            tok = s2.token(c)
            assert len(tok) <= 16
            assert s2.from_token(tok) == c


def test_sql_mirror_bit_exact(dirs):
    x, y, z = dirs
    con = duckdb.connect()
    con.register("dirs", pd.DataFrame({"k": np.arange(len(x)), "dx": x, "dy": y, "dz": z}))
    for lvl in (2, 5, 12, 30):
        got = (
            con.execute(
                f"WITH {s2.sql_ctes('dirs', level=lvl)} "
                "SELECT k, cell_id FROM s2out ORDER BY k"
            )
            .df()["cell_id"]
            .to_numpy()
        )
        want = s2.xyz_to_cell(x, y, z, lvl).view(np.int64)
        assert np.array_equal(got, want)


def test_s2_stage_queries_match_oracle(ray_session):
    sf_dir = SF
    import __ray_entry__ as E

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    qs, osql = E.queries(), E.oracle_sql()
    for name in ("q_s2_cell_counts", "q_s2_parent_rollup"):
        df = qs[name](sf_dir).to_pandas()
        odf = con.execute(osql[name]).df()
        cols = sorted(df.columns)
        a = df[cols].sort_values(cols).reset_index(drop=True)
        b = odf[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


def test_parent_rollup_conserves_docs(ray_session):
    sf_dir = SF
    import ray.data as rd

    from lasutility_ray.stages.s2tiles import s2_cell_counts, s2_parent_rollup

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    total = docs.count()
    lvl = s2_cell_counts(docs).to_pandas()
    par = s2_parent_rollup(docs).to_pandas()
    assert lvl["n_docs"].sum() == total == par["n_docs"].sum()
    # every face is populated and the rollup is strictly coarser
    assert set(lvl["face"]) == set(range(6))
    assert len(par) < len(lvl)


def test_range_select_matches_oracle_and_recompute(ray_session):
    import duckdb
    import ray.data as rd

    from lasutility_ray.stages import s2tiles

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    got = (
        s2tiles.s2_range_select(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = (
        con.execute(s2tiles.s2_range_select_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got[sorted(got.columns)], ref[sorted(ref.columns)])
    # range membership == hierarchy membership: parent at REGION_LEVEL
    # of every selected cell is exactly the region cell
    region = np.uint64(s2tiles.region_cell())
    cells = got["cell_id"].to_numpy().view(np.uint64)
    assert np.all(s2.parent(cells, s2tiles.REGION_LEVEL) == region)
    # and nothing outside was missed: recompute membership directly
    all_cells = s2tiles.s2_cell_counts(docs).to_pandas()
    inside = all_cells["cell_id"].to_numpy().view(np.uint64)
    inside = inside[s2.parent(inside, s2tiles.REGION_LEVEL) == region]
    assert int(all_cells.set_index("cell_id").loc[inside.view(np.int64)]["n_docs"].sum()) == len(got)


def test_cap_covering_whole_sphere_is_six_faces():
    cov = s2.cap_covering(np.array([1.0, 0.0, 0.0]), np.pi, max_level=8)
    assert len(cov) == 6
    assert sorted(s2.face_of(cov).tolist()) == [0, 1, 2, 3, 4, 5]


def test_cap_covering_no_false_negatives_and_prunes():
    rng = np.random.default_rng(23)
    n = 30000
    pts = rng.normal(size=(n, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    center = np.array([0.3, -0.5, 0.81])
    center /= np.linalg.norm(center)
    angle = 0.25
    cov = s2.cap_covering(center, angle, max_level=8)
    assert len(cov) > 4
    leaf = s2.xyz_to_cell(pts[:, 0], pts[:, 1], pts[:, 2], 30)
    lo = s2.range_min(cov)
    hi = s2.range_max(cov)
    idx = np.searchsorted(lo, leaf, side="right") - 1
    idx = np.clip(idx, 0, len(cov) - 1)
    in_cover = (leaf >= lo[idx]) & (leaf <= hi[idx])
    ang = np.arccos(np.clip(pts @ center, -1, 1))
    # every point inside the cap is covered (no false negatives)
    assert bool(np.all(in_cover[ang <= angle]))
    # covered points are within the cap plus one max-level cell
    # diameter of slack (conservative boundary cells only)
    max_diam = 2.0 * max(s2._cell_geometry(int(c))[1] for c in cov.tolist())
    assert float(ang[in_cover].max()) <= angle + max_diam
    # and the covering really prunes: most of the sphere is excluded
    assert in_cover.mean() < 0.05


def test_children_partition_parent():
    cell = int(s2.xyz_to_cell(np.array([0.4]), np.array([0.2]), np.array([0.9]), 7)[0])
    ch = s2.children(cell)
    assert len(ch) == 4
    lo = sorted(int(s2.range_min(np.uint64(c))) for c in ch)
    hi = sorted(int(s2.range_max(np.uint64(c))) for c in ch)
    assert lo[0] == int(s2.range_min(np.uint64(cell)))
    assert hi[-1] == int(s2.range_max(np.uint64(cell)))
    # disjoint quarters separated by exactly one non-cell id (leaf
    # ids have stride 2; the even id between child ranges is not a
    # valid cell)
    for a, b in zip(hi[:-1], lo[1:]):
        assert b == a + 2
    assert all(int(s2.level(np.array([np.uint64(c)]))[0]) == 8 for c in ch)
    # sampled leaves of the parent each fall in exactly one child range
    rng = np.random.default_rng(1)
    lo0 = int(s2.range_min(np.uint64(cell)))
    hi0 = int(s2.range_max(np.uint64(cell)))
    leaves = (lo0 + 2 * rng.integers(0, (hi0 - lo0) // 2 + 1, 5000)).astype(np.uint64)
    hits = sum(
        ((leaves >= s2.range_min(np.uint64(c))) & (leaves <= s2.range_max(np.uint64(c)))).sum()
        for c in ch
    )
    assert int(hits) == len(leaves)


def test_cap_join_matches_fullscan_oracle(ray_session):
    """The filter+refine cap join equals the prune-free full-scan SQL
    oracle — covering losslessness proven by equality."""
    import ray.data as rd

    from lasutility_ray.stages.s2tiles import s2_cap_join, s2_cap_join_sql

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    got = (
        s2_cap_join(docs)
        .to_pandas()
        .sort_values(["cap_id", "doc_id"])
        .reset_index(drop=True)
    )
    ref = (
        con.execute(s2_cap_join_sql())
        .df()
        .sort_values(["cap_id", "doc_id"])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got[sorted(got.columns)], ref[sorted(ref.columns)])


def test_s2_keyed_shuffle_reproduces_km_grid_tiling(ray_session):
    """North-rule phrasing pinned: the groupby-aggregate shuffle keyed
    by S2 cells reproduces the km-grid tile counts EXACTLY, and the
    coarse S2 bucket really co-locates multiple whole tiles."""
    import ray.data as rd

    from lasutility_ray.pipelines.flagship import documents_to_points
    from lasutility_ray.stages.tiling import s2_bucket_of_tiles, tile_counts_via_s2
    from lasutility_ray.stages.voxelize import tile_counts

    pts = documents_to_points(SF)
    direct = (
        tile_counts(pts).to_pandas().sort_values("tile_id").reset_index(drop=True)
    )
    via_s2 = (
        tile_counts_via_s2(pts)
        .to_pandas()
        .sort_values("tile_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(direct, via_s2)
    # bucket granularity: fewer buckets than tiles (whole tiles are
    # co-located), more than one bucket (it is a real partition key)
    xs = pts.to_pandas()
    buckets = s2_bucket_of_tiles(xs["x"].to_numpy(), xs["y"].to_numpy())
    n_buckets = len(np.unique(buckets))
    n_tiles = len(direct)
    assert 1 < n_buckets < n_tiles
