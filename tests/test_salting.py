"""Skew salting (stages/salting.py): salted output must equal the
unsalted per-tile output on the skewed urban fixture (SURVEY.md §7.5
calls this test mandatory)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from lasutility_ray.corpus.geocode import geocode
from lasutility_ray.geom.tilenamer import encode
from lasutility_ray.stages.salting import (
    salt_levels,
    salted_tin_tiles,
    tile_count_partials,
)
from lasutility_ray.stages.tiling import points_dataset
from lasutility_ray.stages.tin import tin_tiles

N_DOCS = 60_000  # urban tiles get ~4.5k points each at 30% skew


def _points():
    return points_dataset(rd.range(N_DOCS), doc_col="id")


def test_count_pass_and_levels(ray_session):
    counts = tile_count_partials(_points())
    doc_id = np.arange(N_DOCS)
    x, y, *_ = geocode(doc_id)
    expect = pd.Series(encode(x, y, 1000)).value_counts()
    assert counts == expect.to_dict()

    levels = salt_levels(counts, threshold=3000)
    # exactly the 4 urban tiles are hot at this threshold (two at ~6k, two at ~3k points)
    assert len(levels) == 4
    assert all(lv >= 1 for lv in levels.values())


@pytest.mark.parametrize("build", ["merge", "once"])
def test_salted_equals_unsalted(ray_session, build):
    pts = _points()
    plain = (
        tin_tiles(pts, include_rasters=True)
        .to_pandas()
        .set_index("tile_id")
        .sort_index()
    )
    salted = (
        salted_tin_tiles(pts, threshold=3000, include_rasters=True, build=build)
        .to_pandas()
        .set_index("tile_id")
        .sort_index()
    )
    assert list(plain.index) == list(salted.index)

    counts = tile_count_partials(pts)
    hot = set(salt_levels(counts, threshold=3000))
    assert hot  # fixture must actually exercise the split path

    for tid in plain.index:
        p = plain.loc[tid]
        s = salted.loc[tid]
        assert p["n_points"] == s["n_points"], tid
        assert p["n_ground"] == s["n_ground"], tid
        assert p["missing_before"] == s["missing_before"], tid
        assert p["missing_after"] == s["missing_after"], tid
        pd_dem = np.frombuffer(p["dem"], dtype=np.float32)
        sd_dem = np.frombuffer(s["dem"], dtype=np.float32)
        # bit-identical DEM: same containing triangle per cell corner
        # (halo covers local triangle edges in dense tiles)
        neq = ~(
            (pd_dem == sd_dem) | (np.isnan(pd_dem) & np.isnan(sd_dem))
        )
        assert not neq.any(), f"{tid}: {neq.sum()} DEM cells differ"
        pc = np.frombuffer(p["classification_raster"], dtype=np.uint8)
        sc = np.frombuffer(s["classification_raster"], dtype=np.uint8)
        assert (pc == sc).all(), f"{tid}: classification raster differs"

    # build-once exact mode: ONE full-tile TIN per hot tile, so
    # n_triangles is the exact unsalted count everywhere (round 1's
    # replicate-build summed n_windows copies)
    for tid in plain.index:
        assert (
            plain.loc[tid, "n_triangles"] == salted.loc[tid, "n_triangles"]
        ), tid


def test_halo_mode_bounded_difference(ray_session):
    """Halo mode (the 100 TB path for extreme tiles) is bit-identical
    except at convex-hull sliver triangles near tile borders; bound
    the deviation on the skewed fixture."""
    pts = _points()
    plain = (
        tin_tiles(pts, include_rasters=True)
        .to_pandas()
        .set_index("tile_id")
        .sort_index()
    )
    salted = (
        salted_tin_tiles(
            pts, threshold=3000, halo_m=100.0, include_rasters=True, exact=False
        )
        .to_pandas()
        .set_index("tile_id")
        .sort_index()
    )
    assert list(plain.index) == list(salted.index)
    total = bad = 0
    for tid in plain.index:
        pd_dem = np.frombuffer(plain.loc[tid, "dem"], dtype=np.float32)
        sd_dem = np.frombuffer(salted.loc[tid, "dem"], dtype=np.float32)
        neq = ~((pd_dem == sd_dem) | (np.isnan(pd_dem) & np.isnan(sd_dem)))
        total += len(pd_dem)
        bad += int(neq.sum())
        assert plain.loc[tid, "n_points"] == salted.loc[tid, "n_points"]
    assert bad / total < 0.005, f"halo mode deviates on {bad}/{total} cells"


def test_certified_halo_mode_is_exact(ray_session):
    """Certified halo mode (exact=False, certify=True): every cell is
    either proven exact by the Delaunay-locality certificate or its
    tile is recomputed through the build-once path — DEM and
    classification must be bit-identical to the unsalted output."""
    pts = _points()
    plain = (
        tin_tiles(pts, include_rasters=True)
        .to_pandas()
        .set_index("tile_id")
        .sort_index()
    )
    salted = (
        salted_tin_tiles(
            pts,
            threshold=3000,
            halo_m=30.0,
            include_rasters=True,
            exact=False,
            certify=True,
        )
        .to_pandas()
        .set_index("tile_id")
        .sort_index()
    )
    assert list(plain.index) == list(salted.index)
    assert "n_pending" not in salted.columns
    for tid in plain.index:
        pd_dem = np.frombuffer(plain.loc[tid, "dem"], dtype=np.float32)
        sd_dem = np.frombuffer(salted.loc[tid, "dem"], dtype=np.float32)
        neq = ~((pd_dem == sd_dem) | (np.isnan(pd_dem) & np.isnan(sd_dem)))
        assert not neq.any(), f"{tid}: {neq.sum()} certified DEM cells differ"
        pc = np.frombuffer(plain.loc[tid, "classification_raster"], dtype=np.uint8)
        sc = np.frombuffer(salted.loc[tid, "classification_raster"], dtype=np.uint8)
        assert (pc == sc).all(), f"{tid}: classification raster differs"
        assert plain.loc[tid, "n_points"] == salted.loc[tid, "n_points"]


def test_hull_primitives():
    from lasutility_ray.geom.hull import (
        combine_hulls,
        convex_hull_xy,
        strictly_outside_hull,
    )

    rng = np.random.default_rng(7)
    x = rng.uniform(0, 10, 500)
    y = rng.uniform(0, 10, 500)
    h = convex_hull_xy(x, y)
    # hull of partial hulls == hull of the whole set
    h2 = combine_hulls(
        [convex_hull_xy(x[:200], y[:200]), convex_hull_xy(x[200:], y[200:])]
    )
    assert np.array_equal(np.unique(h, axis=0), np.unique(h2, axis=0))
    # every input point is inside-or-on: never strictly outside
    assert not strictly_outside_hull(h, x, y).any()
    # far points are strictly outside
    assert strictly_outside_hull(h, np.array([20.0, -5.0]), np.array([20.0, -5.0])).all()
    # degenerate hulls certify nothing
    seg = np.array([[0.0, 0.0], [1.0, 1.0]])
    assert not strictly_outside_hull(seg, np.array([50.0]), np.array([50.0])).any()


def test_no_hot_tiles_falls_back(ray_session):
    pts = _points()
    out = salted_tin_tiles(pts, threshold=10**9, include_rasters=False)
    plain = tin_tiles(pts, include_rasters=False)
    a = out.to_pandas().sort_values("tile_id").reset_index(drop=True)
    b = plain.to_pandas().sort_values("tile_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_halo_doubling_certifies_more_tiles(ray_session):
    """Halo-doubling (round-3): a doubled halo strictly shrinks the
    uncertified tile set on the urban fixture (4 pending at 15 m -> 2
    at 30 m — the remaining two carry tile-spanning border-sliver
    circumdisks no local halo can certify and take the terminal
    build-once fallback). End-to-end certified output through the
    doubling rounds stays bit-identical to the unsalted path."""
    from lasutility_ray.stages.salting import halo_pass, tile_hulls

    pts = _points()
    counts = tile_count_partials(pts)
    levels = salt_levels(counts, threshold=3000, exact=False)
    hulls = tile_hulls(pts, levels)

    def pend_at(h):
        out = halo_pass(pts, levels, hulls, h, True)
        return sorted(
            r["tile_id"]
            for r in out.map_batches(
                lambda t: t.select(["tile_id", "n_pending"]),
                batch_format="pyarrow",
            ).take_all()
            if r["n_pending"] > 0
        )

    p15, p30 = pend_at(15.0), pend_at(30.0)
    assert p15, "fixture must stress the certificate at the small halo"
    assert set(p30) < set(p15), "doubling must certify strictly more tiles"

    plain = (
        tin_tiles(pts, include_rasters=True)
        .to_pandas()
        .set_index("tile_id")
        .sort_index()
    )
    salted = (
        salted_tin_tiles(
            pts, threshold=3000, halo_m=15.0, include_rasters=True,
            exact=False, certify=True,
        )
        .to_pandas()
        .set_index("tile_id")
        .sort_index()
    )
    assert list(plain.index) == list(salted.index)
    for tid in plain.index:
        pd_dem = np.frombuffer(plain.loc[tid, "dem"], dtype=np.float32)
        sd_dem = np.frombuffer(salted.loc[tid, "dem"], dtype=np.float32)
        neq = ~((pd_dem == sd_dem) | (np.isnan(pd_dem) & np.isnan(sd_dem)))
        assert not neq.any(), f"{tid}: {neq.sum()} DEM cells differ"
