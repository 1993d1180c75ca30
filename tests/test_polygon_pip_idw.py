"""General polygon PIP join (even-odd + holes) vs a no-index oracle,
the PIP kernel itself, IDW vs DuckDB, and sliding windows."""

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

from lasutility_ray.corpus.geocode import sql_exprs
from lasutility_ray.corpus.polygons import build_feature_table
from lasutility_ray.geom.pip import points_in_polygon
from lasutility_ray.geom.wkbgeom import MultiPolygon, Polygon, from_wkb
from lasutility_ray.stages.idw import idw_join
from lasutility_ray.stages.pip_join import polygon_pip_join
from lasutility_ray.stages.tiling import points_dataset

SF_DIR = "/root/testdata/sf0.01"


def test_pip_kernel_concave_with_hole():
    # concave "L" with a square hole
    ext = np.array([[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4], [0, 0]], float)
    hole = np.array([[0.5, 0.5], [1.5, 0.5], [1.5, 1.5], [0.5, 1.5], [0.5, 0.5]], float)
    px = np.array([1.0, 3.0, 3.0, 1.75, 0.75, 2.5])
    py = np.array([3.0, 1.0, 3.0, 1.0, 0.75, 2.5])
    got = points_in_polygon(px, py, ext, [hole])
    #              in L-arm, in base, outside notch, beside hole, in hole, outside
    assert got.tolist() == [True, True, False, True, False, False]


def test_polygon_join_matches_bruteforce(ray_session):
    pts = points_dataset(
        rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    )
    feats = build_feature_table()
    got = (
        polygon_pip_join(pts, feats)
        .to_pandas()
        .sort_values(["doc_id", "feature_id"])
        .reset_index(drop=True)
    )

    pdf = pts.to_pandas()
    px = pdf["x"].to_numpy()
    py = pdf["y"].to_numpy()
    ids = pdf["doc_id"].to_numpy()
    rows = []
    for f in feats.to_pylist():
        geom = from_wkb(f["geom_wkb"])
        parts = (
            geom.parts
            if isinstance(geom, MultiPolygon)
            else [geom]
            if isinstance(geom, Polygon)
            else []
        )
        for p in parts:
            m = points_in_polygon(px, py, p.exterior, list(p.interiors))
            for d in ids[m]:
                rows.append((d, f["feature_id"], f["luokka"]))
    want = (
        pd.DataFrame(rows, columns=["doc_id", "feature_id", "luokka"])
        .sort_values(["doc_id", "feature_id"])
        .reset_index(drop=True)
    )
    want["luokka"] = want["luokka"].astype(got["luokka"].dtype)
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want)


def test_idw_matches_duckdb(ray_session):
    pts = points_dataset(
        rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    )
    got = (
        idw_join(pts, lambda ids: ids % 50 == 0)
        .to_pandas()
        .sort_values("q_doc_id")
        .reset_index(drop=True)
    )
    e = sql_exprs("doc_id")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = con.execute(
        f"WITH pts AS (SELECT doc_id, {e['x']} AS x, {e['y']} AS y, {e['z']} AS z "
        "FROM documents), "
        "qs AS (SELECT doc_id AS q_doc_id, x AS qx, y AS qy FROM pts WHERE doc_id % 50 = 0), "
        "scored AS (SELECT q.q_doc_id, p.z, "
        "(q.qx - p.x) * (q.qx - p.x) + (q.qy - p.y) * (q.qy - p.y) AS d2 "
        "FROM qs q JOIN pts p ON p.doc_id <> q.q_doc_id) "
        "SELECT q_doc_id, round(sum(z / d2) / sum(1.0 / d2), 6) AS idw_z, "
        "count(*) AS n_neighbors FROM scored WHERE d2 <= 250000.0 "
        "GROUP BY q_doc_id ORDER BY q_doc_id"
    ).df()
    assert len(got) == len(want) > 0
    assert (got["q_doc_id"].to_numpy() == want["q_doc_id"].to_numpy()).all()
    assert (got["n_neighbors"].to_numpy() == want["n_neighbors"].to_numpy()).all()
    assert np.allclose(got["idw_z"], want["idw_z"], atol=2e-6)


def test_sliding_windows_match_duckdb(ray_session):
    from lasutility_ray.stages.events import sliding_window

    ev = rd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id", "ts", "value"])
    got = (
        sliding_window(ev)
        .to_pandas()
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    want = con.execute(
        "WITH rep AS ("
        "SELECT user_id, (epoch_ms(ts) // 300000) * 300000 AS window_start, "
        "CAST(round(value * 100.0, 0) AS BIGINT) AS cents FROM events "
        "UNION ALL "
        "SELECT user_id, (epoch_ms(ts) // 300000) * 300000 - 300000, "
        "CAST(round(value * 100.0, 0) AS BIGINT) FROM events) "
        "SELECT user_id, window_start, count(*) AS n_events, "
        "CAST(sum(cents) AS BIGINT) AS sum_value_cents "
        "FROM rep GROUP BY user_id, window_start ORDER BY user_id, window_start"
    ).df()
    want = want.astype(got.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want)
