"""GeoJSON feature source/sink: bit-exact round trip of the engine
feature table and PIP-join equivalence vs the native table."""

import numpy as np
import pytest

import ray.data as rd

from lasutility_ray.corpus.polygons import build_feature_table
from lasutility_ray.sources.geojson import feature_table_to_geojson, read_geojson
from lasutility_ray.stages.pip_join import polygon_pip_join
from lasutility_ray.stages.tiling import points_dataset

SF_DIR = "/root/testdata/sf0.001"


def test_geojson_roundtrip_bit_exact(tmp_path):
    feats = build_feature_table()
    text = feature_table_to_geojson(feats)
    p = tmp_path / "features.geojson"
    p.write_text(text, encoding="utf-8")
    back = read_geojson(str(p))

    assert back.num_rows == feats.num_rows
    # geometry bytes identical (coordinates survive the JSON round trip
    # exactly: shortest-repr double printing parses back bit-equal)
    assert back.column("geom_wkb").to_pylist() == feats.column("geom_wkb").to_pylist()
    for col in ("feature_id", "luokka", "source", "feature_seq",
                "min_x", "min_y", "max_x", "max_y"):
        assert back.column(col).to_pylist() == feats.column(col).to_pylist(), col
    # schema identical (types matter for the broadcast join path)
    assert back.schema.equals(feats.schema)


def test_geojson_feature_table_joins_identically(ray_session):
    feats = build_feature_table()
    back = read_geojson(feature_table_to_geojson(feats))
    pts = points_dataset(
        rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    )
    a = (
        polygon_pip_join(pts, feats)
        .to_pandas()
        .sort_values(["doc_id", "feature_id"])
        .reset_index(drop=True)
    )
    b = (
        polygon_pip_join(pts, back)
        .to_pandas()
        .sort_values(["doc_id", "feature_id"])
        .reset_index(drop=True)
    )
    # kind strings differ ("rect" -> "polygon") but join rows must not
    drop = [c for c in ("kind",) if c in a.columns]
    a = a.drop(columns=drop)
    b = b.drop(columns=drop)
    assert a.equals(b)


def test_geojson_rejects_non_feature_collection():
    with pytest.raises(ValueError):
        read_geojson('{"type": "Feature"}')


def test_geojson_unsupported_geometry():
    doc = (
        '{"type": "FeatureCollection", "features": [{"type": "Feature", '
        '"geometry": {"type": "Point", "coordinates": [1.0, 2.0]}, '
        '"properties": {}}]}'
    )
    with pytest.raises(NotImplementedError):
        read_geojson(doc)


def test_geojson_holes_survive():
    ext = [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]]
    hole = [[4.0, 4.0], [6.0, 4.0], [6.0, 6.0], [4.0, 6.0], [4.0, 4.0]]
    doc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "geometry": {"type": "Polygon", "coordinates": [ext, hole]},
                "properties": {"luokka": 7},
            }
        ],
    }
    import json

    t = read_geojson(json.dumps(doc))
    from lasutility_ray.geom.wkbgeom import from_wkb

    g = from_wkb(t.column("geom_wkb")[0].as_py())
    assert len(g.interiors) == 1
    assert np.array_equal(g.interiors[0], np.asarray(hole))
    assert t.column("luokka")[0].as_py() == 7


def test_non_finite_coordinates_rejected():
    doc = (
        '{"type": "FeatureCollection", "features": [{"type": "Feature", '
        '"geometry": {"type": "LineString", "coordinates": [[0.0, 0.0], '
        '[NaN, 1.0]]}, "properties": {}}]}'
    )
    with pytest.raises(ValueError):
        read_geojson(doc)
