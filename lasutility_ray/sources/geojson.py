"""GeoJSON feature source/sink (stdlib json — no geo libraries).

The engine's polygon tables (``corpus/polygons.build_feature_table``
schema, consumed by the PIP-join/burn stages) gain a second
interchange format next to the from-scratch shapefile reader
(``sources/shapefile.py``): RFC 7946 FeatureCollections with Polygon
/ MultiPolygon / LineString / MultiLineString geometries (2D, holes
supported). Coordinates round trip exactly: python floats are IEEE
doubles and ``json`` prints shortest-repr, which parses back to the
identical double.

Reference parity note: the reference reads polygons only from
shapefiles (``NLS/Shapefile.cs``); GeoJSON is an engine addition for
pipelines whose features arrive as web data.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from ..geom.wkbgeom import (
    LineString,
    MultiLineString,
    MultiPolygon,
    Polygon,
    from_wkb,
    to_wkb,
)

def _ring(coords) -> np.ndarray:
    r = np.asarray(coords, dtype=np.float64)
    if r.ndim != 2 or r.shape[1] != 2:
        raise ValueError("GeoJSON rings must be 2-D [x, y] positions")
    if not np.isfinite(r).all():
        # RFC 7946 JSON cannot represent NaN/Infinity; reject rather
        # than emit/accept non-compliant documents
        raise ValueError("GeoJSON coordinates must be finite")
    return r


def _geom_from_geojson(g: dict):
    t = g.get("type")
    c = g.get("coordinates")
    if t == "Polygon":
        return Polygon(_ring(c[0]), [_ring(r) for r in c[1:]])
    if t == "MultiPolygon":
        return MultiPolygon(
            [Polygon(_ring(p[0]), [_ring(r) for r in p[1:]]) for p in c]
        )
    if t == "LineString":
        return LineString(_ring(c))
    if t == "MultiLineString":
        return MultiLineString([LineString(_ring(p)) for p in c])
    raise NotImplementedError(
        f"GeoJSON geometry {t!r} not supported (the engine rasterises "
        "Polygon/MultiPolygon/LineString/MultiLineString)"
    )


def _geom_to_geojson(geom) -> dict:
    if isinstance(geom, Polygon):
        return {
            "type": "Polygon",
            "coordinates": [geom.exterior.tolist()]
            + [r.tolist() for r in geom.interiors],
        }
    if isinstance(geom, MultiPolygon):
        return {
            "type": "MultiPolygon",
            "coordinates": [
                [p.exterior.tolist()] + [r.tolist() for r in p.interiors]
                for p in geom.parts
            ],
        }
    if isinstance(geom, LineString):
        return {"type": "LineString", "coordinates": geom.coords.tolist()}
    if isinstance(geom, MultiLineString):
        return {
            "type": "MultiLineString",
            "coordinates": [p.coords.tolist() for p in geom.parts],
        }
    raise NotImplementedError(f"geometry {type(geom).__name__}")


def read_geojson(src: str, luokka_key: str = "luokka", source: str = "geojson") -> pa.Table:
    """FeatureCollection (path or JSON string) -> the engine's feature
    table (feature_id, kind, geom_wkb, luokka, source, feature_seq,
    envelope columns) — directly consumable by ``rect_pip_join`` /
    ``polygon_pip_join`` / ``burned_tiles``."""
    if src.lstrip().startswith("{"):
        doc = json.loads(src)
    else:
        with open(src, "r", encoding="utf-8") as f:
            doc = json.load(f)
    if doc.get("type") != "FeatureCollection":
        raise ValueError("expected a GeoJSON FeatureCollection")
    rows = {
        "feature_id": [], "kind": [], "geom_wkb": [], "luokka": [],
        "source": [], "feature_seq": [], "min_x": [], "min_y": [],
        "max_x": [], "max_y": [],
    }
    for i, feat in enumerate(doc.get("features", [])):
        if feat.get("type") != "Feature":
            raise ValueError(f"features[{i}] is not a Feature")
        geom = _geom_from_geojson(feat.get("geometry") or {})
        props = feat.get("properties") or {}
        env = geom.envelope
        rows["feature_id"].append(i)
        rows["kind"].append(_KINDS_BY_CLS[type(geom).__name__])
        rows["geom_wkb"].append(to_wkb(geom))
        rows["luokka"].append(int(props.get(luokka_key, 0)))
        rows["source"].append(str(props.get("source", source)))
        rows["feature_seq"].append(int(props.get("feature_seq", i)))
        rows["min_x"].append(float(env[0]))
        rows["min_y"].append(float(env[1]))
        rows["max_x"].append(float(env[2]))
        rows["max_y"].append(float(env[3]))
    return pa.table(
        {
            "feature_id": pa.array(rows["feature_id"], pa.int64()),
            "kind": pa.array(rows["kind"], pa.string()),
            "geom_wkb": pa.array(rows["geom_wkb"], pa.binary()),
            "luokka": pa.array(rows["luokka"], pa.int32()),
            "source": pa.array(rows["source"], pa.string()),
            "feature_seq": pa.array(rows["feature_seq"], pa.int64()),
            "min_x": pa.array(rows["min_x"], pa.float64()),
            "min_y": pa.array(rows["min_y"], pa.float64()),
            "max_x": pa.array(rows["max_x"], pa.float64()),
            "max_y": pa.array(rows["max_y"], pa.float64()),
        }
    )


_KINDS_BY_CLS = {
    "Polygon": "polygon",
    "MultiPolygon": "multipolygon",
    "LineString": "line",
    "MultiLineString": "multiline",
}


def feature_table_to_geojson(table: pa.Table, luokka_key: str = "luokka") -> str:
    """Feature table -> FeatureCollection JSON string (inverse of
    :func:`read_geojson`; coordinates round trip bit-exact)."""
    feats = []
    for i in range(table.num_rows):
        geom = from_wkb(table.column("geom_wkb")[i].as_py())
        feats.append(
            {
                "type": "Feature",
                "geometry": _geom_to_geojson(geom),
                "properties": {
                    luokka_key: int(table.column("luokka")[i].as_py()),
                    "source": table.column("source")[i].as_py(),
                    "feature_seq": int(table.column("feature_seq")[i].as_py()),
                },
            }
        )
    return json.dumps({"type": "FeatureCollection", "features": feats})
