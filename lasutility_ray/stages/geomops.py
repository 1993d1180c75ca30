"""Per-feature geometry metrics over the WKB feature table — the
vector-side measurement operator every GIS engine ships (cf. the
reference's per-feature envelope/geometry handling in
`RasteriserEvenOdd.cs`): doubled signed area via the integer
shoelace, ring and vertex counts.

Exactness: the fixture's coordinates are integer meters stored as
float64, so 2x the shoelace sum is an exactly-representable integer
— emitted as ``area2`` (no division, no float error). Holes subtract.
The DuckDB oracle re-derives the expected metrics from the SAME
closed-form feature parameters the corpus builder uses
(`corpus/polygons.py`), so the test proves the WKB round trip + the
shoelace kernel end to end.

Shape: pure map (`map_batches` over the features Dataset); WKB
parsing is per-geometry by nature, but each ring's shoelace is one
vectorized numpy dot and the stage carries no state and no shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geom.wkbgeom import LineString, Polygon, from_wkb


def _ring_area2(ring: np.ndarray) -> int:
    """2x signed shoelace area of a closed ring (float64 holding
    integers -> exact)."""
    x, y = ring[:, 0], ring[:, 1]
    return int(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))


def polygon_metrics(features_ds):
    """features -> (feature_id, kind, luokka, area2, n_rings,
    n_vertices); polygons report |exterior| - sum|holes|, lines 0."""

    def metrics(t: pa.Table) -> pa.Table:
        fids = t.column("feature_id").to_numpy(zero_copy_only=False).astype(np.int64)
        kinds = t.column("kind").to_pylist()
        luokka = t.column("luokka").to_numpy(zero_copy_only=False).astype(np.int64)
        area2 = np.zeros(len(fids), np.int64)
        n_rings = np.zeros(len(fids), np.int64)
        n_vertices = np.zeros(len(fids), np.int64)
        for i, wkb in enumerate(t.column("geom_wkb").to_pylist()):
            g = from_wkb(wkb)
            if isinstance(g, Polygon):
                rings = [g.exterior] + list(g.interiors)
                area2[i] = abs(_ring_area2(rings[0])) - sum(
                    abs(_ring_area2(r)) for r in rings[1:]
                )
                n_rings[i] = len(rings)
                n_vertices[i] = sum(len(r) for r in rings)
            elif isinstance(g, LineString):
                n_vertices[i] = len(g.coords)
        return pa.table(
            {
                "feature_id": pa.array(fids),
                "kind": pa.array(kinds, pa.string()),
                "luokka": pa.array(luokka, pa.int64()),
                "area2": pa.array(area2, pa.int64()),
                "n_rings": pa.array(n_rings, pa.int64()),
                "n_vertices": pa.array(n_vertices, pa.int64()),
            }
        )

    return features_ds.map_batches(metrics, batch_format="pyarrow")


def zonal_stats(points_ds, feature_table):
    """Zonal statistics — per-polygon aggregates of the z channel
    over the points each feature contains (the raster-zonal-stats GIS
    primitive on the engine's point stream): PIP join with the
    broadcast polygon index (`pip_join.polygon_pip_join`), z recovered
    as exact integer CENTIMETERS from the geocoder hash (z =
    (h1 % 100000) / 100, so z_centi = h1 % 100000), then ONE
    feature_id groupby with n/sum/min/max integer aggregates."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from ..corpus.geocode import H1_MUL, M32
    from .pip_join import polygon_pip_join

    joined = polygon_pip_join(points_ds, feature_table)

    def add_z(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        z_centi = (did * H1_MUL) % M32 % 100000
        return pa.table(
            {
                "feature_id": t.column("feature_id").cast(pa.int64()),
                "z_centi": pa.array(z_centi.astype(np.int64)),
            }
        )

    return (
        joined.map_batches(add_z, batch_format="pyarrow")
        .groupby("feature_id")
        .aggregate(
            Count(alias_name="n_points"),
            Sum("z_centi", alias_name="sum_z_centi"),
            Min("z_centi", alias_name="min_z_centi"),
            Max("z_centi", alias_name="max_z_centi"),
        )
    )


def polygon_metrics_sql() -> str:
    """Closed-form expected metrics from the corpus parameters —
    proving the WKB + shoelace path against construction truth."""
    from ..corpus.nls import BUILDING_POLYGON, ROAD_LINE, WATER_POLYGON
    from ..corpus.polygons import N_HOLED, N_LINES, N_RECTS, N_URBAN_START

    bcodes = ", ".join(str(c) for c in sorted(BUILDING_POLYGON))
    wcodes = ", ".join(str(c) for c in sorted(WATER_POLYGON))
    rcodes = ", ".join(str(c) for c in sorted(ROAD_LINE))
    nb = len(BUILDING_POLYGON)
    nw = len(WATER_POLYGON)
    nr = len(ROAD_LINE)
    return (
        "WITH pm_rect AS (SELECT k AS feature_id, 'rect' AS kind, "
        f"[{bcodes}][CAST(k % {nb} AS INT) + 1] AS luokka, "
        f"2 * (CASE WHEN k >= {N_URBAN_START} THEN 200 ELSE 20 + k % 60 END) "
        f"* (CASE WHEN k >= {N_URBAN_START} THEN 200 ELSE 20 + (k * 7) % 60 END) "
        "AS area2, 1 AS n_rings, 5 AS n_vertices "
        f"FROM (SELECT unnest(range({N_RECTS})) AS k)), "
        f"pm_holed AS (SELECT {N_RECTS} + k AS feature_id, 'holed' AS kind, "
        f"[{wcodes}][CAST(k % {nw} AS INT) + 1] AS luokka, "
        "2 * ((2 * half) * (2 * half) - (2 * (half // 3)) * (2 * (half // 3))) "
        "AS area2, 2 AS n_rings, 10 AS n_vertices FROM ("
        f"SELECT k, 200 + (k * 37) % 300 AS half "
        f"FROM (SELECT unnest(range({N_HOLED})) AS k))), "
        f"pm_line AS (SELECT {N_RECTS + N_HOLED} + k AS feature_id, "
        f"'line' AS kind, [{rcodes}][CAST(k % {nr} AS INT) + 1] AS luokka, "
        "0 AS area2, 0 AS n_rings, 3 AS n_vertices "
        f"FROM (SELECT unnest(range({N_LINES})) AS k)) "
        "SELECT feature_id, kind, CAST(luokka AS BIGINT) AS luokka, "
        "CAST(area2 AS BIGINT) AS area2, CAST(n_rings AS BIGINT) AS n_rings, "
        "CAST(n_vertices AS BIGINT) AS n_vertices "
        "FROM (SELECT * FROM pm_rect UNION ALL SELECT * FROM pm_holed "
        "UNION ALL SELECT * FROM pm_line)"
    )
