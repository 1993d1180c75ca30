"""The reference's three end-to-end flows (SURVEY.md §3) as
composable Ray Data pipelines — the "switch your pipeline over"
surface: each mirrors one reference driver test.

Flow A  (Triangulation.Tests.cs:15-70, LAZ -> TIN -> Shapefile):
    points -> per-tile Delaunay -> one PolygonZ WKB row per triangle
    -> partitioned parquet (the shapefile-equivalent feature table).
Flow B  (RasteriserEvenOdd.Tests.cs:19-80, shapefiles -> .asp):
    polygon features -> tile explode + clip -> deterministic-order
    burn -> per-tile RLE .asp files + manifest.
Flow C  (VoxelGrid.Tests.cs:52-135, points -> voxel -> snapshot):
    points -> voxel/TIN/gap-fill per tile -> atomic per-tile parquet
    snapshot + lineage manifest (resume skips finished tiles) ->
    reload as a Dataset.
"""

from __future__ import annotations

import ray.data as rd


def flow_a_tin_export(points_ds, out_dir: str):
    """points -> triangle feature table on disk; returns the written
    Dataset (tile_id, tri_id, wkb)."""
    from ..stages.tin import tin_triangles

    tris = tin_triangles(points_ds)
    tris.write_parquet(out_dir)
    return rd.read_parquet(out_dir)


def flow_b_rasterise(feature_table, out_dir: str, compressed: bool = True):
    """features -> burned per-tile byte rasters -> .asp/.asc files.
    Returns the sink manifest Dataset (tile_id, path, n_bytes, md5)."""
    from ..sources import write_burned_tiles_ascii
    from ..stages.pip_join import burned_tiles, explode_features_to_tiles

    feats = explode_features_to_tiles(feature_table)
    tiles = burned_tiles(rd.from_arrow(feats))
    return write_burned_tiles_ascii(tiles, out_dir, compressed=compressed)


def flow_c_voxel_snapshot(points_ds, out_dir: str):
    """points -> checkpointed voxel/TIN tiles (atomic snapshot per
    tile + manifest; resumable). Returns the manifest table."""
    from ..state import resumable_tin_tiles

    return resumable_tin_tiles(points_ds, out_dir)


def flow_c_reload(out_dir: str):
    """Snapshot load (S13): the committed tiles as a Dataset."""
    import os

    return rd.read_parquet(os.path.join(out_dir, "tiles"))
