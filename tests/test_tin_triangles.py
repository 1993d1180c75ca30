"""S11 triangle export (stages/tin.py tin_triangles): triangle SETS
per tile must equal a direct single-process triangulation of the same
tile's points (array order is library state, sets are the contract —
SURVEY.md §7.5)."""

import struct

import numpy as np

import ray.data as rd

from lasutility_ray.geom.bounds import RasterBounds
from lasutility_ray.geom.tilenamer import decode
from lasutility_ray.geom.triangulation import SurfaceTriangulation
from lasutility_ray.stages.tiling import CELL_SIZE_M, points_dataset
from lasutility_ray.stages.tin import tin_triangles

SF_DIR = "/root/testdata/sf0.01"


def _tri_set_from_wkb(wkbs):
    out = set()
    for b in wkbs:
        endian, typ, nrings, npts = struct.unpack_from("<BIII", b, 0)
        assert endian == 1 and typ == 1003 and nrings == 1 and npts == 4
        verts = struct.unpack_from("<" + "d" * 12, b, 13)
        tri = tuple(sorted((verts[0:3], verts[3:6], verts[6:9])))
        out.add(tri)
    return out


def test_triangle_sets_match_direct(ray_session):
    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    pts_ds = points_dataset(docs)
    got = tin_triangles(pts_ds).to_pandas()
    assert len(got) > 0

    pts = pts_ds.to_pandas()
    checked = 0
    for tid, g in got.groupby("tile_id"):
        sub = pts[pts["tile_id"] == tid]
        if len(sub) < 3:
            continue
        bounds = RasterBounds.for_tile(decode(tid), CELL_SIZE_M)
        tri = SurfaceTriangulation(bounds)
        tri.set_points(
            sub["x"].to_numpy(),
            sub["y"].to_numpy(),
            sub["z"].to_numpy(),
            sub["classification"].to_numpy(),
        )
        try:
            tri.create()
        except ValueError:
            continue
        tx, ty, tz = tri.triangles_xyz()
        want = set()
        for i in range(len(tx)):
            want.add(
                tuple(
                    sorted(
                        (
                            (tx[i][0], ty[i][0], tz[i][0]),
                            (tx[i][1], ty[i][1], tz[i][1]),
                            (tx[i][2], ty[i][2], tz[i][2]),
                        )
                    )
                )
            )
        have = _tri_set_from_wkb(g["wkb"])
        assert have == want, tid
        checked += 1
    assert checked >= 3  # enough multi-point tiles actually verified


def test_tri_ids_dense_per_tile(ray_session):
    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    got = tin_triangles(points_dataset(docs)).to_pandas()
    for tid, g in got.groupby("tile_id"):
        ids = np.sort(g["tri_id"].to_numpy())
        assert (ids == np.arange(len(ids))).all(), tid
