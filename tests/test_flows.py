"""End-to-end reference flows (pipelines/flows.py, SURVEY.md §3)."""

import numpy as np

import ray.data as rd

from lasutility_ray.corpus.polygons import build_feature_table
from lasutility_ray.pipelines.flows import (
    flow_a_tin_export,
    flow_b_rasterise,
    flow_c_reload,
    flow_c_voxel_snapshot,
)
from lasutility_ray.stages.tiling import points_dataset

SF_DIR = "/root/testdata/sf0.001"


def _points():
    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    return points_dataset(docs)


def test_flow_a(ray_session, tmp_path):
    out = flow_a_tin_export(_points(), str(tmp_path / "tris"))
    df = out.to_pandas()
    assert len(df) > 0
    assert set(df.columns) == {"tile_id", "tri_id", "wkb"}
    assert df["wkb"].map(lambda b: b[:5] == b"\x01\xeb\x03\x00\x00").all()  # PolygonZ LE


def test_flow_b(ray_session, tmp_path):
    man = flow_b_rasterise(build_feature_table(), str(tmp_path / "asp")).to_pandas()
    assert len(man) > 0
    assert man["path"].map(lambda p: p.endswith(".asp")).all()
    with open(man["path"].iloc[0]) as f:
        head = f.readline().split()
    assert head[0] == "ncols"


def test_flow_c_snapshot_and_reload(ray_session, tmp_path):
    out = str(tmp_path / "snap")
    man = flow_c_voxel_snapshot(_points(), out)
    tiles = flow_c_reload(out).to_pandas()
    assert len(tiles) == man.num_rows > 0
    # reloaded DEM blobs parse to 100x100 float32
    dem = np.frombuffer(tiles["dem"].iloc[0], dtype=np.float32)
    assert dem.shape == (10000,)
