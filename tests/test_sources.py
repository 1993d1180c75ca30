"""Ray-layer ASCII-grid tile sink/source round trip
(lasutility_ray/sources/ascii_tiles.py)."""

import numpy as np
import pytest

import ray.data as rd

from lasutility_ray.corpus.polygons import build_feature_table
from lasutility_ray.sources import (
    read_ascii_tiles,
    write_burned_tiles_ascii,
    write_dem_tiles_ascii,
)
from lasutility_ray.stages.pip_join import burned_tiles, explode_features_to_tiles
from lasutility_ray.stages.tiling import points_dataset
from lasutility_ray.stages.tin import tin_tiles

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def burned(ray_session):
    feats = explode_features_to_tiles(build_feature_table())
    return burned_tiles(rd.from_arrow(feats)).materialize()


@pytest.mark.parametrize("compressed", [False, True])
def test_burned_roundtrip(burned, tmp_path, compressed):
    out = str(tmp_path / ("asp" if compressed else "asc"))
    manifest = write_burned_tiles_ascii(burned, out, compressed=compressed)
    n_tiles = burned.count()
    assert manifest.count() == n_tiles
    for row in manifest.take_all():
        assert row["n_bytes"] > 0 and len(row["md5"]) == 32

    back = read_ascii_tiles(out).to_pandas().set_index("tile_id")
    orig = burned.to_pandas().set_index("tile_id")
    assert sorted(back.index) == sorted(orig.index)
    for tid in orig.index:
        a = np.frombuffer(orig.loc[tid, "raster"], dtype=np.uint8)
        b = np.frombuffer(back.loc[tid, "raster"], dtype=np.uint8)
        assert (a == b).all(), tid
        assert back.loc[tid, "n_rows"] == 1000
        assert back.loc[tid, "cell_size"] == 1.0


def test_dem_export(ray_session, tmp_path):
    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    tiles = tin_tiles(points_dataset(docs), include_rasters=True)
    out = str(tmp_path / "dem")
    manifest = write_dem_tiles_ascii(tiles, out)
    rows = manifest.take_all()
    assert len(rows) > 0
    # WriteDemAsAscii format: 6-line header, top-down rows, NODATA -999
    with open(rows[0]["path"]) as f:
        text = f.read()
    lines = text.splitlines()
    assert lines[0].split() == ["ncols", "100"]
    assert lines[1].split() == ["nrows", "100"]
    assert lines[5].split()[0] == "NODATA_value"
    assert len(lines) == 6 + 100


def test_png_source_roundtrip(burned, tmp_path):
    from lasutility_ray.sources import read_png_tiles, write_burned_tiles_png

    out = str(tmp_path / "pngsrc")
    write_burned_tiles_png(burned, out)
    back = read_png_tiles(out).to_pandas().set_index("tile_id")
    orig = burned.to_pandas().set_index("tile_id")
    assert sorted(back.index) == sorted(orig.index)
    for tid in orig.index:
        a = np.frombuffer(orig.loc[tid, "raster"], dtype=np.uint8)
        b = np.frombuffer(back.loc[tid, "raster"], dtype=np.uint8)
        assert (a == b).all(), tid
