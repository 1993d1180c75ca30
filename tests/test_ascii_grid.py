"""ASCII grid (.asc/.asp) codec roundtrips + crop/window semantics
(ByteRaster.cs:27-87, 154-178, 181-284; HeightMap.Tests.cs)."""

import numpy as np

from lasutility_ray.geom.ascii_grid import ByteRaster, fmt_double, fmt_float32
from lasutility_ray.geom.bounds import RasterBounds


def sample_raster():
    b = RasterBounds(4, 5, 100.0, 200.0, 105.0, 204.0)
    r = ByteRaster(b)
    r.data[:] = np.arange(20, dtype=np.uint8).reshape(4, 5)
    return r


def test_header_format_exact():
    txt = sample_raster().to_ascii()
    lines = txt.splitlines()
    assert lines[0] == "ncols         5"
    assert lines[1] == "nrows         4"
    assert lines[2] == "xllcorner     100"
    assert lines[3] == "yllcorner     200"
    assert lines[4] == "cellsize      1"
    assert lines[5] == "NODATA_value  0"
    # rows top-down: first data line is grid row 3
    assert lines[6] == "15 16 17 18 19"
    assert lines[9] == "0 1 2 3 4"


def test_roundtrip_plain_and_compressed():
    r = sample_raster()
    back = ByteRaster.from_ascii_text(r.to_ascii(), compressed=False)
    assert np.array_equal(back.data, r.data)
    back2 = ByteRaster.from_ascii_text(r.to_ascii(compressed=True), compressed=True)
    assert np.array_equal(back2.data, r.data)
    assert back.bounds == r.bounds


def test_crop():
    r = sample_raster()
    c = r.crop(101, 201, 104, 203)
    assert c.bounds.n_rows == 2 and c.bounds.n_cols == 3
    # crop keeps values from rows 1..2, cols 1..3
    assert np.array_equal(c.data, r.data[1:3, 1:4])


def test_window_write_matches_crop():
    r = sample_raster()
    windowed = r.to_ascii(window=(101, 201, 104, 203))
    cropped = r.crop(101, 201, 104, 203).to_ascii()
    assert windowed == cropped


def test_get_value_nodata_and_oob():
    r = sample_raster()
    assert np.isnan(r.get_value(100.5, 200.5))  # value 0 == NoData
    assert r.get_value(101.5, 200.5) == 1.0
    assert np.isnan(r.get_value(105.0, 200.5))  # max edge outside
    vals = r.get_value(np.array([101.5, 105.0]), np.array([200.5, 200.5]))
    assert vals[0] == 1.0 and np.isnan(vals[1])


def test_fmt_helpers():
    assert fmt_double(12000.0) == "12000"
    assert fmt_double(0.5) == "0.5"
    assert fmt_double(-9999.0) == "-9999"
    assert fmt_float32(np.float32(100.0)) == "100"
    assert fmt_float32(np.float32(1.5)) == "1.5"
