"""Even-odd scanline fill conformance — the exact cell-by-cell
triangle fixture from ``MathUtils.Tests.cs:15-55`` plus hole
semantics from ``RasteriserEvenOdd.cs:103-148``."""

import numpy as np

from lasutility_ray.geom.bounds import RasterBounds
from lasutility_ray.geom.fill import burn_polygon_with_holes, fill_polygon


def make_raster(bounds):
    return np.zeros((bounds.n_rows, bounds.n_cols), dtype=np.uint8)


def test_triangle_fill_exact_cells():
    # 10x10 grid over [10,20)^2; triangle (15,15)-(19,15)-(19,19)
    # fills exactly proj y=16: x{16,17,18}; y=17: x{17,18}; y=18: x{18}
    # (MathUtils.Tests.cs:31-52) — cell index = coord - 10.
    b = RasterBounds(10, 10, 10.0, 10.0, 20.0, 20.0)
    r = make_raster(b)
    ring = np.array(
        [[15, 15], [19, 15], [19, 19], [15, 15]], dtype=np.float64
    )
    fill_polygon(b, r, 7, ring)
    expected = set()
    for row, cols in [(6, (6, 7, 8)), (7, (7, 8)), (8, (8,))]:
        for c in cols:
            expected.add((row, c))
    got = {(int(i), int(j)) for i, j in zip(*np.nonzero(r))}
    assert got == expected


def test_rectangle_fill_half_open():
    b = RasterBounds(10, 10, 0.0, 0.0, 10.0, 10.0)
    r = make_raster(b)
    ring = np.array([[2, 2], [6, 2], [6, 6], [2, 6], [2, 2]], dtype=np.float64)
    fill_polygon(b, r, 9, ring)
    got = {(int(i), int(j)) for i, j in zip(*np.nonzero(r))}
    # Finley's asymmetric crossing rule (polyY[i] < y vs >= y,
    # MathUtils.cs:131) fills rows 3..6 and half-open cols [2, 6)
    assert got == {(i, j) for i in range(3, 7) for j in range(2, 6)}


def test_polygon_with_hole_preserves_underlying():
    b = RasterBounds(20, 20, 0.0, 0.0, 20.0, 20.0)
    r = make_raster(b)
    r[:, :] = 3  # pre-existing value everywhere
    exterior = np.array([[2, 2], [15, 2], [15, 15], [2, 15], [2, 2]], dtype=np.float64)
    hole = np.array([[6, 6], [10, 6], [10, 10], [6, 10], [6, 6]], dtype=np.float64)

    tmp = burn_polygon_with_holes(
        b, r, None, 9, exterior, [hole], env_rc_min=(2, 2), env_rc_max=(15, 15)
    )
    assert tmp is not None  # temp raster allocated for hole handling
    # inside the hole interior the original value survives
    assert r[8, 8] == 3
    # in the exterior-filled band the new value took over
    assert r[4, 4] == 9
    # outside the polygon untouched
    assert r[18, 18] == 3
    # the copy-back window is [min, max) per the reference's strict-<
    # loops (RasteriserEvenOdd.cs:134-136): inside it the temp raster
    # is reset; the envelope's max row may retain fill (reference quirk)
    assert (tmp[2:15, 2:15] == 0).all()


def test_fill_outside_bounds_raises():
    b = RasterBounds(10, 10, 0.0, 0.0, 10.0, 10.0)
    r = make_raster(b)
    ring = np.array([[2, 2], [12, 2], [12, 8], [2, 2]], dtype=np.float64)
    try:
        fill_polygon(b, r, 1, ring)
        raised = False
    except ValueError:
        raised = True
    assert raised  # "Polygon is larger than the bounds" (MathUtils.cs:96-97)
