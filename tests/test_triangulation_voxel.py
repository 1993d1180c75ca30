"""TIN + voxel conformance — fixtures from Triangulation.Tests.cs
(flat plane, locked cells, classification metadata) and
VoxelGrid.Tests.cs (bin sorting, ground max, gap fill)."""

import numpy as np
import pytest

from lasutility_ray.geom.bounds import RasterBounds
from lasutility_ray.geom.triangulation import SurfaceTriangulation
from lasutility_ray.geom import voxel as vx


def flat_plane_tin():
    # 5x5 points at z=100 over [0,10)^2, class 2
    # (Triangulation.Tests.cs:91-113)
    b = RasterBounds(10, 10, 0.0, 0.0, 10.0, 10.0)
    tri = SurfaceTriangulation(b)
    g = np.arange(5) * 2.0  # 0,2,4,6,8
    xx, yy = np.meshgrid(g, g)
    tri.set_points(xx.ravel(), yy.ravel(), np.full(25, 100.0), np.full(25, 2, dtype=np.uint8))
    tri.create()
    return b, tri


class TestTin:
    def test_flat_plane_rasterize(self):
        b, tri = flat_plane_tin()
        dem = np.full((10, 10), np.nan, dtype=np.float32)
        cls = np.zeros((10, 10), dtype=np.uint8)
        tri.rasterise_dem(b, dem, classification_raster=cls)
        # all cells covered by the hull [0,8]^2 get exactly 100
        assert np.allclose(dem[:9, :9], 100.0)
        assert (cls[:9, :9] == 2).all()
        # cells beyond the hull stay NaN
        assert np.isnan(dem[9, 9])

    def test_locked_cells_not_overwritten(self):
        # Triangulation.Tests.cs:115-142
        b, tri = flat_plane_tin()
        dem = np.full((10, 10), np.nan, dtype=np.float32)
        dem[5, 5] = 999.0
        locked = np.zeros((10, 10), dtype=bool)
        locked[5, 5] = True
        tri.rasterise_dem(b, dem, locked_cells=locked)
        assert dem[5, 5] == 999.0
        assert np.allclose(dem[4, 4], 100.0)

    def test_point_query_interpolation(self):
        b, tri = flat_plane_tin()
        h, c = tri.get_value([1.0, 3.3, 7.9], [1.0, 2.2, 7.9])
        assert np.allclose(h, 100.0)
        assert (c == 2).all()

    def test_point_query_outside_hull_nan(self):
        b, tri = flat_plane_tin()
        h, c = tri.get_value([9.5], [9.5])
        assert np.isnan(h[0])
        assert c[0] == 0

    def test_sloped_plane_interpolates_linearly(self):
        b = RasterBounds(10, 10, 0.0, 0.0, 10.0, 10.0)
        tri = SurfaceTriangulation(b)
        rng = np.random.default_rng(5)
        x = rng.uniform(0, 9.9, 60)
        y = rng.uniform(0, 9.9, 60)
        z = 2.0 * x + 3.0 * y + 1.0  # exact plane
        tri.set_points(x, y, z, np.full(60, 4, dtype=np.uint8))
        tri.create()
        qx = rng.uniform(x.min(), x.max(), 20)
        qy = rng.uniform(y.min(), y.max(), 20)
        h, _ = tri.get_value(qx, qy)
        ok = ~np.isnan(h)
        assert ok.sum() >= 10
        assert np.allclose(h[ok], 2.0 * qx[ok] + 3.0 * qy[ok] + 1.0, atol=1e-8)

    def test_out_of_bounds_point_raises(self):
        b = RasterBounds(10, 10, 0.0, 0.0, 10.0, 10.0)
        tri = SurfaceTriangulation(b)
        with pytest.raises(ValueError):
            tri.set_points([5.0, 10.0], [5.0, 5.0], [1.0, 1.0], [2, 2])

    def test_triangle_count_and_export_payload(self):
        b, tri = flat_plane_tin()
        n = tri.triangle_count()
        assert n == 32  # 4x4 quads * 2 triangles for a 5x5 grid
        tx, ty, tz = tri.triangles_xyz()
        assert tx.shape == (32, 3)
        assert np.allclose(tz, 100.0)


class TestVoxel:
    def bounds(self):
        return RasterBounds(10, 10, 0.0, 0.0, 10.0, 10.0)

    def test_bins_sorted_desc(self):
        # VoxelGrid.Tests.cs:79-101: z {2.5, 5, 10} in one cell -> [10, 5, 2.5]
        t = vx.build_voxel_tile(
            self.bounds(),
            x=[1.5, 1.5, 1.5],
            y=[1.5, 1.5, 1.5],
            z=[2.5, 5.0, 10.0],
            classification=[4, 5, 6],
            is_ground=[False, False, False],
        )
        z, c = t.cell_points(1, 1)
        assert z.tolist() == [10.0, 5.0, 2.5]
        assert c.tolist() == [6, 5, 4]

    def test_ground_keeps_max(self):
        t = vx.build_voxel_tile(
            self.bounds(),
            x=[1.5, 1.5],
            y=[1.5, 1.5],
            z=[3.0, 7.0],
            classification=[2, 2],
            is_ground=[True, True],
        )
        assert t.dem[1, 1] == 7.0
        assert np.isnan(t.dem[0, 0])

    def test_edge_points_half_open(self):
        # VoxelGrid.Tests.cs:19-49 analogue: point at max edge dropped
        t = vx.build_voxel_tile(
            self.bounds(),
            x=[0.0, 10.0],
            y=[0.0, 5.0],
            z=[1.0, 2.0],
            classification=[2, 2],
            is_ground=[True, True],
        )
        assert t.dem[0, 0] == 1.0
        assert np.isnan(t.dem[5, 9])  # the (10.0, 5.0) point was outside

    def test_highest_in_class_range(self):
        t = vx.build_voxel_tile(
            self.bounds(),
            x=[1.5, 1.5, 1.5],
            y=[1.5, 1.5, 1.5],
            z=[2.5, 5.0, 10.0],
            classification=[4, 5, 6],
            is_ground=[False, False, False],
        )
        z, c = vx.highest_in_class_range(t, 4, 5)
        assert z[1, 1] == 5.0 and c[1, 1] == 5
        z, c = vx.highest_in_class_range(t, 4, 6)
        assert z[1, 1] == 10.0 and c[1, 1] == 6
        assert np.isnan(z[0, 0])

    def test_neighborhood_peak(self):
        xs = [1.5, 3.5, 5.5]
        t = vx.build_voxel_tile(
            self.bounds(),
            x=xs,
            y=[1.5, 1.5, 1.5],
            z=[5.0, 9.0, 4.0],
            classification=[4, 4, 4],
            is_ground=[False, False, False],
        )
        assert vx.is_highest_bin_in_neighborhood(t, 1, 3, 2, 4, 4)
        assert not vx.is_highest_bin_in_neighborhood(t, 1, 1, 2, 4, 4)
        peaks = vx.neighborhood_peaks(t, 2, 4, 4)
        assert peaks[1, 3]
        assert not peaks[1, 1]
        assert not peaks[0, 0]

    def test_gap_fill_from_tin(self):
        b, tri = flat_plane_tin.__wrapped__() if hasattr(flat_plane_tin, "__wrapped__") else flat_plane_tin()
        t = vx.build_voxel_tile(
            b, x=[0.5], y=[0.5], z=[50.0], classification=[2], is_ground=[True]
        )
        before, after = vx.fill_missing_from_tin(t, tri, 0, 0, 10, 10)
        assert before == 99  # all but (0,0) were NaN
        # cells inside hull got 100; outside-hull cells remain missing
        assert t.dem[4, 4] == 100.0
        assert t.dem[0, 0] == 50.0
        assert after == sum(
            1 for i in range(10) for j in range(10)
            if np.isnan(t.dem[i, j])
        )

    def test_ascii_exports(self):
        t = vx.build_voxel_tile(
            self.bounds(),
            x=[1.5], y=[1.5], z=[5.5], classification=[4], is_ground=[False],
        )
        txt = vx.save_highest_in_class_range_ascii(t, 4, 5)
        lines = txt.splitlines()
        assert lines[0] == "ncols         10"
        assert lines[2] == "xllcorner     0"
        assert lines[5] == "NODATA_value  -9999"
        # rows bottom-up: grid row 1 is text line 6+1
        assert lines[7].split()[1] == "5.5"
        dem_txt = vx.write_dem_ascii(t)
        assert "NODATA_value  -999" in dem_txt
