"""Half-open bounds semantics (HeightMap.Tests.cs:17-53 analogue),
RLE codec roundtrip (ByteRaster.cs:94-122), and the 4-connected line
walk (MathUtils.cs:18-87)."""

import numpy as np
import pytest

from lasutility_ray.geom.bounds import EPSILON, RasterBounds
from lasutility_ray.geom.lines import line_cells, line_cells_ref
from lasutility_ray.geom.rle import rle_decode_row, rle_encode_row


class TestBounds:
    def test_half_open_max_edge(self):
        b = RasterBounds(10, 10, 10.0, 20.0, 20.0, 30.0)
        # max coordinate is OUTSIDE
        _, _, valid = b.proj_to_cell(20.0, 25.0)
        assert not valid
        _, _, valid = b.proj_to_cell(15.0, 30.0)
        assert not valid
        # max - small epsilon is the last cell
        r, c, valid = b.proj_to_cell(20.0 - 1e-4, 30.0 - 1e-4)
        assert valid and r == 9 and c == 9
        # min edge is inside
        r, c, valid = b.proj_to_cell(10.0, 20.0)
        assert valid and r == 0 and c == 0

    def test_cell_bottom_left_and_top_right(self):
        b = RasterBounds(10, 10, 10.0, 20.0, 20.0, 30.0)
        x, y = b.cell_bottom_left(0, 0)
        assert (x, y) == (10.0, 20.0)
        x, y = b.cell_top_right(9, 9)
        assert (x, y) == (20.0, 30.0)
        with pytest.raises(ValueError):
            b.cell_bottom_left(10, 0)

    def test_invalid_bounds_raise(self):
        with pytest.raises(ValueError):
            RasterBounds(1, 1, 5.0, 0.0, 5.0, 1.0)

    def test_non_metric_cells(self):
        # cellsize != 1 (HeightMap.Tests.cs:207-282 analogue)
        b = RasterBounds(4, 8, 0.0, 0.0, 4.0, 2.0)
        assert b.cell_width == 0.5
        assert b.cell_height == 0.5
        r, c, valid = b.proj_to_cell(3.99, 1.99)
        assert valid and r == 3 and c == 7

    def test_epsilon_constant(self):
        assert EPSILON == 1e-5


class TestRle:
    def test_encode_examples(self):
        assert rle_encode_row(np.array([0, 0, 0, 5, 5, 7], dtype=np.uint8)) == "3x0 2x5 1x7"
        assert rle_encode_row(np.array([9], dtype=np.uint8)) == "1x9"

    def test_roundtrip_random(self):
        rng = np.random.default_rng(3)
        for _ in range(20):
            row = rng.integers(0, 4, rng.integers(1, 200), dtype=np.uint8)
            assert np.array_equal(rle_decode_row(rle_encode_row(row), len(row)), row)

    def test_decode_validation(self):
        with pytest.raises(ValueError):
            rle_decode_row("3x0 bad", 3)
        with pytest.raises(ValueError):
            rle_decode_row("2x1", 3)


class TestLines:
    def test_matches_reference_walk(self):
        rng = np.random.default_rng(11)
        for _ in range(100):
            ax, ay, bx, by = rng.integers(-30, 30, 4)
            fast = line_cells(ax, ay, bx, by)
            ref = np.asarray(line_cells_ref(int(ax), int(ay), int(bx), int(by)))
            assert np.array_equal(fast, ref)

    def test_diagonal_is_perfect(self):
        cells = line_cells(0, 0, 4, 4)
        assert cells.tolist() == [[0, 0], [1, 1], [2, 2], [3, 3], [4, 4]]

    def test_four_connected_step_count(self):
        cells = line_cells(0, 0, 5, 2)
        # dx + dy + 1 cells, each step moves one axis
        assert len(cells) == 8
        d = np.abs(np.diff(cells, axis=0)).sum(axis=1)
        assert (d == 1).all()
