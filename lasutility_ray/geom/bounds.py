"""Georeferenced raster grid bounds with half-open extent.

Semantics match ``LasUtility/Common/RasterBounds.cs``:

- extent is half-open ``[min_x, max_x) x [min_y, max_y)``
  (``RasterBounds.cs:48``);
- ``EPSILON = 1e-5`` is subtracted by callers to address the max edge
  (``RasterBounds.cs:10``, used at ``ByteRaster.cs:56-57`` etc.);
- ``proj_to_cell`` floors ``(c - min) / cell_size`` and returns the
  out-of-bounds sentinel for coordinates outside the extent
  (``RasterBounds.cs:118-133``);
- cell (row, col) -> the cell's bottom-left corner coordinate
  (``RasterBounds.cs:90-101``).

Everything is vectorized over numpy arrays; rows/cols are int64 and
out-of-bounds entries are marked by a boolean mask (the reference's
``RcIndex.Empty`` sentinel becomes ``valid == False``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

EPSILON = 1e-5  # RasterBounds.cs:10


@dataclass(frozen=True)
class RasterBounds:
    n_rows: int
    n_cols: int
    min_x: float
    min_y: float
    max_x: float
    max_y: float

    def __post_init__(self):
        if self.min_x >= self.max_x or self.min_y >= self.max_y:
            raise ValueError("RasterBounds: Invalid bounds")

    @property
    def width(self) -> float:
        return self.max_x - self.min_x

    @property
    def height(self) -> float:
        return self.max_y - self.min_y

    @property
    def cell_width(self) -> float:
        return self.width / self.n_cols

    @property
    def cell_height(self) -> float:
        return self.height / self.n_rows

    # -- projections -------------------------------------------------

    def proj_to_cell(self, x, y):
        """Vectorized ProjToCell (RasterBounds.cs:118-133).

        Returns ``(rows, cols, valid)``; rows/cols are only meaningful
        where ``valid``. Uses C#'s ``(int)`` truncation — coordinates
        inside bounds are non-negative offsets so truncation == floor.
        """
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        valid = (x >= self.min_x) & (x < self.max_x) & (y >= self.min_y) & (y < self.max_y)
        rows = ((y - self.min_y) / self.cell_height).astype(np.int64)
        cols = ((x - self.min_x) / self.cell_width).astype(np.int64)
        return rows, cols, valid

    def proj_to_cell_scalar(self, x: float, y: float):
        """Scalar ProjToCell; returns (row, col) or None if outside."""
        if x < self.min_x or x >= self.max_x or y < self.min_y or y >= self.max_y:
            return None
        return (
            int((y - self.min_y) / self.cell_height),
            int((x - self.min_x) / self.cell_width),
        )

    def cell_bottom_left(self, rows, cols):
        """Vectorized CellBottomLeftToProj (RasterBounds.cs:90-101)."""
        rows = np.asarray(rows)
        cols = np.asarray(cols)
        if (
            (np.min(rows, initial=0) < 0)
            or (np.max(rows, initial=0) > self.n_rows - 1)
            or (np.min(cols, initial=0) < 0)
            or (np.max(cols, initial=0) > self.n_cols - 1)
        ):
            raise ValueError("Cell indexes are out of range.")
        return self.min_x + cols * self.cell_width, self.min_y + rows * self.cell_height

    def cell_top_right(self, rows, cols):
        x, y = self.cell_bottom_left(rows, cols)
        return x + self.cell_width, y + self.cell_height

    # -- factories ---------------------------------------------------

    @classmethod
    def from_extent_1m(cls, min_x: float, min_y: float, max_x: float, max_y: float):
        """Integer-meter grid: one cell per meter (Rasteriser.cs:33-40,
        ByteRaster.cs:286-289)."""
        min_x2, min_y2 = float(np.floor(min_x)), float(np.floor(min_y))
        max_x2, max_y2 = float(np.ceil(max_x)), float(np.ceil(max_y))
        return cls(
            int(max_y2 - min_y2), int(max_x2 - min_x2), min_x2, min_y2, max_x2, max_y2
        )

    @classmethod
    def for_tile(cls, tile_envelope, cell_size: float):
        """Bounds for a decoded tile envelope at a given cell size."""
        min_e, min_n, max_e, max_n = tile_envelope
        n_cols = int(round((max_e - min_e) / cell_size))
        n_rows = int(round((max_n - min_n) / cell_size))
        return cls(n_rows, n_cols, float(min_e), float(min_n), float(max_e), float(max_n))
