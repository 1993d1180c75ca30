"""Byte raster + ESRI ASCII grid (.asc) / RLE (.asp) codec.

Matches ``LasUtility/Common/ByteRaster.cs``:

- ``NoDataValue = 0`` (``ByteRaster.cs:13``);
- 6-line header ``ncols nrows xllcorner yllcorner cellsize
  NODATA_value`` with the reference's exact column widths
  (``ByteRaster.cs:33-38``);
- data rows written top-down, i.e. grid row ``n_rows-1`` first
  (``ByteRaster.cs:40``);
- ``.asp`` rows are RLE ``NxV`` tokens (``ByteRaster.cs:94-122``);
- reader: order-insensitive key/value header, strict row/column count
  validation, floor of xll/yll to int, ``maxX = minX +
  ceil(ncols*cellsize)`` (``ByteRaster.cs:202-284``);
- windowed write / crop address the max edge via ``max - epsilon``
  (``ByteRaster.cs:53-87``, ``:154-178``).

Number formatting mirrors C# ``ToString()`` (shortest round-trip,
integral doubles printed without a decimal part).
"""

from __future__ import annotations

import io

import numpy as np

from .bounds import EPSILON, RasterBounds
from .rle import rle_decode_row, rle_encode_row

NO_DATA = 0
EXT_PLAIN = ".asc"
EXT_COMPRESSED = ".asp"


def fmt_double(v: float) -> str:
    """C# double.ToString(): shortest round-trip, integral -> no dot."""
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def fmt_float32(v) -> str:
    """C# float.ToString(): shortest round-trip of the float32 value."""
    f = np.float32(v)
    if f == np.floor(f) and abs(float(f)) < 1e7:
        return str(int(f))
    return np.format_float_positional(f, unique=True, trim="-")


def fmt_float32_as_double(v) -> str:
    """C# pattern ``List<double> heights; heights.Add(floatVal)``:
    the float is widened to double before ToString
    (VoxelGrid.cs:170-196)."""
    return fmt_double(float(np.float32(v)))


def write_header(buf, n_cols: int, n_rows: int, min_x: float, min_y: float,
                 cell_size: float, no_data) -> None:
    """ByteRaster.cs:33-38 exact text layout."""
    buf.write(f"ncols         {n_cols}\n")
    buf.write(f"nrows         {n_rows}\n")
    buf.write(f"xllcorner     {fmt_double(min_x)}\n")
    buf.write(f"yllcorner     {fmt_double(min_y)}\n")
    buf.write(f"cellsize      {fmt_double(cell_size)}\n")
    buf.write(f"NODATA_value  {no_data}\n")


class ByteRaster:
    """Dense uint8 raster + bounds (ByteRaster.cs:11-18)."""

    def __init__(self, bounds: RasterBounds, data: np.ndarray | None = None):
        self.bounds = bounds
        if data is None:
            data = np.full((bounds.n_rows, bounds.n_cols), NO_DATA, dtype=np.uint8)
        self.data = data

    # -- constructors ------------------------------------------------

    @classmethod
    def from_extent(cls, min_x, min_y, max_x, max_y):
        """1 m cells over an integer-snapped extent
        (ByteRaster.cs:286-289, Rasteriser.cs:33-40)."""
        return cls(RasterBounds.from_extent_1m(min_x, min_y, max_x, max_y))

    # -- value lookup (ByteRaster.cs:304-331) ------------------------

    def get_value(self, x, y):
        """Vectorized GetValue: NaN when outside bounds or NoData."""
        rows, cols, valid = self.bounds.proj_to_cell(x, y)
        out = np.full(np.shape(rows), np.nan)
        if out.ndim == 0:
            if valid and self.data[rows, cols] != NO_DATA:
                return float(self.data[rows, cols])
            return float("nan")
        r = np.where(valid, rows, 0)
        c = np.where(valid, cols, 0)
        vals = self.data[r, c].astype(np.float64)
        ok = valid & (self.data[r, c] != NO_DATA)
        out[ok] = vals[ok]
        return out

    # -- crop / window (ByteRaster.cs:53-87, 154-178) ----------------

    def crop(self, i_min_x: int, i_min_y: int, i_max_x: int, i_max_y: int) -> "ByteRaster":
        start = self.bounds.proj_to_cell_scalar(i_min_x, i_min_y)
        end = self.bounds.proj_to_cell_scalar(i_max_x - EPSILON, i_max_y - EPSILON)
        n_cols = end[1] - start[1] + 1
        n_rows = end[0] - start[0] + 1
        nb = RasterBounds(n_rows, n_cols, i_min_x, i_min_y, i_max_x, i_max_y)
        data = self.data[start[0] : end[0] + 1, start[1] : end[1] + 1].copy()
        return ByteRaster(nb, data)

    # -- text IO -----------------------------------------------------

    def to_ascii(self, compressed: bool = False, window=None) -> str:
        """WriteAsAscii (ByteRaster.cs:27-87). ``window`` is the
        optional integer-meter sub-extent (min_x, min_y, max_x, max_y)."""
        buf = io.StringIO()
        if window is None:
            write_header(
                buf,
                self.bounds.n_cols,
                self.bounds.n_rows,
                self.bounds.min_x,
                self.bounds.min_y,
                self.bounds.cell_width,
                NO_DATA,
            )
            row_range = range(self.bounds.n_rows - 1, -1, -1)
            col_slice = slice(None)
        else:
            i_min_x, i_min_y, i_max_x, i_max_y = window
            start = self.bounds.proj_to_cell_scalar(i_min_x, i_min_y)
            end = self.bounds.proj_to_cell_scalar(i_max_x - EPSILON, i_max_y - EPSILON)
            write_header(
                buf,
                end[1] - start[1] + 1,
                end[0] - start[0] + 1,
                i_min_x,
                i_min_y,
                self.bounds.cell_width,
                NO_DATA,
            )
            row_range = range(end[0], start[0] - 1, -1)
            col_slice = slice(start[1], end[1] + 1)

        for i_row in row_range:
            row = self.data[i_row, col_slice]
            if compressed:
                buf.write(rle_encode_row(row))
            else:
                buf.write(" ".join(str(v) for v in row.tolist()))
            buf.write("\n")
        return buf.getvalue()

    def write(self, path: str, window=None) -> None:
        compressed = path.endswith(EXT_COMPRESSED)
        with open(path, "w") as f:
            f.write(self.to_ascii(compressed=compressed, window=window))

    @classmethod
    def from_ascii_text(cls, text: str, compressed: bool) -> "ByteRaster":
        """CreateFromAscii (ByteRaster.cs:181-284)."""
        n_rows = n_cols = min_x = min_y = -1
        cell_size = float("nan")
        header_read = False
        raster = None
        i_row = -1
        for line in text.splitlines():
            words = line.split()
            if not words:
                continue
            if not header_read:
                key = words[0].upper()
                if key == "NCOLS":
                    n_cols = int(words[1])
                    continue
                elif key == "NROWS":
                    n_rows = int(words[1])
                    continue
                elif key == "XLLCORNER":
                    min_x = int(np.floor(float(words[1])))
                    continue
                elif key == "YLLCORNER":
                    min_y = int(np.floor(float(words[1])))
                    continue
                elif key == "CELLSIZE":
                    cell_size = float(words[1])
                    continue
                elif key == "NODATA_VALUE":
                    continue
                else:
                    if n_rows < 0 or n_cols < 0 or min_x < 0 or min_y < 0 or np.isnan(cell_size):
                        raise ValueError("Invalid format in header")
                    max_x = min_x + int(np.ceil(n_cols * cell_size))
                    max_y = min_y + int(np.ceil(n_rows * cell_size))
                    bounds = RasterBounds(n_rows, n_cols, min_x, min_y, max_x, max_y)
                    raster = cls(bounds)
                    header_read = True
                    i_row = n_rows
            if header_read:
                if i_row <= 0:
                    raise ValueError("contains too many data rows")
                i_row -= 1
                if compressed:
                    raster.data[i_row] = rle_decode_row(line, n_cols)
                else:
                    if len(words) != n_cols:
                        raise ValueError(f"invalid column count {len(words)}")
                    raster.data[i_row] = np.asarray([int(w) for w in words], dtype=np.uint8)
        if raster is None or i_row != 0:
            raise ValueError("contains too few data rows")
        return raster

    @classmethod
    def read(cls, path: str) -> "ByteRaster":
        with open(path) as f:
            return cls.from_ascii_text(f.read(), compressed=path.endswith(EXT_COMPRESSED))
