"""ESRI ASCII-grid tile sink/source at the Ray Data layer.

The reference reads/writes whole grids as ``.asc`` (plain) / ``.asp``
(RLE) text files (``Common/ByteRaster.cs:27-122,181-284``) and DEM
floats via ``WriteDemAsAscii`` (``VoxelGrid/VoxelGrid.cs:319-345``).
The engine's unit is the 1 km tile, so the sink writes **one file per
tile row** from a tiles Dataset (atomic tmp+rename, the reference's
snapshot pattern) and returns a manifest Dataset — resumable,
partitioned output per the driver contract. The source reads a
directory of such files back into a tiles Dataset with
``ray.data.read_binary_files`` (streaming, no driver-side loop).

Text formats are byte-compatible with the reference writers (golden
round-trip tests in tests/test_ascii_grid.py cover the codec;
tests/test_sources.py covers the Ray layer).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geom.ascii_grid import ByteRaster
from ..geom.bounds import RasterBounds
from ..geom.tilenamer import decode
from ..geom.voxel import VoxelTile, write_dem_ascii


def _atomic_write_text(path: str, text: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w", newline="\n") as f:
        f.write(text)
    os.replace(tmp, path)


def write_burned_tiles_ascii(
    tiles_ds, out_dir: str, compressed: bool = True, cell_size: float = 1.0
):
    """Sink for ``stages.pip_join.burned_tiles`` rows: one ``.asp``
    (RLE, ``ByteRaster.cs:94-122``) or ``.asc`` file per tile.
    Returns the manifest Dataset {tile_id, path, n_bytes, md5} after
    driving the write."""
    ext = ".asp" if compressed else ".asc"

    def write_batch(t: pa.Table) -> pa.Table:
        tile_ids = t.column("tile_id").to_pylist()
        rasters = t.column("raster").to_pylist()
        paths, sizes, hashes = [], [], []
        for tid, blob in zip(tile_ids, rasters):
            env = decode(tid)
            bounds = RasterBounds.for_tile(env, cell_size)
            data = np.frombuffer(blob, dtype=np.uint8).reshape(
                bounds.n_rows, bounds.n_cols
            )
            text = ByteRaster(bounds, data.copy()).to_ascii(compressed=compressed)
            path = os.path.join(out_dir, f"{tid}{ext}")
            _atomic_write_text(path, text)
            paths.append(path)
            sizes.append(len(text))
            hashes.append(hashlib.md5(text.encode()).hexdigest())
        return pa.table(
            {
                "tile_id": pa.array(tile_ids, pa.string()),
                "path": pa.array(paths, pa.string()),
                "n_bytes": pa.array(sizes, pa.int64()),
                "md5": pa.array(hashes, pa.string()),
            }
        )

    return tiles_ds.map_batches(write_batch, batch_format="pyarrow").materialize()


def read_ascii_tiles(dir_path: str):
    """Source: directory of per-tile ``.asc``/``.asp`` files -> tiles
    Dataset {tile_id, n_rows, n_cols, min_x, min_y, cell_size,
    raster}. Streaming decode inside ``map_batches`` (S3/S4 codec,
    strict header validation preserved)."""
    import ray.data as rd

    ds = rd.read_binary_files(dir_path, include_paths=True)

    def decode_batch(t: pa.Table) -> pa.Table:
        rows = {
            "tile_id": [],
            "n_rows": [],
            "n_cols": [],
            "min_x": [],
            "min_y": [],
            "cell_size": [],
            "raster": [],
        }
        for path, data in zip(t.column("path").to_pylist(), t.column("bytes").to_pylist()):
            name = os.path.basename(path)
            tile_id, ext = os.path.splitext(name)
            raster = ByteRaster.from_ascii_text(
                data.decode("ascii"), compressed=(ext == ".asp")
            )
            rows["tile_id"].append(tile_id)
            rows["n_rows"].append(raster.bounds.n_rows)
            rows["n_cols"].append(raster.bounds.n_cols)
            rows["min_x"].append(raster.bounds.min_x)
            rows["min_y"].append(raster.bounds.min_y)
            rows["cell_size"].append(raster.bounds.cell_width)
            rows["raster"].append(raster.data.tobytes())
        return pa.table(
            {
                "tile_id": pa.array(rows["tile_id"], pa.string()),
                "n_rows": pa.array(rows["n_rows"], pa.int32()),
                "n_cols": pa.array(rows["n_cols"], pa.int32()),
                "min_x": pa.array(rows["min_x"], pa.float64()),
                "min_y": pa.array(rows["min_y"], pa.float64()),
                "cell_size": pa.array(rows["cell_size"], pa.float64()),
                "raster": pa.array(rows["raster"], pa.binary()),
            }
        )

    return ds.map_batches(decode_batch, batch_format="pyarrow")


def write_burned_tiles_png(tiles_ds, out_dir: str, cell_size: float = 1.0):
    """PNG sink (S8, ``ByteRaster.cs:125-152``): one greyscale PNG per
    burned tile, rows top-down; pure-stdlib encoder (geom/png.py).
    Returns the manifest Dataset."""
    from ..geom.png import encode_grey_png

    def write_batch(t: pa.Table) -> pa.Table:
        tile_ids = t.column("tile_id").to_pylist()
        paths, sizes, hashes = [], [], []
        for tid, blob in zip(tile_ids, t.column("raster").to_pylist()):
            env = decode(tid)
            bounds = RasterBounds.for_tile(env, cell_size)
            data = np.frombuffer(blob, dtype=np.uint8).reshape(
                bounds.n_rows, bounds.n_cols
            )
            png = encode_grey_png(data)
            path = os.path.join(out_dir, f"{tid}.png")
            os.makedirs(out_dir, exist_ok=True)
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(png)
            os.replace(tmp, path)
            paths.append(path)
            sizes.append(len(png))
            hashes.append(hashlib.md5(png).hexdigest())
        return pa.table(
            {
                "tile_id": pa.array(tile_ids, pa.string()),
                "path": pa.array(paths, pa.string()),
                "n_bytes": pa.array(sizes, pa.int64()),
                "md5": pa.array(hashes, pa.string()),
            }
        )

    return tiles_ds.map_batches(write_batch, batch_format="pyarrow").materialize()


def read_png_tiles(dir_path: str, cell_size: float = 1.0):
    """Source: directory of per-tile greyscale PNGs (as written by
    ``write_burned_tiles_png``) -> tiles Dataset {tile_id, n_rows,
    n_cols, raster}. Streaming decode (geom/png.py, stdlib zlib)."""
    import ray.data as rd

    from ..geom.png import decode_grey_png

    ds = rd.read_binary_files(dir_path, include_paths=True)

    def decode_batch(t: pa.Table) -> pa.Table:
        rows = {"tile_id": [], "n_rows": [], "n_cols": [], "raster": []}
        for path, data in zip(t.column("path").to_pylist(), t.column("bytes").to_pylist()):
            tile_id = os.path.splitext(os.path.basename(path))[0]
            img = decode_grey_png(data)
            rows["tile_id"].append(tile_id)
            rows["n_rows"].append(img.shape[0])
            rows["n_cols"].append(img.shape[1])
            rows["raster"].append(img.tobytes())
        return pa.table(
            {
                "tile_id": pa.array(rows["tile_id"], pa.string()),
                "n_rows": pa.array(rows["n_rows"], pa.int32()),
                "n_cols": pa.array(rows["n_cols"], pa.int32()),
                "raster": pa.array(rows["raster"], pa.binary()),
            }
        )

    return ds.map_batches(decode_batch, batch_format="pyarrow")


def write_dem_tiles_ascii(tin_tiles_ds, out_dir: str, cell_size: float = 10.0):
    """Sink for ``stages.tin.tin_tiles`` rows: the float DEM of every
    tile as ``WriteDemAsAscii`` text (top-down rows, float32
    formatting, NODATA -999 — ``VoxelGrid.cs:319-345``). Returns the
    manifest Dataset."""

    def write_batch(df: pd.DataFrame) -> pd.DataFrame:
        paths, sizes, hashes = [], [], []
        for tid, blob in zip(df["tile_id"], df["dem"]):
            env = decode(tid)
            bounds = RasterBounds.for_tile(env, cell_size)
            dem = np.frombuffer(blob, dtype=np.float32).reshape(
                bounds.n_rows, bounds.n_cols
            )
            tile = VoxelTile(
                bounds,
                dem.copy(),
                np.zeros(bounds.n_rows * bounds.n_cols + 1, dtype=np.int64),
                np.empty(0, dtype=np.float32),
                np.empty(0, dtype=np.uint8),
            )
            text = write_dem_ascii(tile)
            path = os.path.join(out_dir, f"{tid}.asc")
            _atomic_write_text(path, text)
            paths.append(path)
            sizes.append(len(text))
            hashes.append(hashlib.md5(text.encode()).hexdigest())
        return pd.DataFrame(
            {
                "tile_id": df["tile_id"].to_numpy(),
                "path": paths,
                "n_bytes": pd.Series(sizes, dtype="int64"),
                "md5": hashes,
            }
        )

    return tin_tiles_ds.map_batches(write_batch, batch_format="pandas").materialize()


def write_dem_tiles_png16(
    tin_tiles_ds, out_dir: str, cell_size: float = 10.0, z_scale: float = 100.0
):
    """Sink for ``stages.tin.tin_tiles`` rows: every tile's float DEM
    as a 16-bit greyscale PNG (``geom.png.encode_grey16_png``) — 1 cm
    height resolution at the default scale where the reference's
    8-bit ``WriteAsPng`` path quantizes meters away. Per tile the
    height is stored as ``round((z - z_offset) * z_scale)`` with
    ``z_offset = floor(min(z))`` carried in the manifest; NODATA
    cells map to 65535. A tile whose height span would overflow 16
    bits at the requested scale gets the largest scale that fits
    (the manifest records the per-tile effective scale, so reads stay
    exact). Rows are written top-down (the image convention, same as
    the ASCII export). Returns the manifest Dataset
    (tile_id, path, n_bytes, md5, z_offset, z_scale)."""
    from ..geom.png import encode_grey16_png

    NODATA_U16 = np.uint16(65535)

    def write_batch(df: pd.DataFrame) -> pd.DataFrame:
        paths, sizes, hashes, offsets, scales = [], [], [], [], []
        for tid, blob in zip(df["tile_id"], df["dem"]):
            env = decode(tid)
            bounds = RasterBounds.for_tile(env, cell_size)
            dem = np.frombuffer(blob, dtype=np.float32).reshape(
                bounds.n_rows, bounds.n_cols
            )
            ok = ~np.isnan(dem)
            z_off = float(np.floor(dem[ok].min())) if ok.any() else 0.0
            eff = z_scale
            q = np.full(dem.shape, NODATA_U16, dtype=np.uint16)
            if ok.any():
                span = float(dem[ok].max()) - z_off
                if span * z_scale > 65534.0:
                    eff = 65534.0 / span
                scaled = np.round((dem[ok].astype(np.float64) - z_off) * eff)
                q[ok] = np.clip(scaled, 0, 65534).astype(np.uint16)
            png = encode_grey16_png(q, top_down=True)
            path = os.path.join(out_dir, f"{tid}.png")
            os.makedirs(out_dir, exist_ok=True)
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(png)
            os.replace(tmp, path)
            paths.append(path)
            sizes.append(len(png))
            hashes.append(hashlib.md5(png).hexdigest())
            offsets.append(z_off)
            scales.append(eff)
        return pd.DataFrame(
            {
                "tile_id": df["tile_id"].to_numpy(),
                "path": paths,
                "n_bytes": pd.Series(sizes, dtype="int64"),
                "md5": hashes,
                "z_offset": pd.Series(offsets, dtype="float64"),
                "z_scale": pd.Series(scales, dtype="float64"),
            }
        )

    return tin_tiles_ds.map_batches(write_batch, batch_format="pandas").materialize()


def read_dem_png16(path: str, z_offset: float, z_scale: float = 100.0) -> np.ndarray:
    """Inverse of the PNG-16 DEM export: (rows, cols) float32 heights
    bottom-up (the raster convention), NODATA -> NaN."""
    from ..geom.png import decode_png

    with open(path, "rb") as f:
        img = decode_png(f.read())
    q = img[::-1, :, 0].astype(np.float64)  # undo top-down
    out = q / z_scale + z_offset
    out[q == 65535] = np.nan
    return out.astype(np.float32)


def _quantize_dem_u16(dem: np.ndarray, z_scale: float):
    """Shared 16-bit DEM quantization (PNG-16 and WebP-16 sinks):
    round((z - floor(min z)) * scale), NODATA=65535, scale shrunk to
    the largest that fits when the tile's span would overflow."""
    ok = ~np.isnan(dem)
    z_off = float(np.floor(dem[ok].min())) if ok.any() else 0.0
    eff = z_scale
    q = np.full(dem.shape, np.uint16(65535), dtype=np.uint16)
    if ok.any():
        span = float(dem[ok].max()) - z_off
        if span * z_scale > 65534.0:
            eff = 65534.0 / span
        scaled = np.round((dem[ok].astype(np.float64) - z_off) * eff)
        q[ok] = np.clip(scaled, 0, 65534).astype(np.uint16)
    return q, z_off, eff


def write_dem_tiles_webp16(
    tin_tiles_ds, out_dir: str, cell_size: float = 10.0, z_scale: float = 100.0
):
    """Per-tile DEM sink as LOSSLESS WebP (VP8L, ``geom.webp``): the
    16-bit quantized height (same ``_quantize_dem_u16`` contract as
    the PNG-16 sink) rides the red(hi)/green(lo) byte channels —
    VP8L is 8-bit ARGB, so the split is the exact-16-bit container
    trick; the subtract-green transform still compresses the
    correlated planes. Returns the same manifest schema as
    :func:`write_dem_tiles_png16`; reads via :func:`read_dem_webp16`
    are bit-identical to the PNG-16 path (pinned in tests)."""
    from ..geom.webp import encode_webp

    def write_batch(df: pd.DataFrame) -> pd.DataFrame:
        paths, sizes, hashes, offsets, scales = [], [], [], [], []
        for tid, blob in zip(df["tile_id"], df["dem"]):
            env = decode(tid)
            bounds = RasterBounds.for_tile(env, cell_size)
            dem = np.frombuffer(blob, dtype=np.float32).reshape(
                bounds.n_rows, bounds.n_cols
            )
            q, z_off, eff = _quantize_dem_u16(dem, z_scale)
            q = q[::-1]  # raster rows are bottom-up; store top-down
            img = np.zeros((*q.shape, 3), np.uint8)
            img[:, :, 0] = (q >> 8).astype(np.uint8)
            img[:, :, 1] = (q & 0xFF).astype(np.uint8)
            data = encode_webp(img)
            os.makedirs(out_dir, exist_ok=True)
            path = os.path.join(out_dir, f"{tid}.webp")
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)
            paths.append(path)
            sizes.append(len(data))
            hashes.append(hashlib.md5(data).hexdigest())
            offsets.append(z_off)
            scales.append(eff)
        return pd.DataFrame(
            {
                "tile_id": df["tile_id"].to_numpy(),
                "path": paths,
                "n_bytes": pd.Series(sizes, dtype="int64"),
                "md5": hashes,
                "z_offset": pd.Series(offsets, dtype="float64"),
                "z_scale": pd.Series(scales, dtype="float64"),
            }
        )

    return tin_tiles_ds.map_batches(write_batch, batch_format="pandas").materialize()


def read_dem_webp16(path: str, z_offset: float, z_scale: float = 100.0) -> np.ndarray:
    """Inverse of the WebP-16 DEM export: (rows, cols) float32 heights
    bottom-up, NODATA -> NaN (same convention as read_dem_png16)."""
    from ..geom.webp import decode_webp

    with open(path, "rb") as f:
        img = decode_webp(f.read())
    q = (img[:, :, 0].astype(np.uint16) << 8) | img[:, :, 1]
    q = q[::-1].astype(np.float64)  # rows were written top-down
    out = q / z_scale + z_offset
    out[q == 65535] = np.nan
    return out.astype(np.float32)
