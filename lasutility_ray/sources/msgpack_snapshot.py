"""Minimal MessagePack decoder + VoxelGrid snapshot loader (S13).

The reference persists ``VoxelGrid`` via MessagePack-CSharp with
integer member keys (``VoxelGrid/VoxelGrid.cs:11-28``: [union bounds,
Bin[,] grid, float[,] dem, bool sorted]; ``Bin.cs:8-49``: bin =
[points], point = [z, class]; ``Common/RasterBounds.cs:7-27``:
[rows, cols, min_x, min_y, max_x, max_y]; interface union
``IRasterBounds.cs:5`` = [type_id, object]). MessagePack itself is a
public spec — this decoder covers the subset those formatters emit.

``load_voxel_snapshot`` turns the reference's ``points.obj`` fixture
into our ``VoxelTile`` so every voxel query runs directly against the
reference's own serialized state (tests/test_reference_golden.py).
"""

from __future__ import annotations

import struct

import numpy as np

from ..geom.bounds import RasterBounds
from ..geom.voxel import VoxelTile


def _decode(buf: bytes, off: int = 0):
    """Decode one MessagePack value; returns (value, next_offset)."""
    b = buf[off]
    off += 1
    if b <= 0x7F:  # positive fixint
        return b, off
    if b >= 0xE0:  # negative fixint
        return b - 256, off
    if 0x80 <= b <= 0x8F:  # fixmap
        return _decode_map(buf, off, b & 0x0F)
    if 0x90 <= b <= 0x9F:  # fixarray
        return _decode_array(buf, off, b & 0x0F)
    if 0xA0 <= b <= 0xBF:  # fixstr
        n = b & 0x1F
        return buf[off : off + n].decode("utf-8"), off + n
    if b == 0xC0:
        return None, off
    if b == 0xC2:
        return False, off
    if b == 0xC3:
        return True, off
    if b == 0xCA:
        return struct.unpack_from(">f", buf, off)[0], off + 4
    if b == 0xCB:
        return struct.unpack_from(">d", buf, off)[0], off + 8
    if b == 0xCC:
        return buf[off], off + 1
    if b == 0xCD:
        return struct.unpack_from(">H", buf, off)[0], off + 2
    if b == 0xCE:
        return struct.unpack_from(">I", buf, off)[0], off + 4
    if b == 0xCF:
        return struct.unpack_from(">Q", buf, off)[0], off + 8
    if b == 0xD0:
        return struct.unpack_from(">b", buf, off)[0], off + 1
    if b == 0xD1:
        return struct.unpack_from(">h", buf, off)[0], off + 2
    if b == 0xD2:
        return struct.unpack_from(">i", buf, off)[0], off + 4
    if b == 0xD3:
        return struct.unpack_from(">q", buf, off)[0], off + 8
    if b == 0xD9:
        n = buf[off]
        return buf[off + 1 : off + 1 + n].decode("utf-8"), off + 1 + n
    if b == 0xDC:
        (n,) = struct.unpack_from(">H", buf, off)
        return _decode_array(buf, off + 2, n)
    if b == 0xDD:
        (n,) = struct.unpack_from(">I", buf, off)
        return _decode_array(buf, off + 4, n)
    if b == 0xDE:
        (n,) = struct.unpack_from(">H", buf, off)
        return _decode_map(buf, off + 2, n)
    if b == 0xC4:
        n = buf[off]
        return buf[off + 1 : off + 1 + n], off + 1 + n
    raise NotImplementedError(f"msgpack format byte 0x{b:02x}")


def _decode_array(buf, off, n):
    out = []
    for _ in range(n):
        v, off = _decode(buf, off)
        out.append(v)
    return out, off


def _decode_map(buf, off, n):
    out = {}
    for _ in range(n):
        k, off = _decode(buf, off)
        v, off = _decode(buf, off)
        out[k] = v
    return out, off


def decode_msgpack(data: bytes):
    try:
        v, off = _decode(data, 0)
    except (IndexError, struct.error, KeyError, TypeError, MemoryError) as exc:
        # malformed bytes surface as the codec's data error, never the
        # bare exception of whichever parse step tripped (fuzz-pinned)
        raise ValueError(f"malformed MessagePack stream: {exc}") from exc
    if off != len(data):
        raise ValueError(f"trailing bytes: {len(data) - off}")
    return v


def save_voxel_snapshot(tile: VoxelTile, path: str) -> None:
    """Serialize a VoxelTile as the reference's MessagePack snapshot,
    byte-identical to MessagePack-CSharp's output for the current
    VoxelGrid layout (AddPointsAndSave golden): top fixarray(4) of
    [union(int32 0, bounds), Bin[,] 2D, float[,] DEM, sorted]; float
    payloads as float32 (0xca) with .NET's negative quiet NaN
    (0xffc00000) for missing DEM cells; the tmp+rename atomicity of
    Serialize (VoxelGrid.cs:347-359)."""
    import os

    b = tile.bounds
    out = bytearray()

    def arr(n: int):
        if n <= 15:
            out.append(0x90 | n)
        else:
            out.append(0xDC)
            out.extend(struct.pack(">H", n))

    def fixint(v: int):
        if v <= 0x7F:
            out.append(v)
        else:
            out.append(0xCC)
            out.append(v)

    out.append(0x94)  # VoxelGrid: 4 keyed members
    out.append(0x92)  # union [type, object]
    out.append(0xD2)
    out.extend(struct.pack(">i", 0))  # RasterBounds union id as int32
    arr(6)
    fixint(b.n_rows)
    fixint(b.n_cols)
    for v in (b.min_x, b.min_y, b.max_x, b.max_y):
        out.append(0xCB)
        out.extend(struct.pack(">d", v))

    # Bin[,] via the 2D-array formatter: [dim0, dim1, flat]
    arr(3)
    fixint(b.n_rows)
    fixint(b.n_cols)
    arr(b.n_rows * b.n_cols)
    for cell in range(b.n_rows * b.n_cols):
        s, e = int(tile.bin_starts[cell]), int(tile.bin_starts[cell + 1])
        out.append(0x91)  # Bin: [Points]
        arr(e - s)
        for i in range(s, e):
            out.append(0x92)  # BinPoint: [Z, Class]
            out.append(0xCA)
            out.extend(struct.pack(">f", float(tile.bin_z[i])))
            fixint(int(tile.bin_cls[i]))

    # float[,] DEM
    arr(3)
    fixint(b.n_rows)
    fixint(b.n_cols)
    arr(b.n_rows * b.n_cols)
    flat = tile.dem.ravel()
    for v in flat:
        out.append(0xCA)
        if np.isnan(v):
            out.extend(b"\xff\xc0\x00\x00")  # .NET float.NaN bits
        else:
            out.extend(struct.pack(">f", float(v)))

    out.append(0xC3)  # _bIsSorted = true

    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(bytes(out))
    os.replace(tmp, path)


def load_voxel_snapshot(path: str) -> VoxelTile:
    """points.obj -> VoxelTile (bounds + ground DEM + desc-sorted
    bins), preserving the snapshot's stored per-bin order (the
    reference guarantees sortedness before Serialize,
    VoxelGrid.cs:347-359)."""
    with open(path, "rb") as f:
        root = decode_msgpack(f.read())
    try:
        return _tile_from_root(root)
    except (IndexError, TypeError, KeyError, struct.error) as exc:
        raise ValueError(f"malformed voxel snapshot: {exc}") from exc


def _tile_from_root(root) -> VoxelTile:
    bounds_union, grid2d, dem2d, is_sorted = root[0], root[1], root[2], root[3]
    if bounds_union[0] != 0:
        raise ValueError("unknown IRasterBounds union type")
    rows, cols, min_x, min_y, max_x, max_y = bounds_union[1]
    bounds = RasterBounds(rows, cols, min_x, min_y, max_x, max_y)

    # 2D array formatter: [dim0, dim1, flat values (row-major)]
    def grid_of(arr2d):
        d0, d1 = arr2d[0], arr2d[1]
        flat = arr2d[2]
        if len(flat) != d0 * d1:
            raise ValueError("2D array length mismatch")
        return d0, d1, flat

    _, _, bins_flat = grid_of(grid2d)
    d0, d1, dem_flat = grid_of(dem2d)
    dem = np.array(dem_flat, dtype=np.float32).reshape(d0, d1)

    bin_z, bin_cls, counts = [], [], []
    for cell in bins_flat:
        pts = cell[0]  # Bin.[Key(0)] Points
        counts.append(len(pts))
        for p in pts:
            bin_z.append(p[0])
            bin_cls.append(p[1])
    starts = np.zeros(rows * cols + 1, dtype=np.int64)
    np.cumsum(np.asarray(counts, dtype=np.int64), out=starts[1:])
    return VoxelTile(
        bounds,
        dem,
        starts,
        np.array(bin_z, dtype=np.float32),
        np.array(bin_cls, dtype=np.uint8),
    )
