"""Run-length codec for byte raster rows — the ``.asp`` line format.

Matches ``LasUtility/Common/ByteRaster.cs:94-122`` (encode: tokens
``<count>x<value>`` joined by single spaces) and the decode loop at
``ByteRaster.cs:246-275``. Vectorized run detection via ``np.diff``.
"""

from __future__ import annotations

import numpy as np


def rle_encode_row(row: np.ndarray) -> str:
    """Encode one uint8 row as ``NxV NxV ...`` (ByteRaster.cs:94-122)."""
    row = np.asarray(row, dtype=np.uint8)
    if row.size == 0:
        return ""
    change = np.flatnonzero(np.diff(row)) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [row.size]))
    counts = ends - starts
    values = row[starts]
    return " ".join(f"{c}x{v}" for c, v in zip(counts.tolist(), values.tolist()))


def rle_decode_row(line: str, n_cols: int) -> np.ndarray:
    """Decode one ``NxV`` line into a uint8 row (ByteRaster.cs:246-275).

    Raises on malformed tokens or column-count mismatch, like the
    reference.
    """
    counts = []
    values = []
    for word in line.split():
        parts = word.split("x")
        if len(parts) != 2:
            raise ValueError(f"invalid [count]x[value] token {word!r}")
        counts.append(int(parts[0]))
        values.append(int(parts[1]))
    out = np.repeat(np.asarray(values, dtype=np.uint8), np.asarray(counts, dtype=np.int64))
    if out.size != n_cols:
        raise ValueError(f"invalid column count {out.size}, expected {n_cols}")
    return out
