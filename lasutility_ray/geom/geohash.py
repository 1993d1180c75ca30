"""Geohash cell codec over the engine's projected work area.

Canonical geohash machinery — MSB-first binary subdivision of the two
axes, x-bit-leading interleave, 5 bits per character, the standard
base-32 alphabet — applied to the 24 km TM35 work envelope instead of
the WGS84 (lon, lat) rectangle. Subdividing the projected envelope
keeps every step exact int64 (millimeter coordinates times a power of
two, floor-divided by the envelope width), so the DuckDB mirror
reproduces the code bit-for-bit; true lon/lat geohash would drag
irrational degree conversions into both engines for no extra
coverage. The third cell system next to the km tile grid
(geom/tilenamer.py) and S2 (geom/s2.py): S2 exercises spherical
hierarchy, this exercises the interleaved-prefix property —
lexicographic geohash prefixes ARE spatial containment, which is what
prefix range scans index on.

Reference framing: LasUtility's only cell system is the km grid
(LasUtility/Common/TileNamer.cs); geohash is beyond-reference
(SURVEY 2.11, spatial indexing family).
"""

from __future__ import annotations

import numpy as np

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
W = 24_000_000  # envelope extent in mm (24 km), both axes


def _cell_numbers(x_mm: np.ndarray, y_mm: np.ndarray, precision: int):
    """x/y cell numbers at the bit depths of ``precision`` chars
    (x leads, so it gets the extra bit when 5p is odd)."""
    nbits = 5 * precision
    bx = (nbits + 1) // 2
    by = nbits // 2
    x = np.asarray(x_mm, np.int64)
    y = np.asarray(y_mm, np.int64)
    if nbits > 38:  # x*2^bx must stay < 2^63 (W < 2^25)
        raise ValueError("precision > 7 would overflow int64")
    cx = (x << bx) // W
    cy = (y << by) // W
    return cx, cy, bx, by


def encode(x_mm: np.ndarray, y_mm: np.ndarray, precision: int = 4) -> np.ndarray:
    """Vectorized geohash strings for exact-mm points in [0, W)^2."""
    cx, cy, bx, by = _cell_numbers(x_mm, y_mm, precision)
    n = len(cx)
    out = np.empty((n, precision), dtype="U1")
    b32 = np.array(list(BASE32))
    for ch in range(precision):
        val = np.zeros(n, dtype=np.int64)
        for j in range(5):
            t = 5 * ch + j  # global bit index, x leads on even t
            if t % 2 == 0:
                bit = (cx >> (bx - 1 - t // 2)) & 1
            else:
                bit = (cy >> (by - 1 - t // 2)) & 1
            val = (val << 1) | bit
        out[:, ch] = b32[val]
    return np.array(["".join(row) for row in out], dtype=object)


def decode_bounds(code: str):
    """Geohash -> (x0, y0, x1, y1) exact-mm half-open cell bounds."""
    nbits = 5 * len(code)
    bx = (nbits + 1) // 2
    by = nbits // 2
    cx = cy = 0
    t = 0
    for ch in code:
        v = BASE32.index(ch)
        for j in range(4, -1, -1):
            bit = (v >> j) & 1
            if t % 2 == 0:
                cx = (cx << 1) | bit
            else:
                cy = (cy << 1) | bit
            t += 1
    # inverse of cx = floor(x * 2^bx / W): x in [ceil(cx*W/2^bx), ...)
    x0 = -((-cx * W) >> bx)
    x1 = -((-(cx + 1) * W) >> bx)
    y0 = -((-cy * W) >> by)
    y1 = -((-(cy + 1) * W) >> by)
    return x0, y0, x1, y1


def encode_sql(x_expr: str, y_expr: str, precision: int = 4) -> str:
    """DuckDB expression mirroring :func:`encode` for exact-mm int64
    x/y expressions — the same shifts, floor divisions and base-32
    lookup, generated bit by bit."""
    nbits = 5 * precision
    bx = (nbits + 1) // 2
    by = nbits // 2
    cx = f"((({x_expr}) * {1 << bx}) // {W})"
    cy = f"((({y_expr}) * {1 << by}) // {W})"
    chars = []
    for ch in range(precision):
        terms = []
        for j in range(5):
            t = 5 * ch + j
            if t % 2 == 0:
                bit = f"(({cx} >> {bx - 1 - t // 2}) & 1)"
            else:
                bit = f"(({cy} >> {by - 1 - t // 2}) & 1)"
            terms.append(f"({bit} * {1 << (4 - j)})")
        idx = " + ".join(terms)
        chars.append(f"substr('{BASE32}', CAST({idx} AS INTEGER) + 1, 1)")
    return " || ".join(chars)
