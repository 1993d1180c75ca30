"""Integer-exact hexagonal binning — the H3 role (hex tiling for
density/aggregation) expressed on the projected plane so both engines
agree bit-exactly. A honeycomb is the Voronoi diagram of two offset
rectangular lattices:

    lattice 0 centers: (3s*i,        H*j)
    lattice 1 centers: (3s*i + 3s/2, H*j + H/2)

With rational lattice constants (H an even integer instead of the
regular hexagon's irrational sqrt(3)*1.5s) the cells are slightly
squashed hexagons, but every assignment is pure int64: nearest center
per lattice via round-half-up division on SHIFTED (strictly positive)
coordinates, winner by smaller squared distance with ties to
lattice 0. True H3 (icosahedral aperture-7) needs spherical floats;
this keeps the hex-bin semantics oracle-provable — the DuckDB mirror
runs the SAME divisions, so equality pins rounding, tie rule, and the
two-lattice argmin.

Scale shape: pure map to (lattice, i, j) keys + ONE groupby-count —
identical to the engine's km-tile/S2 tiling shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .snap import point_mm

S = 400_000  # hex size parameter (mm): centers every 3s in x
H = 1_000_000  # row pitch (mm, even); regular hexes would need s*sqrt(3)*... irrational
_PX_SHIFT = 3 * S  # keeps every dividend positive (floor == truncate)
_PY_SHIFT = H


def _nearest(p: np.ndarray, m: int, off: int) -> np.ndarray:
    """Index of the nearest center ``m*i + off`` to p (round half up,
    all-positive arithmetic)."""
    return (p - off + m // 2) // m


def hex_assign(px: np.ndarray, py: np.ndarray):
    """(px, py) int64 mm -> (lattice, i, j) of the winning hex center
    in shifted coordinates."""
    px = px + _PX_SHIFT
    py = py + _PY_SHIFT
    i0 = _nearest(px, 3 * S, 0)
    j0 = _nearest(py, H, 0)
    i1 = _nearest(px, 3 * S, 3 * S // 2)
    j1 = _nearest(py, H, H // 2)
    dx0 = px - 3 * S * i0
    dy0 = py - H * j0
    dx1 = px - (3 * S * i1 + 3 * S // 2)
    dy1 = py - (H * j1 + H // 2)
    d0 = dx0 * dx0 + dy0 * dy0
    d1 = dx1 * dx1 + dy1 * dy1
    take1 = d1 < d0  # ties -> lattice 0
    lat = take1.astype(np.int64)
    return lat, np.where(take1, i1, i0), np.where(take1, j1, j0)


def hex_counts(docs_ds):
    """documents -> (lattice, hex_i, hex_j, n) density surface."""
    from ray.data.aggregate import Sum

    def to_hex(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        px, py = point_mm(did)
        lat, i, j = hex_assign(px, py)
        key = (lat * np.int64(1 << 40)) + (i << np.int64(20)) + j
        u, c = np.unique(key, return_counts=True)
        return pa.table(
            {"__k": pa.array(u), "n": pa.array(c.astype(np.int64))}
        )

    def unkey(t: pa.Table) -> pa.Table:
        k = t.column("__k").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "lattice": pa.array(k >> np.int64(40)),
                "hex_i": pa.array((k >> np.int64(20)) & np.int64((1 << 20) - 1)),
                "hex_j": pa.array(k & np.int64((1 << 20) - 1)),
                "n": t.column("n"),
            }
        )

    return (
        docs_ds.select_columns(["doc_id"])
        .map_batches(to_hex, batch_format="pyarrow")
        .groupby("__k")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(unkey, batch_format="pyarrow")
    )


def hex_counts_sql(source: str = "documents") -> str:
    """DuckDB mirror of :func:`hex_counts` (same shifted round-half-up
    divisions and two-lattice argmin)."""
    from ..corpus.geocode import H1_MUL, H2_ADD, H2_MUL, M32
    from .snap import W

    h1 = f"((doc_id * {H1_MUL}) % {M32})"
    h2 = f"((doc_id * {H2_MUL} + {H2_ADD}) % {M32})"
    s3 = 3 * S
    return (
        f"WITH hx_p AS (SELECT doc_id, "
        f"(CASE WHEN doc_id % 10 < 3 THEN 6000000 + (doc_id % 4) * 1000000 "
        f"+ {h1} % 1000000 ELSE {h1} % {W} END) + {_PX_SHIFT} AS px, "
        f"(CASE WHEN doc_id % 10 < 3 THEN 6000000 + {h2} % 1000000 "
        f"ELSE {h2} % {W} END) + {_PY_SHIFT} AS py FROM {source}), "
        f"hx_c AS (SELECT px, py, "
        f"(px + {s3 // 2}) // {s3} AS i0, (py + {H // 2}) // {H} AS j0, "
        f"(px - {s3 // 2} + {s3 // 2}) // {s3} AS i1, "
        f"(py - {H // 2} + {H // 2}) // {H} AS j1 FROM hx_p), "
        "hx_d AS (SELECT *, "
        f"(px - {s3} * i0) * (px - {s3} * i0) + (py - {H} * j0) * (py - {H} * j0) AS d0, "
        f"(px - ({s3} * i1 + {s3 // 2})) * (px - ({s3} * i1 + {s3 // 2})) + "
        f"(py - ({H} * j1 + {H // 2})) * (py - ({H} * j1 + {H // 2})) AS d1 "
        "FROM hx_c) "
        "SELECT CAST(CASE WHEN d1 < d0 THEN 1 ELSE 0 END AS BIGINT) AS lattice, "
        "CAST(CASE WHEN d1 < d0 THEN i1 ELSE i0 END AS BIGINT) AS hex_i, "
        "CAST(CASE WHEN d1 < d0 THEN j1 ELSE j0 END AS BIGINT) AS hex_j, "
        "CAST(count(*) AS BIGINT) AS n FROM hx_d "
        "GROUP BY 1, 2, 3"
    )
