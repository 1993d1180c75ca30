"""Tolerance-bounded nearest-road snap ("map-matching lite") — snap
each geocoded page point to the nearest axis-aligned road segment
within a fixed radius, the vector-side nearest-feature join every GIS
engine ships (the reference's raster value probe
`ShapeIndexRaster.cs` generalized to nearest-LINE lookup).

Exactness: everything runs in integer MILLIMETERS. Points reuse the
corpus geocoder's integer hash offsets (the mm numerators of
`corpus/geocode.py` BEFORE the /1000.0 float division, urban skew
included); the synthetic road grid is closed-form from the segment
index k and axis-aligned, so the point→segment squared distance

    dist2 = max(x0-px, px-x1, 0)^2 + max(y0-py, py-y1, 0)^2

is pure int64 (coords < 2.4e7 mm -> dist2 < 1.2e15). The winner is
the lexicographic min over (dist2, seg_id); points with no segment
inside ``SNAP_R`` mm are unsnapped and emit nothing. The DuckDB
oracle runs the SAME formulas prune-free (CROSS JOIN + QUALIFY), so
equality also proves the grid pruning below lossless.

Plan (scale shape — PBSM, cf. `envelope.py`):
1. segments replicate to every ``GRID`` cell their envelope expanded
   by ``SNAP_R`` covers (bounded constant fanout);
2. points map to their single containing cell;
3. ONE groupby(cell) co-groups; in-cell a vectorized points x
   candidate-segments broadcast takes the (dist2, seg_id) min.
Any segment within SNAP_R of a point intersects the point's expanded
cell by construction, so the per-cell min is the global min.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..corpus.geocode import H1_MUL, H2_ADD, H2_MUL, M32

W = 24_000_000  # work-area extent in mm (24 km)
N_SEGS = 240  # synthetic road segments
SEG_POS_MUL = 2_654_435  # position hash multipliers (mm)
SEG_OFF_MUL = 7_368_787
SEG_LEN_BASE = 2_000_000  # 2 km min length
SEG_LEN_MOD = 2_000_000  # + up to 2 km
SNAP_R = 200_000  # snap tolerance: 200 m in mm
SNAP_R2 = SNAP_R * SNAP_R
GRID = 1_000_000  # PBSM cell: 1 km in mm
_NCELL = W // GRID + 2


def point_mm(doc_id: np.ndarray):
    """doc_id -> exact integer-mm point inside the 24 km work area:
    the geocoder's hash numerators (geocode() = AREA_MIN + this/1000),
    urban 30% skew included."""
    doc_id = np.asarray(doc_id, dtype=np.int64)
    h1 = (doc_id * H1_MUL) % M32
    h2 = (doc_id * H2_MUL + H2_ADD) % M32
    urban = (doc_id % 10) < 3
    ux = 6_000_000 + (doc_id % 4) * 1_000_000 + h1 % 1_000_000
    uy = 6_000_000 + h2 % 1_000_000
    px = np.where(urban, ux, h1 % W)
    py = np.where(urban, uy, h2 % W)
    return px.astype(np.int64), py.astype(np.int64)


def segments():
    """Closed-form axis-aligned road grid: even k horizontal, odd k
    vertical; (x0<=x1, y0<=y1) always holds so one GREATEST formula
    covers both orientations."""
    k = np.arange(N_SEGS, dtype=np.int64)
    pos = (k * SEG_POS_MUL) % W  # the fixed coordinate
    off = (k * SEG_OFF_MUL) % (W - SEG_LEN_BASE - SEG_LEN_MOD)
    length = SEG_LEN_BASE + (k * 997) % SEG_LEN_MOD
    horiz = k % 2 == 0
    x0 = np.where(horiz, off, pos)
    x1 = np.where(horiz, off + length, pos)
    y0 = np.where(horiz, pos, off)
    y1 = np.where(horiz, pos, off + length)
    return k, x0, y0, x1, y1


def _seg_table() -> pa.Table:
    sid, x0, y0, x1, y1 = segments()
    # replicate each segment to every cell of its SNAP_R-expanded
    # envelope (bounded fanout: (len/GRID + 2) x 2 cells or so)
    cx0 = np.maximum(x0 - SNAP_R, 0) // GRID
    cx1 = np.minimum(x1 + SNAP_R, W - 1) // GRID
    cy0 = np.maximum(y0 - SNAP_R, 0) // GRID
    cy1 = np.minimum(y1 + SNAP_R, W - 1) // GRID
    nx = cx1 - cx0 + 1
    ny = cy1 - cy0 + 1
    rep = nx * ny
    idx = np.repeat(np.arange(N_SEGS), rep)
    k = np.arange(len(idx)) - np.repeat(np.cumsum(rep) - rep, rep)
    ox = k % nx[idx]
    oy = k // nx[idx]
    cell = (cx0[idx] + ox) * _NCELL + (cy0[idx] + oy)
    return pa.table(
        {
            "cell": pa.array(cell, pa.int64()),
            "kind": pa.array(np.zeros(len(idx), np.int64)),
            "id": pa.array(sid[idx]),
            "a": pa.array(x0[idx]),
            "b": pa.array(y0[idx]),
            "c": pa.array(x1[idx]),
            "d": pa.array(y1[idx]),
        }
    )


def snap_to_roads(docs_ds):
    """documents -> (doc_id, seg_id, dist2) for every page point with
    a road segment within SNAP_R mm; dist2 in exact mm^2."""
    import ray.data as rd

    def pts(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        px, py = point_mm(did)
        cell = (px // GRID) * _NCELL + py // GRID
        z = np.zeros(len(did), np.int64)
        return pa.table(
            {
                "cell": pa.array(cell),
                "kind": pa.array(np.ones(len(did), np.int64)),
                "id": pa.array(did),
                "a": pa.array(px),
                "b": pa.array(py),
                "c": pa.array(z),
                "d": pa.array(z),
            }
        )

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        seg = g[g["kind"] == 0]
        pt = g[g["kind"] == 1]
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "seg_id": pd.Series([], dtype=np.int64),
                "dist2": pd.Series([], dtype=np.int64),
            }
        )
        if not len(seg) or not len(pt):
            return empty
        sid = seg["id"].to_numpy(np.int64)
        x0 = seg["a"].to_numpy(np.int64)
        y0 = seg["b"].to_numpy(np.int64)
        x1 = seg["c"].to_numpy(np.int64)
        y1 = seg["d"].to_numpy(np.int64)
        did = pt["id"].to_numpy(np.int64)
        px = pt["a"].to_numpy(np.int64)[:, None]
        py = pt["b"].to_numpy(np.int64)[:, None]
        dx = np.maximum(np.maximum(x0 - px, px - x1), 0)
        dy = np.maximum(np.maximum(y0 - py, py - y1), 0)
        d2 = dx * dx + dy * dy
        j = np.argmin(d2, axis=1)
        dmin = d2[np.arange(len(did)), j]
        # lexicographic tie-break: min seg_id among argmins
        win = np.where(d2 == dmin[:, None], sid[None, :], np.iinfo(np.int64).max).min(
            axis=1
        )
        ok = dmin <= SNAP_R2
        if not ok.any():
            return empty
        return pd.DataFrame(
            {"doc_id": did[ok], "seg_id": win[ok], "dist2": dmin[ok]}
        )

    both = docs_ds.select_columns(["doc_id"]).map_batches(
        pts, batch_format="pyarrow"
    ).union(rd.from_arrow(_seg_table()))
    return both.groupby("cell").map_groups(per_cell, batch_format="pandas")


def snap_sql(source: str = "documents") -> str:
    """Prune-free DuckDB mirror: CROSS JOIN every point with every
    segment, same integer GREATEST distance, QUALIFY the (dist2,
    seg_id) winner — doubling as the PBSM pruning losslessness proof."""
    h1 = f"((doc_id * {H1_MUL}) % {M32})"
    h2 = f"((doc_id * {H2_MUL} + {H2_ADD}) % {M32})"
    return (
        f"WITH sn_seg AS (SELECT k AS seg_id, "
        f"(k * {SEG_POS_MUL}) % {W} AS pos, "
        f"(k * {SEG_OFF_MUL}) % {W - SEG_LEN_BASE - SEG_LEN_MOD} AS off, "
        f"{SEG_LEN_BASE} + (k * 997) % {SEG_LEN_MOD} AS len, "
        f"k % 2 = 0 AS horiz FROM (SELECT unnest(range({N_SEGS})) AS k)), "
        "sn_s AS (SELECT seg_id, "
        "CASE WHEN horiz THEN off ELSE pos END AS x0, "
        "CASE WHEN horiz THEN pos ELSE off END AS y0, "
        "CASE WHEN horiz THEN off + len ELSE pos END AS x1, "
        "CASE WHEN horiz THEN pos ELSE off + len END AS y1 FROM sn_seg), "
        f"sn_p AS (SELECT doc_id, "
        f"CASE WHEN doc_id % 10 < 3 THEN 6000000 + (doc_id % 4) * 1000000 "
        f"+ {h1} % 1000000 ELSE {h1} % {W} END AS px, "
        f"CASE WHEN doc_id % 10 < 3 THEN 6000000 + {h2} % 1000000 "
        f"ELSE {h2} % {W} END AS py FROM {source}), "
        "sn_c AS (SELECT doc_id, seg_id, "
        "greatest(x0 - px, px - x1, 0) * greatest(x0 - px, px - x1, 0) + "
        "greatest(y0 - py, py - y1, 0) * greatest(y0 - py, py - y1, 0) AS dist2 "
        "FROM sn_p CROSS JOIN sn_s) "
        "SELECT doc_id, seg_id, CAST(dist2 AS BIGINT) AS dist2 FROM sn_c "
        f"WHERE dist2 <= {SNAP_R2} "
        "QUALIFY row_number() OVER (PARTITION BY doc_id "
        "ORDER BY dist2, seg_id) = 1"
    )
