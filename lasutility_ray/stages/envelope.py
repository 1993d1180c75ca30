"""Envelope (rectangle-intersection) spatial self-join via grid
partitioning — the PBSM / partition-based spatial-merge shape that
backs every bbox-overlap stage of a spatial engine (the reference's
`IShapeIndex.GetShapes(bounds)` probe generalized to a JOIN between
two rectangle sets; cf. LasUtility's envelope checks in
`ShapeIndexRaster.cs`).

Each document derives a deterministic integer rectangle (the
synthetic stand-in for a page's map extent, mirrored 1:1 in SQL from
the same doc_id hash the geocoder uses). The join finds all pairs
(a < b) whose CLOSED rectangles intersect:

    x0a <= x1b AND x0b <= x1a AND y0a <= y1b AND y0b <= y1a

Plan (scale shape):
1. map: each rect replicates to every GRID_M-sized cell its envelope
   covers (rects are bounded, so fanout is a small constant);
2. ONE groupby(cell) co-locates possible partners;
3. in-cell vectorized sort-sweep (sort by x0, window by x-overlap)
   emits candidate pairs; the full predicate filters;
4. duplicate reports are killed WITHOUT a dedup shuffle by the PBSM
   reference-point rule: a pair is reported only by the single cell
   that contains (max(x0a, x0b), max(y0a, y0b)).

No all-to-all beyond the one cell shuffle; no global dedup pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..corpus.geocode import H1_MUL, M32, hashes

SPACE = 2000  # world extent in integer meters
GRID_M = 250  # PBSM cell size


def doc_rects(doc_id: np.ndarray):
    """doc_id -> (x0, y0, x1, y1) closed integer rectangles."""
    doc_id = np.asarray(doc_id, dtype=np.int64)
    h1, _ = hashes(doc_id)
    x0 = h1 % SPACE
    y0 = (h1 // SPACE) % SPACE
    w = doc_id % 50 + 10
    h = (doc_id // 7) % 50 + 10
    return x0, y0, x0 + w, y0 + h


def _rect_sql(doc_col: str = "doc_id") -> str:
    h1 = f"(({doc_col} * {H1_MUL}) % {M32})"
    return (
        f"SELECT {doc_col} AS rid, {h1} % {SPACE} AS x0, "
        f"({h1} // {SPACE}) % {SPACE} AS y0, "
        f"{h1} % {SPACE} + {doc_col} % 50 + 10 AS x1, "
        f"({h1} // {SPACE}) % {SPACE} + ({doc_col} // 7) % 50 + 10 AS y1"
    )


def envelope_self_join(docs_ds):
    """documents -> (a, b) doc_id pairs with intersecting rectangles,
    a < b, each pair exactly once."""

    def replicate(t: pa.Table) -> pa.Table:
        rid = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        x0, y0, x1, y1 = doc_rects(rid)
        cx0, cx1 = x0 // GRID_M, x1 // GRID_M
        cy0, cy1 = y0 // GRID_M, y1 // GRID_M
        nx = (cx1 - cx0 + 1).astype(np.int64)
        ny = (cy1 - cy0 + 1).astype(np.int64)
        rep = nx * ny
        idx = np.repeat(np.arange(len(rid)), rep)
        # per-copy offset within the rect's cell window
        k = np.arange(len(idx)) - np.repeat(np.cumsum(rep) - rep, rep)
        ox = k % nx[idx]
        oy = k // nx[idx]
        cell = (cx0[idx] + ox) * (SPACE // GRID_M + 2) + (cy0[idx] + oy)
        return pa.table(
            {
                "rid": pa.array(rid[idx]),
                "x0": pa.array(x0[idx]),
                "y0": pa.array(y0[idx]),
                "x1": pa.array(x1[idx]),
                "y1": pa.array(y1[idx]),
                "cell": pa.array(cell),
            }
        )

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        cell = int(g["cell"].iloc[0])
        gx0 = (cell // (SPACE // GRID_M + 2)) * GRID_M
        gy0 = (cell % (SPACE // GRID_M + 2)) * GRID_M
        g = g.sort_values(["x0", "rid"], kind="stable")
        rid = g["rid"].to_numpy(np.int64)
        x0 = g["x0"].to_numpy(np.int64)
        y0 = g["y0"].to_numpy(np.int64)
        x1 = g["x1"].to_numpy(np.int64)
        y1 = g["y1"].to_numpy(np.int64)
        n = len(g)
        # sweep: for each i, partners j>i with x0[j] <= x1[i]
        hi = np.searchsorted(x0, x1, side="right")
        cnt = np.maximum(hi - np.arange(n) - 1, 0)
        i = np.repeat(np.arange(n), cnt)
        j = np.arange(len(i)) - np.repeat(np.cumsum(cnt) - cnt, cnt) + i + 1
        if not len(i):
            return pd.DataFrame({"a": [], "b": []}).astype(np.int64)
        ok = (
            (y0[i] <= y1[j])
            & (y0[j] <= y1[i])
            & (rid[i] != rid[j])
        )
        i, j = i[ok], j[ok]
        # PBSM reference point must lie in THIS cell (kills duplicate
        # reports from other shared cells without any dedup shuffle)
        rx = np.maximum(x0[i], x0[j])
        ry = np.maximum(y0[i], y0[j])
        own = (
            (rx >= gx0) & (rx < gx0 + GRID_M) & (ry >= gy0) & (ry < gy0 + GRID_M)
        )
        i, j = i[own], j[own]
        a = np.minimum(rid[i], rid[j])
        b = np.maximum(rid[i], rid[j])
        return pd.DataFrame({"a": a, "b": b})

    return (
        docs_ds.select_columns(["doc_id"])
        .map_batches(replicate, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(per_cell, batch_format="pandas")
    )


def envelope_join_sql(source: str = "documents") -> str:
    """DuckDB mirror: prune-free quadratic self-join with the same
    closed-rectangle predicate — doubling as the proof that the grid
    replication + reference-point rule loses and duplicates nothing."""
    return (
        f"WITH ev_r AS ({_rect_sql('doc_id')} FROM {source}) "
        "SELECT l.rid AS a, r.rid AS b FROM ev_r l JOIN ev_r r "
        "ON l.rid < r.rid AND l.x0 <= r.x1 AND r.x0 <= l.x1 "
        "AND l.y0 <= r.y1 AND r.y0 <= l.y1"
    )
